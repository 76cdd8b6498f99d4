"""Pretrained model loading (reference chemeleon.py:97-135).

``load_pretrained(kind)`` downloads the reference Lightning checkpoints from
figshare when missing (reference URLs, constants.py:9-14), converts them to
flax params (utils/convert.py), and returns a ready-to-sample Chemeleon.
The converted diffusion tree is cached next to the .ckpt as
``<name>.converted.npz`` so that conversion (and torch) runs once; the
CLIP text tower is rebuilt from its own .ckpt by ClipCheckpointBackend
and still needs torch at load time.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from chemeleon_tpu.utils.constants import (
    CHECKPOINT_URLS,
    PATH_CHEMELEON_COMPOSITION,
    PATH_CHEMELEON_GENERAL_TEXT,
    PATH_CLIP_COMPOSITION,
    PATH_CLIP_GENERAL_TEXT,
)
from chemeleon_tpu.utils.download import download_file

_KINDS = {
    "general_text": (PATH_CHEMELEON_GENERAL_TEXT, PATH_CLIP_GENERAL_TEXT,
                     "chemeleon_general_text", "clip_general_text"),
    "composition": (PATH_CHEMELEON_COMPOSITION, PATH_CLIP_COMPOSITION,
                    "chemeleon_composition", "clip_composition"),
}


def _ensure(path: Path, url_key: str) -> None:
    if not path.exists():
        url = CHECKPOINT_URLS[url_key]
        print(f"Downloading Chemeleon checkpoint from {url}...")
        download_file(url, path)


# -- conversion cache (torch-free repeat loads) ------------------------------

def _flatten(tree, prefix=""):
    for k, v in sorted(tree.items()):
        kk = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _flatten(v, kk)
        else:
            yield kk, np.asarray(v)


def _unflatten(items):
    out: dict = {}
    for k, v in items:
        parts = k.split("/")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def _cache_path(path: Path) -> Path:
    return path.with_suffix(path.suffix + ".converted.npz")


def _source_stamp(path: Path) -> np.ndarray:
    """Identity of the source .ckpt: (size, mtime_ns). Stored inside the
    converted cache so a re-downloaded/replaced checkpoint invalidates it."""
    st = path.stat()
    return np.array([st.st_size, st.st_mtime_ns], np.int64)


def _save_converted(path: Path, cfg, params, buffers) -> None:
    arrays = {f"p:{k}": v for k, v in _flatten(params)}
    arrays.update({f"b:{k}": np.asarray(v) for k, v in buffers.items()})
    arrays["__config__"] = np.frombuffer(
        json.dumps(cfg.to_dict()).encode(), dtype=np.uint8)
    arrays["__source__"] = _source_stamp(path)
    try:
        np.savez(_cache_path(path), **arrays)
    except OSError:  # read-only checkpoint dir: skip caching
        pass


def _load_converted(path: Path):
    from chemeleon_tpu.config import ChemeleonConfig
    cache = _cache_path(path)
    if not cache.exists():
        return None
    with np.load(cache) as z:
        if ("__source__" not in z.files
                or not np.array_equal(z["__source__"], _source_stamp(path))):
            return None  # source .ckpt changed (or pre-stamp cache): reconvert
        cfg = ChemeleonConfig.from_dict(
            json.loads(bytes(z["__config__"]).decode()))
        params = _unflatten(
            (k[2:], z[k]) for k in z.files if k.startswith("p:"))
        buffers = {k[2:]: z[k] for k in z.files if k.startswith("b:")}
    return cfg, params, buffers


def load_pretrained(kind: str, text_backend: str = "auto",
                    path_ckpt: Optional[str] = None,
                    path_ckpt_clip: Optional[str] = None):
    from chemeleon_tpu.models.chemeleon import Chemeleon
    from chemeleon_tpu.utils.convert import convert_chemeleon_checkpoint

    if kind not in _KINDS:
        raise ValueError(f"unknown pretrained kind {kind!r}; "
                         f"one of {sorted(_KINDS)}")
    dft_path, dft_clip, url_key, clip_url_key = _KINDS[kind]
    path = Path(path_ckpt) if path_ckpt else dft_path
    # An explicit offline backend (e.g. text_backend="hash") with no explicit
    # CLIP path means the caller wants THIS .ckpt standalone — don't fetch
    # the companion figshare CLIP tower (it would fail in zero-egress
    # environments before the model ever loads). "auto" keeps the
    # reference's argument-free both-checkpoints behavior
    # (reference chemeleon.py:97-135).
    if path_ckpt_clip is None and text_backend not in ("auto",):
        clip_path = None
    else:
        clip_path = Path(path_ckpt_clip) if path_ckpt_clip else dft_clip
    _ensure(path, url_key)
    if clip_path is not None:
        _ensure(clip_path, clip_url_key)

    cached = _load_converted(path)
    if cached is not None:
        cfg, params, buffers = cached
    else:
        cfg, params, buffers, _ = convert_chemeleon_checkpoint(
            path, clip_path)
        _save_converted(path, cfg, params, buffers)

    # The trained CLIP tower from clip_path is attached as the text
    # backend below, so construct with the cheap hash placeholder — eagerly
    # building an HF/artifact backend here would raise in offline
    # environments before the attach (defeating text_backend="hf"/"auto").
    model = Chemeleon(cfg, text_backend="hash" if clip_path else text_backend)

    # bit-parity: adopt the checkpoint's Monte-Carlo sigma_norm table (the
    # one non-recomputable buffer; the sigmas ladder is deterministic, so
    # adopt it only when the checkpoint carries it)
    if "sigma_scheduler.sigmas_norm" in buffers:
        import jax.numpy as jnp
        import dataclasses
        sig = model.sched.sigma
        repl = {"sigmas_norm":
                jnp.asarray(buffers["sigma_scheduler.sigmas_norm"])}
        if "sigma_scheduler.sigmas" in buffers:
            repl["sigmas"] = jnp.asarray(buffers["sigma_scheduler.sigmas"])
        model.sched = model.sched._replace(
            sigma=dataclasses.replace(sig, **repl))

    # convert numpy -> jax and validate the tree against a fresh init
    ref = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: jax.numpy.asarray(np.asarray(x)), params)
    _check_tree_compatible(ref, params)
    model.params = params

    # attach the trained CLIP text tower + projection as the text backend
    # (reference text_encoder.py:48-51, :180-182): the backend output is the
    # clip-projected embedding that feeds the diffusion model's text_emb MLP
    if clip_path is not None and model.text_encoder is not None:
        from chemeleon_tpu.text.clip_backend import ClipCheckpointBackend
        backend = ClipCheckpointBackend(clip_path,
                                        max_text_len=cfg.max_text_len)
        # the backend's clip_dim feeds the converted text_emb MLP /
        # null_text_embeds — a mismatch would otherwise surface as an
        # opaque broadcast error deep inside the first sample() call
        probe = np.asarray(backend(["probe"]))
        if probe.shape[-1] != cfg.text_embed_dim:
            raise ValueError(
                f"CLIP checkpoint clip_dim={probe.shape[-1]} does not match "
                f"the diffusion checkpoint's text_embed_dim="
                f"{cfg.text_embed_dim} — mismatched checkpoint pair "
                f"({path} vs {clip_path})")
        model.text_encoder.backend = backend
        model.text_encoder.clip_apply = None
    return model


def _check_tree_compatible(ref, got) -> None:
    # map shapes to strings so tree_flatten doesn't descend into the tuples
    ref_shapes = jax.tree.map(lambda x: str(tuple(x.shape)), ref)
    got_shapes = jax.tree.map(lambda x: str(tuple(x.shape)), got)
    rf = jax.tree_util.tree_flatten_with_path(ref_shapes)[0]
    gf = jax.tree_util.tree_flatten_with_path(got_shapes)[0]
    ref_map = {jax.tree_util.keystr(k): v for k, v in rf}
    got_map = {jax.tree_util.keystr(k): v for k, v in gf}
    missing = set(ref_map) - set(got_map)
    extra = set(got_map) - set(ref_map)
    bad = {k: (ref_map[k], got_map[k]) for k in set(ref_map) & set(got_map)
           if ref_map[k] != got_map[k]}
    if missing or extra or bad:
        raise ValueError(
            f"checkpoint tree mismatch:\n missing={sorted(missing)[:8]}\n "
            f"extra={sorted(extra)[:8]}\n shape_mismatch={bad}")
