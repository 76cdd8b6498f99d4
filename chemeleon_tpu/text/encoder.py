"""Text conditioning for chemeleon-tpu.

Rebuild of the reference TextEncoder (reference:
chemeleon/text_encoder/text_encoder.py:22-205). Split into:

  * a host-side *backend* that turns raw strings into fixed-size embeddings
    (tokenization + frozen LM forward). Backends:
      - "hf":   HuggingFace Flax models (BERT-family CLS token,
                text_encoder.py:172-177; T5/causal-LM masked mean-pool,
                :142-171). Requires the weights to be present in the local HF
                cache — this environment has zero egress, so nothing is ever
                downloaded implicitly.
      - "hash": a deterministic offline fallback — a seeded Gaussian embedding
                per unique string. Exercises the full CFG/conditioning
                machinery without any pretrained weights; clearly NOT a
                semantically meaningful encoder.
  * a jit-compatible flax projection head: learned null embedding
    (text_encoder.py:46), CFG cond-drop swap (:194-202), optional CLIP text
    projection (:180-182), and the text_emb MLP (:40-45).

The backend runs on host once per sample batch; everything downstream is pure
JAX and lives inside the compiled sampler/train step.
"""

from __future__ import annotations

import hashlib
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from chemeleon_tpu.diffusion.schedules import prob_mask_like
from chemeleon_tpu.text.registry import MODEL_NAMES


class ProjectionMLP(nn.Module):
    """Linear -> LayerNorm -> GELU -> Linear. Used for both the text_emb head
    (text_encoder.py:40-45) and the CLIP projection heads
    (crystal_clip.py:62-73)."""
    in_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.in_dim, name="lin1", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        # exact erf GELU: torch nn.GELU() default (reference
        # text_encoder.py:43, crystal_clip.py head) — flax's default is the
        # tanh approximation, which costs ~1e-3 parity on converted
        # reference checkpoints
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, name="lin2", dtype=self.dtype)(x)
        return x


class TextConditioner(nn.Module):
    """The jit-side half of TextEncoder: null-embedding swap + projection.

    raw_embeds: [B, text_embed_dim] from a backend (already CLIP-projected if
    a CLIP model is attached). keep_mask: [B] bool from prob_mask_like.
    """
    text_embed_dim: int
    text_dim: int

    @nn.compact
    def __call__(self, raw_embeds: jnp.ndarray,
                 keep_mask: jnp.ndarray) -> jnp.ndarray:
        null = self.param("null_text_embeds", nn.initializers.normal(1.0),
                          (1, self.text_embed_dim), jnp.float32)
        x = jnp.where(keep_mask[:, None], raw_embeds,
                      jnp.broadcast_to(null, raw_embeds.shape))
        return ProjectionMLP(self.text_embed_dim, self.text_dim,
                             name="text_emb")(x)


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------

class HashTextBackend:
    """Deterministic offline embedding: seeded N(0, 1) per unique string."""

    def __init__(self, text_embed_dim: int):
        self.text_embed_dim = text_embed_dim
        self._cache: dict[str, np.ndarray] = {}

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.empty((len(texts), self.text_embed_dim), np.float32)
        for i, t in enumerate(texts):
            if t not in self._cache:
                seed = int.from_bytes(
                    hashlib.sha256(t.encode()).digest()[:4], "little")
                rng = np.random.default_rng(seed)
                self._cache[t] = rng.standard_normal(
                    self.text_embed_dim).astype(np.float32)
            out[i] = self._cache[t]
        return out


class HFTextBackend:
    """HuggingFace Flax backend; mirrors the reference pooling rules
    (text_encoder.py:129-177). Only loads from the local cache/path."""

    def __init__(self, model_name: str, max_text_len: int):
        self.model_name = model_name
        self.max_text_len = max_text_len
        from transformers import AutoConfig, AutoTokenizer
        kw = dict(local_files_only=True)
        self.tokenizer = AutoTokenizer.from_pretrained(model_name, **kw)
        # Dispatch on the model's declared architecture (model_type /
        # *ForCausalLM), not a name prefix — prefixes break for local
        # paths/mirrors of the same models.
        mcfg = AutoConfig.from_pretrained(model_name, **kw)
        archs = tuple(getattr(mcfg, "architectures", None) or ())
        if mcfg.model_type == "t5":
            from transformers import FlaxT5EncoderModel
            self.model = FlaxT5EncoderModel.from_pretrained(model_name, **kw)
            self.pooling = "mean"
        elif (any(a.endswith("ForCausalLM") for a in archs)
              or mcfg.model_type in ("phi", "phi3", "llama", "gpt2")
              or model_name.startswith(("microsoft", "meta-llama"))):
            from transformers import FlaxAutoModelForCausalLM
            self.model = FlaxAutoModelForCausalLM.from_pretrained(
                model_name, output_hidden_states=True, **kw)
            if self.tokenizer.pad_token is None:
                self.tokenizer.pad_token = self.tokenizer.eos_token
            self.pooling = "mean_hidden"
        else:
            from transformers import FlaxBertModel
            self.model = FlaxBertModel.from_pretrained(model_name, **kw)
            self.pooling = "cls"

    def __call__(self, texts: List[str]) -> np.ndarray:
        tok = self.tokenizer(texts, padding="longest",
                             max_length=self.max_text_len, truncation=True,
                             return_tensors="np")
        outputs = self.model(input_ids=tok["input_ids"],
                             attention_mask=tok["attention_mask"])
        am = tok["attention_mask"][..., None].astype(np.float32)
        if self.pooling == "cls":
            emb = outputs.last_hidden_state[:, 0, :]
        elif self.pooling == "mean":
            emb = np.asarray(outputs.last_hidden_state) * am
            emb = emb.mean(axis=1)
        else:  # mean of last hidden states for causal LMs
            hs = np.asarray(outputs.hidden_states[-1]) * am
            emb = hs.mean(axis=1)
        return np.asarray(emb, dtype=np.float32)


def make_backend(text_encoder_name: str, text_embed_dim: int, max_text_len: int,
                 backend="auto") -> Callable[[List[str]], np.ndarray]:
    if not isinstance(backend, str):
        return backend  # pre-built backend instance (e.g. ClipCheckpointBackend)
    if backend == "hash":
        return HashTextBackend(text_embed_dim)
    if backend in ("hf", "auto"):
        if text_encoder_name.startswith("clip-orbax:"):
            # one of THIS framework's trained Crystal-CLIP checkpoints as a
            # frozen conditioner (clip_backend.OrbaxClipBackend)
            from chemeleon_tpu.text.clip_backend import OrbaxClipBackend
            return OrbaxClipBackend(text_encoder_name.split(":", 1)[1])
        if text_encoder_name.startswith("chemeleon/"):
            # trained Crystal-CLIP text tower (reference text_encoder.py:67-82,
            # wandb artifact); look for a locally cached checkpoint
            from pathlib import Path
            from chemeleon_tpu.text.registry import ARTIFACT_PATHS
            model_id = ARTIFACT_PATHS.get(text_encoder_name,
                                          text_encoder_name).split("/")[-1]
            for cand in (Path(".cache/artifacts") / model_id / "model.ckpt",):
                if cand.exists():
                    from chemeleon_tpu.text.clip_backend import (
                        ClipCheckpointBackend,
                    )
                    return ClipCheckpointBackend(cand, max_text_len)
            if backend == "hf":
                raise RuntimeError(
                    f"CLIP checkpoint for {text_encoder_name!r} not found in "
                    f".cache/artifacts/{model_id}/model.ckpt")
            return HashTextBackend(text_embed_dim)
        try:
            return HFTextBackend(text_encoder_name, max_text_len)
        except Exception as e:  # no local weights / unsupported arch
            if backend == "hf":
                raise RuntimeError(
                    f"HF backend for {text_encoder_name!r} unavailable "
                    f"(no local weights?): {e}") from e
            return HashTextBackend(text_embed_dim)
    raise ValueError(f"Unknown text backend: {backend}")


# ---------------------------------------------------------------------------
# TextEncoder facade
# ---------------------------------------------------------------------------

class TextEncoder:
    """Host+device text encoder matching the reference API surface
    (get_text_embeds, text_encode; text_encoder.py:129-205).

    ``trainable_text_encoder=True`` (text_encoder.py:36-46) attaches a
    TrainableTextTower whose forward runs INSIDE the jitted loss: the params
    tree becomes ``{"conditioner": ..., "tower": ...}`` and gradients flow
    into the tower. With the default (frozen) setting the params tree is the
    bare conditioner variables, unchanged from round 1 checkpoints."""

    def __init__(self, text_encoder_name: str = "lfoppiano/MatTPUSciBERT",
                 text_embed_dim: int = 768, max_text_len: int = 256,
                 text_dim: int = 512, trainable_text_encoder: bool = False,
                 pretrained_clip_apply: Optional[Callable] = None,
                 backend: str = "auto"):
        # the registry check only applies when the name must be RESOLVED
        # into a backend; "hash" ignores the name and a pre-built backend
        # instance (make_backend line ~146) carries its own weights, so the
        # name is pure metadata in both cases
        if (isinstance(backend, str) and backend != "hash"
                and not text_encoder_name.startswith(
                    ("chemeleon/", "clip-orbax:"))
                and text_encoder_name not in MODEL_NAMES):
            raise ValueError(
                f"Invalid model name {text_encoder_name!r}. "
                f"Must be one of {MODEL_NAMES}")
        self.text_encoder_name = text_encoder_name
        self.text_embed_dim = text_embed_dim
        self.max_text_len = max_text_len
        self.text_dim = text_dim
        self.trainable_text_encoder = trainable_text_encoder
        # Optional fn(raw [B, D_enc]) -> [B, text_embed_dim]: the CLIP text
        # projection applied to backend output (text_encoder.py:180-182).
        self.clip_apply = pretrained_clip_apply
        self.tower = None
        if text_encoder_name == "composition":
            # offline element-fraction featurizer + trainable MLP tower
            # (text/composition.py) — inherently trainable: there are no
            # pretrained weights, the tower learns with the diffusion loss
            from chemeleon_tpu.text.composition import CompositionTower
            self.tower = CompositionTower(text_embed_dim)
            self.trainable_text_encoder = True
        elif trainable_text_encoder:
            from chemeleon_tpu.text.tower import TrainableTextTower
            self.tower = TrainableTextTower(text_encoder_name,
                                            text_embed_dim, max_text_len)
        if self.tower is not None:
            # host-side convenience encoder (initial tower weights) so
            # backend-only callers keep working; training/sampling use the
            # live params via text_inputs/raw_embeds_in_loss
            self.backend = lambda texts: np.asarray(
                self.tower.encode(self.tower.init_params(), list(texts)))
        else:
            self.backend = make_backend(text_encoder_name, text_embed_dim,
                                        max_text_len, backend)
        self.conditioner = TextConditioner(text_embed_dim, text_dim)

    def init_params(self, key: jax.Array):
        dummy = jnp.zeros((1, self.text_embed_dim))
        keep = jnp.ones((1,), bool)
        cond = self.conditioner.init(key, dummy, keep)
        if self.tower is not None:
            return {"conditioner": cond, "tower": self.tower.init_params(key)}
        return cond

    # -- trainable-tower plumbing ---------------------------------------------
    def text_inputs(self, texts: List[str]):
        """Host-side preprocessing for the jitted loss: token arrays when the
        tower is trainable, else frozen backend embeddings."""
        if self.tower is not None:
            return self.tower.tokenize(list(texts))
        return self.text_encode(texts)

    def raw_embeds_in_loss(self, params, text_input) -> jnp.ndarray:
        """[B, text_embed_dim] from ``text_inputs`` output; pure in params —
        safe (and differentiable) inside jit. ``text_input`` is whatever
        tuple the tower's ``tokenize`` produced ((ids, mask) for BERT,
        (features,) for the composition tower)."""
        if self.tower is not None:
            return self.tower.apply(params["tower"], *text_input)
        return text_input

    def conditioner_params(self, params):
        return params["conditioner"] if self.tower is not None else params

    def text_encode(self, texts: List[str]) -> jnp.ndarray:
        """Backend forward (+ CLIP text projection if attached): [B, D]."""
        raw = jnp.asarray(self.backend(list(texts)))
        if self.clip_apply is not None:
            raw = self.clip_apply(raw)
        return raw

    def _raw_with_params(self, params, texts: List[str]) -> jnp.ndarray:
        """Tower/backend embeddings using the LIVE params when trainable."""
        if self.tower is not None:
            return self.tower.encode(params["tower"], list(texts))
        return self.text_encode(texts)

    def get_text_embeds(self, params, texts: List[str], cond_drop_prob: float,
                        key: Optional[jax.Array] = None) -> jnp.ndarray:
        """[B, text_dim] with CFG cond-drop (text_encoder.py:186-205).

        With 0 < cond_drop_prob < 1 a ``key`` is REQUIRED: silently falling
        back to a fixed key would correlate the CFG drop mask across calls."""
        raw = self._raw_with_params(params, texts)
        B = raw.shape[0]
        if cond_drop_prob in (0.0, 1.0):
            keep = prob_mask_like(jax.random.PRNGKey(0), (B,),
                                  1.0 - cond_drop_prob)
        else:
            if key is None:
                raise ValueError(
                    "get_text_embeds with 0 < cond_drop_prob < 1 needs an "
                    "explicit PRNG key (a fixed default would repeat the "
                    "same drop mask every call)")
            keep = prob_mask_like(key, (B,), 1.0 - cond_drop_prob)
        return self.conditioner.apply(self.conditioner_params(params), raw,
                                      keep)

    def embed_cond_and_null(self, params, texts: List[str]):
        """Convenience for sampling: (cond_embeds, null_embeds), each
        [B, text_dim] (reference chemeleon.py:364-374)."""
        raw = self._raw_with_params(params, texts)
        B = raw.shape[0]
        cparams = self.conditioner_params(params)
        cond = self.conditioner.apply(cparams, raw, jnp.ones((B,), bool))
        null = self.conditioner.apply(cparams, raw, jnp.zeros((B,), bool))
        return cond, null
