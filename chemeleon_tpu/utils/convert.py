"""Lightning .ckpt -> chemeleon-tpu params conversion.

The reference distributes PyTorch-Lightning checkpoints (figshare,
constants.py:9-14) whose state_dicts embed the CSPNet decoder, the text
projection head + null embedding, and the diffusion schedule buffers
(save_hyperparameters, chemeleon.py:34). This module maps them 1:1 onto the
flax parameter tree, so pretrained reference weights run on TPU unchanged.

Key correspondence (torch Linear weight [out, in] -> flax kernel [in, out]):

  decoder.node_embedding.weight            -> decoder/node_embedding/embedding
  decoder.film_layer.mlp_cond.0.{w,b}      -> film_layer/mlp_cond/{kernel,bias}
  decoder.film_layer.proj / .norm          -> film_layer/proj, film_layer/norm
  decoder.csp_layer_i.edge_mlp.0           -> csp_layer_i/edge_lin1_{kernel,bias}
  decoder.csp_layer_i.edge_mlp.2           -> csp_layer_i/edge_lin2
  decoder.csp_layer_i.node_mlp.{0,2}       -> node_lin1_*, node_lin2
  decoder.csp_layer_i.layer_norm           -> layer_norm (scale/bias)
  decoder.final_layer_norm / heads          -> final_layer_norm, coord_out,
                                               lattice_out, type_out
  text_encoder.text_emb.{0,1,3}            -> text/TextConditioner/text_emb
  text_encoder.null_text_embeds            -> text/null_text_embeds

The D3PM/beta/sigma tables are recomputed (deterministic except the
Monte-Carlo sigma_norm table, which is loaded from the checkpoint buffers for
bit-parity when present).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy."""
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _projection_mlp(sd: Dict, prefix: str) -> Dict[str, Any]:
    """torch Sequential(Linear, LayerNorm, GELU, Linear) -> ProjectionMLP."""
    return {
        "lin1": _linear(sd, f"{prefix}.0"),
        "norm": _layernorm(sd, f"{prefix}.1"),
        "lin2": _linear(sd, f"{prefix}.3"),
    }


def convert_decoder_state_dict(sd: Dict, num_layers: int,
                               smooth: bool, ln: bool,
                               prefix: str = "decoder.") -> Dict[str, Any]:
    """Reference CSPNet state_dict -> flax params['params'] subtree."""
    p: Dict[str, Any] = {}
    if smooth:
        p["node_embedding"] = _linear(sd, f"{prefix}node_embedding")
    else:
        p["node_embedding"] = {
            "embedding": _t(sd[f"{prefix}node_embedding.weight"])}
    if f"{prefix}film_layer.mlp_cond.0.weight" in sd:
        p["film_layer"] = {
            "mlp_cond": _linear(sd, f"{prefix}film_layer.mlp_cond.0"),
            "proj": _linear(sd, f"{prefix}film_layer.proj"),
            "norm": _layernorm(sd, f"{prefix}film_layer.norm"),
        }
    for i in range(num_layers):
        lp = f"{prefix}csp_layer_{i}."
        e1 = _linear(sd, f"{lp}edge_mlp.0")
        e2 = _linear(sd, f"{lp}edge_mlp.2")
        n1 = _linear(sd, f"{lp}node_mlp.0")
        layer: Dict[str, Any] = {
            "edge_lin1_kernel": e1["kernel"],
            "edge_lin1_bias": e1["bias"],
            "edge_lin2_kernel": e2["kernel"],
            "edge_lin2_bias": e2["bias"],
            "node_lin1_kernel": n1["kernel"],
            "node_lin1_bias": n1["bias"],
            "node_lin2": _linear(sd, f"{lp}node_mlp.2"),
        }
        if ln:
            layer["layer_norm"] = _layernorm(sd, f"{lp}layer_norm")
        p[f"csp_layer_{i}"] = layer
    if ln:
        p["final_layer_norm"] = _layernorm(sd, f"{prefix}final_layer_norm")
    p["coord_out"] = _linear(sd, f"{prefix}coord_out")
    p["lattice_out"] = _linear(sd, f"{prefix}lattice_out")
    if f"{prefix}type_out.weight" in sd:
        p["type_out"] = _linear(sd, f"{prefix}type_out")
    return p


def convert_text_conditioner_state_dict(sd: Dict,
                                        prefix: str = "text_encoder."
                                        ) -> Dict[str, Any]:
    """TextEncoder null-embed + text_emb MLP -> TextConditioner params."""
    return {
        "null_text_embeds": _t(sd[f"{prefix}null_text_embeds"]),
        "text_emb": _projection_mlp(sd, f"{prefix}text_emb"),
    }


def load_lightning_state_dict(path: str | Path) -> Tuple[Dict, Dict]:
    """Load a Lightning .ckpt (torch zip): (state_dict, hyper_parameters).

    Tries the safe ``weights_only=True`` deserializer first — these files
    are downloaded from figshare at runtime, and full pickle is arbitrary
    code execution; only the hyper_parameters blob (plain dicts in
    practice, but pickled by Lightning) can require the unsafe path. The
    unsafe fallback is therefore NOT automatic: it must be opted into with
    ``CHEMTPU_UNSAFE_CKPT=1`` (otherwise a checkpoint that the safe loader
    rejects raises, instead of being silently fully unpickled)."""
    import os

    import torch
    try:
        blob = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception as e:
        if os.environ.get("CHEMTPU_UNSAFE_CKPT") != "1":
            raise RuntimeError(
                f"{path}: safe (weights_only=True) torch.load failed: {e}. "
                "This checkpoint needs full unpickling, which executes "
                "arbitrary code from the file. If you trust its origin, "
                "set CHEMTPU_UNSAFE_CKPT=1 and retry.") from e
        blob = torch.load(str(path), map_location="cpu", weights_only=False)
    return blob["state_dict"], dict(blob.get("hyper_parameters", {}))


def convert_chemeleon_checkpoint(path: str | Path,
                                 clip_path: Optional[str | Path] = None):
    """Full conversion of a reference Chemeleon .ckpt ->
    ``(ChemeleonConfig, params dict, buffers dict, clip_path | None)``.

    The 4th element just passes ``clip_path`` through when given — the
    CLIP tower itself is loaded once by ClipCheckpointBackend at attach
    time (it used to be torch.load'ed here a second time for values no
    caller consumed)."""
    from chemeleon_tpu.config import ChemeleonConfig

    sd, hparams = load_lightning_state_dict(path)
    cfg = ChemeleonConfig.from_dict(hparams)

    params: Dict[str, Any] = {
        "decoder": {"params": convert_decoder_state_dict(
            sd, cfg.num_layers, cfg.smooth, cfg.ln)},
    }
    if cfg.text_guide and "text_encoder.null_text_embeds" in sd:
        params["text"] = {"params": convert_text_conditioner_state_dict(sd)}

    buffers = {}
    for name in ["sigma_scheduler.sigmas", "sigma_scheduler.sigmas_norm",
                 "beta_scheduler.betas", "beta_scheduler.alphas_cumprod"]:
        if name in sd:
            buffers[name] = _t(sd[name])

    return cfg, params, buffers, clip_path


# ---------------------------------------------------------------------------
# Inverse mapping (for tests / exporting back to the reference format)
# ---------------------------------------------------------------------------

def decoder_params_to_state_dict(params: Dict[str, Any], ln: bool,
                                 smooth: bool,
                                 prefix: str = "decoder.") -> Dict[str, np.ndarray]:
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def put_linear(pre: str, node: Dict):
        sd[f"{pre}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            sd[f"{pre}.bias"] = np.asarray(node["bias"])

    def put_ln(pre: str, node: Dict):
        sd[f"{pre}.weight"] = np.asarray(node["scale"])
        sd[f"{pre}.bias"] = np.asarray(node["bias"])

    if smooth:
        put_linear(f"{prefix}node_embedding", p["node_embedding"])
    else:
        sd[f"{prefix}node_embedding.weight"] = np.asarray(
            p["node_embedding"]["embedding"])
    if "film_layer" in p:
        put_linear(f"{prefix}film_layer.mlp_cond.0", p["film_layer"]["mlp_cond"])
        put_linear(f"{prefix}film_layer.proj", p["film_layer"]["proj"])
        put_ln(f"{prefix}film_layer.norm", p["film_layer"]["norm"])
    i = 0
    while f"csp_layer_{i}" in p:
        lp = p[f"csp_layer_{i}"]
        sd[f"{prefix}csp_layer_{i}.edge_mlp.0.weight"] = np.asarray(
            lp["edge_lin1_kernel"]).T
        sd[f"{prefix}csp_layer_{i}.edge_mlp.0.bias"] = np.asarray(
            lp["edge_lin1_bias"])
        sd[f"{prefix}csp_layer_{i}.edge_mlp.2.weight"] = np.asarray(
            lp["edge_lin2_kernel"]).T
        sd[f"{prefix}csp_layer_{i}.edge_mlp.2.bias"] = np.asarray(
            lp["edge_lin2_bias"])
        sd[f"{prefix}csp_layer_{i}.node_mlp.0.weight"] = np.asarray(
            lp["node_lin1_kernel"]).T
        sd[f"{prefix}csp_layer_{i}.node_mlp.0.bias"] = np.asarray(
            lp["node_lin1_bias"])
        put_linear(f"{prefix}csp_layer_{i}.node_mlp.2", lp["node_lin2"])
        if ln:
            put_ln(f"{prefix}csp_layer_{i}.layer_norm", lp["layer_norm"])
        i += 1
    if ln:
        put_ln(f"{prefix}final_layer_norm", p["final_layer_norm"])
    put_linear(f"{prefix}coord_out", p["coord_out"])
    put_linear(f"{prefix}lattice_out", p["lattice_out"])
    if "type_out" in p:
        put_linear(f"{prefix}type_out", p["type_out"])
    return sd
