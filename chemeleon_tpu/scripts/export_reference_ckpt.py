"""Export a FULL-SIZE genuine reference checkpoint + forward-IO fixtures
(round-5 VERDICT item 2: utils/convert.py had only been exercised on
synthetic hand-built state_dicts; a real reference checkpoint never passed
through it because figshare is unreachable under zero egress).

This script builds the reference's OWN torch modules in-process at the
published full size (hidden 512 / 6 layers / 128 freqs / text_dim 512,
reference config.py:27-60) — the real CSPNet, BetaScheduler, SigmaScheduler
and D3PM classes, so every state_dict key/shape is the genuine article, not
a transcription — packages them as a PyTorch-Lightning-format .ckpt exactly
like the figshare distribution (reference chemeleon.py:34
save_hyperparameters + Lightning's {"state_dict", "hyper_parameters"} zip),
and records reference forward outputs (final heads AND per-CSP-layer node
features via forward hooks) on deterministic batches.

Artifacts:
  .data_cache/ref_full_512.ckpt     genuine Lightning checkpoint (untracked)
  .data_cache/ref_full_512_io.npz   forward IO fixtures (untracked)
  results/ref_convert_parity.json   measured converter parity (committed)

tests/test_convert.py::test_full_size_reference_checkpoint_parity consumes
the two .data_cache artifacts and skips with a pointer here when they are
missing, keeping reference code imports OUT of the test path (ADVICE r4:
reference code is public untrusted content; the modules loaded here are the
same two audited by diag_reference_memo.py — pure tensor math, no side
effects at module scope).

CPU-only; safe to run while a TPU job owns the chip.

Usage: python -m chemeleon_tpu.scripts.export_reference_ckpt
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]

# the published full-size hyperparameters, transcribed from the reference
# sacred config (reference config.py:27-60; only keys ChemeleonConfig
# consumes matter — from_dict drops the rest, config.py:209-218)
FULL_HPARAMS = {
    "exp_name": "chemeleon",
    "dataset_name": "mp-40",
    "hidden_dim": 512,
    "time_dim": 128,
    "text_dim": 512,
    "max_atoms": 104,
    "num_layers": 6,
    "act_fn": "silu",
    "dis_emb": "sin",
    "num_freqs": 128,
    "edge_style": "fc",
    "max_neighbors": 20,
    "cutoff": 6.0,
    "ln": True,
    "ip": True,
    "smooth": False,
    "pred_atom_types": True,
    "text_guide": True,
    "text_targets": ["composition"],
    "trainable_text_encoder": False,
    "text_encoder": "lfoppiano/MatTPUSciBERT",
    "text_embed_dim": 768,
    "max_text_len": 256,
    "cond_drop_prob": 0.2,
    "beta_schedule": "cosine",
    "timesteps": 1000,
    "cost_atom_types": 1.0,
    "cost_lattice": 1.0,
    "cost_coords": 1.0,
    "d3pm_hybrid_coeff": 1.0,
}

T = FULL_HPARAMS["timesteps"]
MAX_ATOMS = FULL_HPARAMS["max_atoms"]


def build_reference_shell():
    """The reference Chemeleon module's parameter-bearing skeleton, from the
    reference's own classes (attribute names == reference chemeleon.py:31-95
    so state_dict keys match the figshare layout). The HF text backbone is
    the one piece that cannot be constructed offline (AutoModel downloads);
    its two converter-relevant children (text_emb projection +
    null_text_embeds, reference text_encoder.py:40-46) are built with the
    exact same torch layers and key names."""
    import torch
    import torch.nn as nn

    from chemeleon_tpu.scripts.diag_reference_memo import _load_reference

    cspnet, diff_utils = _load_reference()
    torch.manual_seed(0)
    h = FULL_HPARAMS

    class TextShell(nn.Module):
        def __init__(self):
            super().__init__()
            d = h["text_embed_dim"]
            self.text_emb = nn.Sequential(
                nn.Linear(d, d), nn.LayerNorm(d), nn.GELU(),
                nn.Linear(d, h["text_dim"]))
            self.null_text_embeds = nn.Parameter(torch.randn(1, d))

    class Shell(nn.Module):
        def __init__(self):
            super().__init__()
            self.time_embed = cspnet.SinusoidalTimeEmbeddings(h["time_dim"])
            self.text_encoder = TextShell()
            self.beta_scheduler = diff_utils.BetaScheduler(
                T, h["beta_schedule"])
            self.sigma_scheduler = diff_utils.SigmaScheduler(T)
            self.d3pm = diff_utils.D3PM(
                beta_scheduler=self.beta_scheduler, num_timesteps=T,
                max_atoms=MAX_ATOMS,
                d3pm_hybrid_coeff=h["d3pm_hybrid_coeff"])
            self.decoder = cspnet.CSPNet(
                hidden_dim=h["hidden_dim"], time_dim=h["time_dim"],
                text_dim=h["text_dim"], num_layers=h["num_layers"],
                max_atoms=MAX_ATOMS, act_fn=h["act_fn"],
                dis_emb=h["dis_emb"], num_freqs=h["num_freqs"],
                edge_style=h["edge_style"], cutoff=h["cutoff"],
                max_neighbors=h["max_neighbors"], ln=h["ln"], ip=h["ip"],
                smooth=h["smooth"], pred_atom_types=h["pred_atom_types"])

    return Shell()


def forward_cases(shell):
    """Deterministic reference forwards: final heads + per-layer node
    features. Two batches — same-size rows (dense==flattened trivially) and
    mixed natoms (exercises the dense path's padding mask)."""
    import torch

    torch.manual_seed(1)
    rng = np.random.RandomState(7)
    cases = {}
    for name, natoms in (("uniform8", [8, 8]), ("mixed", [5, 8])):
        B = len(natoms)
        total = sum(natoms)
        atom_types = rng.randint(1, 95, size=total).astype(np.int64)
        frac = rng.rand(total, 3).astype(np.float32)
        # plausible cells: diag(4..7 A) with small symmetric jitter, the
        # canonical zero pattern applied like training data
        lats = []
        for _ in range(B):
            L = np.diag(4.0 + 3.0 * rng.rand(3)).astype(np.float32)
            L += 0.3 * rng.randn(3, 3).astype(np.float32)
            L[0, 1] = L[2, 0] = L[2, 1] = 0.0
            lats.append(L)
        lattices = np.stack(lats)
        raw_text = rng.randn(B, FULL_HPARAMS["text_embed_dim"]) \
            .astype(np.float32)
        node2graph = np.repeat(np.arange(B), natoms)

        for t_int in (1, 500, 999):
            tt = torch.full((B,), t_int, dtype=torch.long)
            t_emb = shell.time_embed(tt)
            text = shell.text_encoder.text_emb(torch.from_numpy(raw_text))

            layer_feats = []
            hooks = []
            for i in range(FULL_HPARAMS["num_layers"]):
                mod = getattr(shell.decoder, f"csp_layer_{i}")
                hooks.append(mod.register_forward_hook(
                    lambda m, inp, out: layer_feats.append(
                        out.detach().numpy())))
            with torch.no_grad():
                out = shell.decoder(
                    atom_types=torch.from_numpy(atom_types),
                    frac_coords=torch.from_numpy(frac),
                    lattices=torch.from_numpy(lattices),
                    num_atoms=torch.tensor(natoms, dtype=torch.long),
                    node2graph=torch.from_numpy(node2graph),
                    t=t_emb, text_embeds=text)
            for hk in hooks:
                hk.remove()
            key = f"{name}_t{t_int}"
            cases[key] = {
                "natoms": np.asarray(natoms, np.int64),
                "atom_types": atom_types,
                "frac_coords": frac,
                "lattices": lattices,
                "raw_text": raw_text,
                "t": np.asarray([t_int] * B, np.int64),
                "ref_coords_out": out.coords_out.numpy(),
                "ref_lattice_out": out.lattice_out.numpy(),
                "ref_types_out": out.atom_types_out.numpy(),
                "ref_node_features": out.node_features.numpy(),
                "ref_layer_features": np.stack(layer_feats),  # [L, Bn, H]
            }
    return cases


def inline_parity(ckpt_path, io_path):
    """Run the converter + our dense decoder on the fixtures NOW and record
    the measured parity (the committed evidence even when the untracked
    fixtures are later lost to a host reset)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from tests.test_convert import full_size_parity_report

    return full_size_parity_report(ckpt_path, io_path)


def main():
    import torch

    cache = REPO / ".data_cache"
    cache.mkdir(exist_ok=True)
    ckpt_path = cache / "ref_full_512.ckpt"
    io_path = cache / "ref_full_512_io.npz"

    shell = build_reference_shell()
    n_params = sum(p.numel() for p in shell.parameters())
    print(f"reference shell built: {n_params / 1e6:.1f}M params")

    torch.save({"state_dict": shell.state_dict(),
                "hyper_parameters": dict(FULL_HPARAMS),
                "epoch": 0, "global_step": 0,
                "pytorch-lightning_version": "2.0.0"}, ckpt_path)
    print(f"wrote {ckpt_path} ({ckpt_path.stat().st_size / 1e6:.1f} MB)")

    cases = forward_cases(shell)
    flat = {}
    for case, arrs in cases.items():
        for k, v in arrs.items():
            flat[f"{case}/{k}"] = v
    np.savez_compressed(io_path, **flat)
    print(f"wrote {io_path} ({io_path.stat().st_size / 1e6:.1f} MB, "
          f"{len(cases)} cases)")

    report = inline_parity(ckpt_path, io_path)
    out = REPO / "results" / "ref_convert_parity.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
