"""Reference-architecture A/B control for the memorization wall (round 4).

diag_oracle.py's ``fit`` phase showed our flax CSPNet (128 hidden / 4
layers), trained on ONE structure, is near the translation-invariance
Bayes floor for sigma <= 0.06 but uninformative for sigma >= 0.16, and its
samples miss the target (matcher rms 0.54-0.84).  This script runs the
REFERENCE'S OWN torch CSPNet (imported read-only from /root/reference via
a synthetic package so the heavy Lightning deps never load; a 6-line
``dense_to_sparse`` shim stands in for torch_geometric) under the *same*
protocol:

  * same target (rocksalt Na4Cl4), same B=16 replicated batch
  * the reference training loss transcribed from
    reference chemeleon.py:137-244 (D3PM VB+CE, masked lattice MSE,
    wrapped-normal coord score MSE), Adam 1e-3, same step count
  * the same per-fixed-t coordinate-loss profile
  * CSP + fixed-cell sampling through the reference predictor/corrector
    coordinate updates (reference chemeleon.py:426-462), types and cell
    clamped to the target, then our calibrated matcher rms

If the reference architecture shows the same mid-sigma plateau and the
same sampling miss, the wall is a property of the method at this data
scale (parity).  If it learns the mid-sigma score where ours doesn't, the
gap is in our dense-masked CSPNet rewrite and per-layer diffing can find
it.  Writes results/diag_reference_memo.json.

Security note (ADVICE r4): this script executes reference modules
(cspnet.py, diff_utils.py) in-process from /root/reference — public,
untrusted content.  Both files were read end-to-end before the import was
written (pure model/math definitions, no IO or network at module scope),
and the synthetic package keeps every other reference module unimported.
Manual diagnostic only: nothing in chemeleon_tpu/ or tests/ imports this
module, and it must stay out of any test/CI path.

CPU-only; safe to run while a TPU job owns the chip.

SECURITY NOTE: this diagnostic imports and executes code from
/root/reference (public untrusted content) in-process. It is manual-only —
never imported by the package, the tests, or any CI path — and must stay
that way. The two modules it loads (modules/cspnet.py, utils/diff_utils.py
plus their scatter/data_utils deps) were read and audited line-by-line
before the import was written: they are pure tensor math with no I/O,
network, subprocess, or filesystem side effects at module scope.
"""
from __future__ import annotations

import argparse
import importlib
import json
import math
import sys
import time
import types
from pathlib import Path

import numpy as np
import torch

REF = "/root/reference"

# --- import the reference modules without executing package __init__s ----
# (chemeleon/__init__.py pulls pytorch_lightning/transformers/ase, none of
# which exist in this image; cspnet/diff_utils themselves are torch-only)


def _load_reference():
    tgu = types.ModuleType("torch_geometric.utils")

    def dense_to_sparse(adj):
        idx = adj.nonzero(as_tuple=False).t()
        return idx, adj[idx[0], idx[1]]

    tgu.dense_to_sparse = dense_to_sparse
    tg = types.ModuleType("torch_geometric")
    tg.utils = tgu
    sys.modules.setdefault("torch_geometric", tg)
    sys.modules.setdefault("torch_geometric.utils", tgu)

    for name, path in (
        ("chemeleon", f"{REF}/chemeleon"),
        ("chemeleon.modules", f"{REF}/chemeleon/modules"),
        ("chemeleon.utils", f"{REF}/chemeleon/utils"),
    ):
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg

    cspnet = importlib.import_module("chemeleon.modules.cspnet")
    diff_utils = importlib.import_module("chemeleon.utils.diff_utils")
    return cspnet, diff_utils


# --- same target as diag_oracle.py -----------------------------------------


def rocksalt():
    a = 5.64
    lat = np.diag([a, a, a]).astype(np.float32)
    na = [(0, 0, 0), (0, .5, .5), (.5, 0, .5), (.5, .5, 0)]
    cl = [(.5, .5, .5), (.5, 0, 0), (0, .5, 0), (0, 0, .5)]
    coords = np.array(na + cl, np.float32)
    types = np.array([11] * 4 + [17] * 4, np.int64)
    return types, coords, lat


MASK_LATTICE = torch.tensor(
    [[1, 0, 1], [1, 1, 1], [0, 0, 1]], dtype=torch.bool)

MAX_ATOMS = 104
T = 1000


def build(cspnet, diff_utils, hidden=128, layers=4):
    torch.manual_seed(0)
    net = cspnet.CSPNet(
        hidden_dim=hidden, time_dim=128, text_dim=0, num_layers=layers,
        max_atoms=MAX_ATOMS, act_fn="silu", dis_emb="sin", num_freqs=128,
        edge_style="fc", ln=True, ip=True, smooth=False,
        pred_atom_types=True)
    time_embed = cspnet.SinusoidalTimeEmbeddings(128)
    beta = diff_utils.BetaScheduler(T, "cosine")
    sigma = diff_utils.SigmaScheduler(T)
    d3pm = diff_utils.D3PM(beta_scheduler=beta, num_timesteps=T,
                           max_atoms=MAX_ATOMS, d3pm_hybrid_coeff=1.0)
    return net, time_embed, beta, sigma, d3pm


def make_batch(B=16):
    a_star, x_star, l_star = rocksalt()
    n = len(a_star)
    batch = {
        "atom_types": torch.from_numpy(np.tile(a_star, B)),
        "frac_coords": torch.from_numpy(np.tile(x_star, (B, 1))),
        "lattices": torch.from_numpy(np.tile(l_star, (B, 1, 1))),
        "natoms": torch.full((B,), n, dtype=torch.long),
        "node2graph": torch.arange(B).repeat_interleave(n),
    }
    return batch, (a_star, x_star, l_star)


def loss_step(net, time_embed, beta, sigma, d3pm, diff_utils, batch,
              batched_t=None):
    """The reference training loss (transcribed from chemeleon.py:137-244)."""
    B = batch["natoms"].shape[0]
    if batched_t is None:
        batched_t = torch.from_numpy(
            np.random.choice(np.arange(1, T + 1), B))
    temb = time_embed(batched_t)
    n2g = batch["node2graph"]
    t_node = batched_t[n2g]

    a0 = batch["atom_types"]
    a_t = d3pm.q_sample(a0, t_node, torch.rand(a0.shape[0], MAX_ATOMS))

    acp = beta.alphas_cumprod[batched_t]
    l0 = batch["lattices"]
    eps_l = torch.randn_like(l0) * MASK_LATTICE
    l_t = (torch.sqrt(acp)[:, None, None] * l0
           + torch.sqrt(1.0 - acp)[:, None, None] * eps_l)

    x0 = batch["frac_coords"]
    eps_x = torch.randn_like(x0)
    sig = sigma.sigmas[t_node][:, None]
    sn = sigma.sigmas_norm[t_node][:, None]
    target_x = diff_utils.d_log_p_wrapped_normal(
        sig * eps_x, sig) / torch.sqrt(sn)
    x_t = (x0 + sig * eps_x) % 1.0

    out = net(t=temb, frac_coords=x_t, lattices=l_t, atom_types=a_t,
              num_atoms=batch["natoms"], node2graph=n2g, text_embeds=None)

    true_post = d3pm.q_posterior_logits(a0, a_t, t_node)
    pred_post = d3pm.q_posterior_logits(out.atom_types_out, a_t, t_node,
                                        is_x_0_one_hot=True)
    vb = d3pm.categorical_kl_logits(true_post, pred_post)
    ce = torch.nn.functional.cross_entropy(out.atom_types_out, a0)
    loss_a = vb + ce * d3pm.hybrid_coeff
    loss_l = torch.nn.functional.mse_loss(
        out.lattice_out.masked_select(MASK_LATTICE),
        eps_l.masked_select(MASK_LATTICE))
    loss_x = torch.nn.functional.mse_loss(out.coords_out, target_x)
    return loss_a + loss_l + loss_x, {
        "loss_types": float(loss_a), "loss_lattice": float(loss_l),
        "loss_coords": float(loss_x)}


@torch.no_grad()
def coord_loss_at_t(net, time_embed, sigma, diff_utils, batch, t, n_draw=8):
    B = batch["natoms"].shape[0]
    n2g = batch["node2graph"]
    temb = time_embed(torch.full((B,), t, dtype=torch.long))
    tot = 0.0
    for _ in range(n_draw):
        x0 = batch["frac_coords"]
        eps_x = torch.randn_like(x0)
        sig = sigma.sigmas[t]
        sn = sigma.sigmas_norm[t]
        target = diff_utils.d_log_p_wrapped_normal(
            sig * eps_x, torch.full_like(eps_x, float(sig))
        ) / math.sqrt(float(sn))
        x_t = (x0 + sig * eps_x) % 1.0
        out = net(t=temb, frac_coords=x_t, lattices=batch["lattices"],
                  atom_types=batch["atom_types"], num_atoms=batch["natoms"],
                  node2graph=n2g, text_embeds=None)
        tot += float(torch.nn.functional.mse_loss(out.coords_out, target))
    return tot / n_draw


@torch.no_grad()
def sample_fixed_cell(net, time_embed, sigma, batch, seeds=8,
                      step_lr=1e-5):
    """Reference predictor/corrector coordinate chain (chemeleon.py:426-462)
    with atom types and lattice clamped to the target (CSP + fixed cell)."""
    a_star, x_star, l_star = rocksalt()
    n = len(a_star)
    torch.manual_seed(42)
    atom_types = torch.from_numpy(np.tile(a_star, seeds))
    lattices = torch.from_numpy(np.tile(l_star, (seeds, 1, 1)))
    natoms = torch.full((seeds,), n, dtype=torch.long)
    n2g = torch.arange(seeds).repeat_interleave(n)
    x = torch.rand(seeds * n, 3)
    for t in range(T, 0, -1):
        temb = time_embed(torch.full((seeds,), t, dtype=torch.long))
        sig = sigma.sigmas[t]
        sig_prev = sigma.sigmas[t - 1]
        sn = sigma.sigmas_norm[t]
        out = net(t=temb, frac_coords=x % 1.0, lattices=lattices,
                  atom_types=atom_types, num_atoms=natoms, node2graph=n2g,
                  text_embeds=None)
        step = sig ** 2 - sig_prev ** 2
        std = torch.sqrt((sig_prev ** 2 * step) / (sig ** 2))
        rand = torch.randn_like(x) if t > 1 else torch.zeros_like(x)
        x_half = x - step * out.coords_out * torch.sqrt(sn) + std * rand
        out = net(t=temb, frac_coords=x_half % 1.0, lattices=lattices,
                  atom_types=atom_types, num_atoms=natoms, node2graph=n2g,
                  text_embeds=None)
        step = step_lr * (sig / sigma.sigma_begin) ** 2
        std = torch.sqrt(2 * step)
        rand = torch.randn_like(x) if t > 1 else torch.zeros_like(x)
        x = x_half - step * out.coords_out * torch.sqrt(sn) + std * rand
    x = (x % 1.0).reshape(seeds, n, 3).numpy()

    from chemeleon_tpu.chem.matcher import StructureMatcher
    from chemeleon_tpu.chem.structure import Crystal
    gt = Crystal(l_star, x_star, a_star.tolist())
    matcher = StructureMatcher()
    rms = []
    for i in range(seeds):
        c = Crystal(l_star, x[i], a_star.tolist())
        try:
            rms.append(round(float(matcher.get_rms_dist(gt, c)), 4))
        except Exception:
            rms.append(None)
    return rms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="results/diag_reference_memo.json")
    args = ap.parse_args()

    cspnet, diff_utils = _load_reference()
    net, time_embed, beta, sigma, d3pm = build(
        cspnet, diff_utils, hidden=args.hidden, layers=args.layers)
    batch, _ = make_batch()
    opt = torch.optim.Adam(net.parameters(), lr=args.lr)

    np.random.seed(0)
    t0 = time.time()
    hist = []
    for i in range(args.steps):
        loss, parts = loss_step(net, time_embed, beta, sigma, d3pm,
                                diff_utils, batch)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if i % 500 == 0 or i == args.steps - 1:
            parts["step"] = i
            parts["loss"] = float(loss)
            hist.append(parts)
            print(f"[ref fit] step {i} loss {float(loss):.4f} "
                  f"coords {parts['loss_coords']:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    net.eval()
    profile = {}
    for t in (1, 2, 5, 10, 25, 50, 100, 200, 400, 600, 800, 1000):
        profile[str(t)] = round(coord_loss_at_t(
            net, time_embed, sigma, diff_utils, batch, t), 4)
    print(f"[ref fit] per-t coord loss {profile}", flush=True)

    rms = sample_fixed_cell(net, time_embed, sigma, batch)
    print(f"[ref fit] sampled matcher rms: {rms}", flush=True)

    out = {"config": {"hidden": args.hidden, "layers": args.layers,
                      "steps": args.steps, "lr": args.lr},
           "history": hist, "per_t_coord_loss": profile,
           "sample_rms": rms}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
