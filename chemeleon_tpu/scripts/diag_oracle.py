"""Oracle ladder for the memorization failure (round 4).

memo8/memo64 show that even a 4000-epoch 8-row model never reproduces its
own training rows (structure_matching 0.000, best-of-20 coordinate rms ~
random).  This diagnostic separates the remaining suspects with analytic
ground truth, all on CPU:

phase ``sampler``
    Run the PRODUCTION ``sampler_step`` chain with a stub decoder that
    returns the Bayes-optimal single-structure predictions analytically
    (minus-score convention matching d_log_p_wrapped_normal /
    reference diff_utils.py:42-46; eps-prediction for the DDPM lattice;
    one-hot x0 logits for D3PM types).  If the chain recovers the target
    structure the predictor/corrector equations, schedule tables, and index
    conventions are exonerated; if not, the sampler itself is the bug.

phase ``fit``
    Train a small CSPNet on ONE structure with the real
    ``diffusion_loss``/optax path, report the per-timestep coordinate-loss
    profile (which sigmas the net explains), then sample through the real
    scan in CSP + fixed-cell mode and measure matcher rms to the target.
    Passing ``sampler`` + failing ``fit`` localizes the gap to
    training/architecture (e.g. feature expressiveness), not sampling.

Writes results/diag_oracle.json.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from chemeleon_tpu.config import get_config  # noqa: E402
from chemeleon_tpu.diffusion.schedules import d_log_p_wrapped_normal  # noqa: E402
from chemeleon_tpu.models.chemeleon import (  # noqa: E402
    MASK_LATTICE_MATRIX, build_decoder, build_schedulers, diffusion_loss,
    init_sampler_state, run_sampler_scan, sampler_step)
from chemeleon_tpu.models.cspnet import sinusoidal_time_embedding  # noqa: E402
from chemeleon_tpu.ops.graph import CrystalBatch, node_mask  # noqa: E402


# ---------------------------------------------------------------------------
# Target structure: rocksalt Na4Cl4 (a = 5.64 A) — 8 atoms, one pad bucket
# ---------------------------------------------------------------------------

def rocksalt():
    a = 5.64
    lat = np.diag([a, a, a]).astype(np.float32)
    na = [(0, 0, 0), (0, .5, .5), (.5, 0, .5), (.5, .5, 0)]
    cl = [(.5, .5, .5), (.5, 0, 0), (0, .5, 0), (0, 0, .5)]
    coords = np.array(na + cl, np.float32)
    types = np.array([11] * 4 + [17] * 4, np.int32)
    return types, coords, lat


def wrapped_rms(x, x_star):
    d = (np.asarray(x) - np.asarray(x_star) + 0.5) % 1.0 - 0.5
    return float(np.sqrt((d ** 2).sum(-1).mean()))


class OracleDecoder:
    """Stub decoder returning the Bayes-optimal single-structure outputs.

    ``t_box`` is a 1-element list the driving loop updates before each
    (eager) sampler_step call — the production code only hands the decoder a
    time EMBEDDING, so the oracle reads the integer step out-of-band."""

    def __init__(self, sched, x_star, l_star, a_star, max_atoms, t_box):
        self.sched = sched
        self.x_star = jnp.asarray(x_star)
        self.l_star = jnp.asarray(l_star)
        self.a_star = jnp.asarray(a_star)
        self.max_atoms = max_atoms
        self.t_box = t_box

    def apply(self, params, atom_types, frac_coords, lattices, mask,
              time_emb, text_embeds):
        t = self.t_box[0]
        sig = self.sched.sigma.sigmas[t]
        sn = self.sched.sigma.sigmas_norm[t]
        # coords: the training target is d_log_p_wn(x_t - x*, sigma)/sqrt(sn)
        # (minus-score convention, 1-periodic in its argument) — for a
        # single data point this is exact, not just an expectation.
        diff = frac_coords - self.x_star[None]
        pred_x = (d_log_p_wrapped_normal(diff, jnp.full_like(diff, sig))
                  / jnp.sqrt(sn))
        # lattice: eps-prediction; l_t = sqrt(acp) l* + sqrt(1-acp) eps
        acp = self.sched.beta.alphas_cumprod[t]
        lmask = jnp.asarray(MASK_LATTICE_MATRIX)
        pred_l = ((lattices - jnp.sqrt(acp) * self.l_star[None])
                  / jnp.sqrt(jnp.maximum(1.0 - acp, 1e-12))) * lmask
        # types: x0 logits, confident one-hot
        B, N = atom_types.shape
        onehot = jax.nn.one_hot(self.a_star, self.max_atoms)
        pred_a = jnp.broadcast_to(onehot[None], (B, N, self.max_atoms)) * 12.0
        return SimpleNamespace(atom_types_out=pred_a, lattice_out=pred_l,
                               coords_out=pred_x)


def phase_sampler(out, seeds=4, step_lr=1e-5):
    """Production sampler chain driven by the analytic oracle."""
    a_star, x_star, l_star = rocksalt()
    cfg = get_config("unguided", pad_buckets=(8,))
    sched = build_schedulers(cfg)
    T = cfg.timesteps
    res = {}
    for mode in ("free", "fixed_cell"):
        rms_list, lat_err = [], []
        for seed in range(seeds):
            t_box = [T]
            dec = OracleDecoder(sched, x_star, l_star, a_star,
                                cfg.max_atoms, t_box)
            key = jax.random.PRNGKey(100 + seed)
            fixed_lat = (jnp.asarray(l_star)[None]
                         if mode == "fixed_cell" else None)
            state, mask = init_sampler_state(
                key, jnp.asarray([8]), 8,
                fixed_types=jnp.asarray(a_star)[None],
                fixed_lattice=fixed_lat)
            key = jax.random.fold_in(key, 1)
            for t in range(T, 0, -1):
                t_box[0] = t
                state = sampler_step(
                    None, dec, sched, cfg, state, jnp.int32(t), mask, None,
                    None, key, 1.0, step_lr,
                    fixed_types=jnp.asarray(a_star)[None],
                    fixed_lattice=fixed_lat)
            rms_list.append(wrapped_rms(state.frac_coords[0], x_star))
            lat_err.append(float(np.abs(np.asarray(state.lattices[0])
                                        - l_star).max()))
        res[mode] = {"coord_rms": rms_list, "lattice_maxerr": lat_err}
        print(f"[sampler oracle/{mode}] coord rms {rms_list} "
              f"lattice maxerr {lat_err}", flush=True)
    out["sampler"] = res


# ---------------------------------------------------------------------------


def coord_loss_at_t(decoder, params, sched, cfg, batch, t, key, n_draw=8):
    """Per-fixed-t coordinate loss (same math as diffusion_loss's coord
    branch) — the fit phase's resolution into sigma levels."""
    B, N = batch.atom_types.shape
    mask = node_mask(batch.natoms, N)
    maskf = mask.astype(jnp.float32)
    tot = 0.0
    for i in range(n_draw):
        k = jax.random.fold_in(key, t * 1000 + i)
        k_a, k_x, k_l = jax.random.split(k, 3)
        bt = jnp.full((B,), t, jnp.int32)
        temb = sinusoidal_time_embedding(bt, cfg.time_dim)
        sig = sched.sigma.sigmas[t]
        sn = sched.sigma.sigmas_norm[t]
        noise = jax.random.normal(k_x, batch.frac_coords.shape)
        target = d_log_p_wrapped_normal(
            sig * noise, jnp.full_like(noise, sig)) / jnp.sqrt(sn)
        x_t = (batch.frac_coords + sig * noise) % 1.0
        a_t = sched.d3pm.q_sample_key(k_a, batch.atom_types, bt[:, None])
        a_t = jnp.where(mask, a_t, 0)
        acp = sched.beta.alphas_cumprod[t]
        lmask = jnp.asarray(MASK_LATTICE_MATRIX)
        eps_l = jax.random.normal(k_l, batch.lattices.shape) * lmask
        l_t = (jnp.sqrt(acp) * batch.lattices
               + jnp.sqrt(1.0 - acp) * eps_l)
        outs = decoder.apply(params, a_t, x_t, l_t, mask, temb, None)
        diff = (outs.coords_out - target) * maskf[..., None]
        tot += float((diff ** 2).sum() / jnp.maximum(maskf.sum() * 3, 1))
    return tot / n_draw


def phase_fit(out, steps=4000, lr=1e-3, batch_b=16, seeds=8):
    a_star, x_star, l_star = rocksalt()
    cfg = get_config("unguided", pad_buckets=(8,), hidden_dim=128,
                     num_layers=4, compute_dtype="float32")
    sched = build_schedulers(cfg)
    decoder = build_decoder(cfg)
    batch = CrystalBatch(
        atom_types=jnp.tile(jnp.asarray(a_star)[None], (batch_b, 1)),
        frac_coords=jnp.tile(jnp.asarray(x_star)[None], (batch_b, 1, 1)),
        lattices=jnp.tile(jnp.asarray(l_star)[None], (batch_b, 1, 1)),
        natoms=jnp.full((batch_b,), 8, jnp.int32))
    key = jax.random.PRNGKey(0)
    mask = node_mask(batch.natoms, 8)
    temb0 = sinusoidal_time_embedding(jnp.ones((batch_b,), jnp.int32),
                                      cfg.time_dim)
    params = decoder.init(key, batch.atom_types, batch.frac_coords,
                          batch.lattices, mask, temb0, None)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, k):
        def loss_fn(p):
            return diffusion_loss(p, decoder, sched, cfg, batch, None, k)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, metrics

    t0 = time.time()
    hist = []
    for i in range(steps):
        params, opt_state, m = train_step(params, opt_state,
                                          jax.random.fold_in(key, i))
        if i % 500 == 0 or i == steps - 1:
            row = {k: float(v) for k, v in m.items()}
            row["step"] = i
            hist.append(row)
            print(f"[fit] step {i} loss {row['loss']:.4f} "
                  f"coords {row['loss_coords']:.4f} "
                  f"lattice {row['loss_lattice']:.4f} "
                  f"types {row['ce_loss_atom_types']:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # per-t coordinate-loss profile: where on the sigma ladder does the
    # trained net explain the target?
    T = cfg.timesteps
    profile = {}
    for t in (1, 2, 5, 10, 25, 50, 100, 200, 400, 600, 800, 1000):
        t = min(t, T)
        profile[str(t)] = round(coord_loss_at_t(
            decoder, params, sched, cfg, batch, t, jax.random.PRNGKey(7)), 4)
    print(f"[fit] per-t coord loss {profile}", flush=True)

    # sample through the real scan: CSP + fixed cell, then measure matcher
    # rms (the net is translation-invariant => matcher handles the shift)
    from chemeleon_tpu.chem.matcher import StructureMatcher
    from chemeleon_tpu.chem.structure import Crystal
    ftypes = jnp.tile(jnp.asarray(a_star)[None], (seeds, 1))
    flat = jnp.tile(jnp.asarray(l_star)[None], (seeds, 1, 1))
    state, smask = init_sampler_state(jax.random.PRNGKey(42),
                                      jnp.full((seeds,), 8, jnp.int32), 8,
                                      fixed_types=ftypes, fixed_lattice=flat)
    ts = jnp.arange(T, 0, -1)
    final, _ = run_sampler_scan(params, decoder, sched, cfg, state, ts,
                                smask, None, None,
                                jax.random.fold_in(jax.random.PRNGKey(42), 1),
                                1.0, 1e-5, False, fixed_types=ftypes,
                                fixed_lattice=flat)
    gt = Crystal(l_star, x_star, a_star.tolist())
    matcher = StructureMatcher()
    rms = []
    for i in range(seeds):
        c = Crystal(np.asarray(final.lattices[i]),
                    np.asarray(final.frac_coords[i]),
                    np.asarray(final.atom_types[i]).tolist())
        try:
            rms.append(round(float(matcher.get_rms_dist(gt, c)), 4))
        except Exception:
            rms.append(None)
    print(f"[fit] sampled matcher rms (accept <= {matcher.stol}): {rms}",
          flush=True)
    out["fit"] = {"history": hist, "per_t_coord_loss": profile,
                  "sample_rms": rms}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", nargs="+",
                    default=["sampler", "fit"])
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--out", default="results/diag_oracle.json")
    args = ap.parse_args()
    out = {}
    if "sampler" in args.phases:
        phase_sampler(out)
    if "fit" in args.phases:
        phase_fit(out, steps=args.steps)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "fit"} |
                     ({"fit_rms": out["fit"]["sample_rms"]}
                      if "fit" in out else {})))


if __name__ == "__main__":
    main()
