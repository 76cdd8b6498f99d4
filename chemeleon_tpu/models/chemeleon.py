"""Chemeleon — joint 3-modality crystal diffusion on TPU.

Rebuild of the reference diffusion module (reference:
chemeleon/modules/chemeleon.py:31-490):

  * atom types — D3PM absorbing-state discrete diffusion,
  * lattice    — variance-preserving DDPM,
  * coords     — variance-exploding score matching (wrapped-normal target),

denoised by the dense CSPNet and conditioned on text via FiLM + CFG.

TPU-first design (vs the reference's Python loop, SURVEY §3.1):

  * The whole 1000-step predictor–corrector sampler is ONE jitted
    ``lax.scan`` — zero host round-trips (the reference crosses
    device->host every step, schema.py:74-79).
  * CFG batches cond+null into a single decoder forward of batch 2B
    (the reference runs two separate forwards per prediction,
    chemeleon.py:258-285 — and 4 per step with the corrector).
  * All schedule tables are precomputed [T+1] arrays indexed by the traced
    timestep inside the scan.
  * Functions are pure (params explicit) so they pjit/shard transparently.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from chemeleon_tpu.config import ChemeleonConfig
from chemeleon_tpu.diffusion.d3pm import D3PM
from chemeleon_tpu.diffusion.schedules import (
    BetaScheduler,
    SigmaScheduler,
    d_log_p_wrapped_normal,
    prob_mask_like,
)
from chemeleon_tpu.models.cspnet import CSPNet, sinusoidal_time_embedding
from chemeleon_tpu.ops.graph import CrystalBatch, make_empty_batch, node_mask
from chemeleon_tpu.utils.trajectory import TrajectoryContainer, TrajectoryStep

# Lattice entries fixed at zero by pymatgen-style canonicalization
# (reference chemeleon.py:70-73).
MASK_LATTICE_MATRIX = np.array([[1, 0, 1], [1, 1, 1], [0, 0, 1]], np.float32)

# -- sampling profiles --------------------------------------------------------
# The Langevin corrector strength is a *deployment profile*, not physics: the
# reference hard-codes step_lr=1e-5 (reference chemeleon.py:452-462, never
# tuned upstream), but the round-4 (step_lr x corrector_noise) sweep measured
# step_lr=0 (corrector off) at +5-6 pts raw validity on the full 1000-step
# chain (results/step_lr_sweep.json, 3-seed confirm; bench corrector-off cell
# 0.73 raw / 0.99 relaxed vs 0.61 / 0.97 at 1e-5). "validity" is therefore
# the deployed default on every sampling API; "reference" opts back into
# exact upstream parity (the evaluate protocol uses it for comparability).
# step_lr is a traced scalar, so profiles share one compiled program.
SAMPLING_PROFILES: Dict[str, Dict[str, float]] = {
    "validity": {"step_lr": 0.0},
    "reference": {"step_lr": 1e-5},
}
DEFAULT_PROFILE = "validity"


def resolve_step_lr(step_lr: Optional[float],
                    profile: Optional[str]) -> float:
    """Corrector strength resolution: explicit ``step_lr`` wins, else the
    named ``profile``, else ``DEFAULT_PROFILE``."""
    if step_lr is not None:
        return float(step_lr)
    name = profile if profile is not None else DEFAULT_PROFILE
    try:
        return SAMPLING_PROFILES[name]["step_lr"]
    except KeyError:
        raise ValueError(
            f"unknown sampling profile {name!r}; expected one of "
            f"{sorted(SAMPLING_PROFILES)} (or pass step_lr explicitly)")


@struct.dataclass
class SamplerState:
    atom_types: jnp.ndarray   # [B, N] int32
    lattices: jnp.ndarray     # [B, 3, 3]
    frac_coords: jnp.ndarray  # [B, N, 3], wrapped to [0, 1)


class Schedulers(NamedTuple):
    beta: BetaScheduler
    sigma: SigmaScheduler
    d3pm: D3PM


def build_schedulers(cfg: ChemeleonConfig) -> Schedulers:
    beta = BetaScheduler.create(cfg.timesteps, cfg.beta_schedule)
    sigma = SigmaScheduler.create(cfg.timesteps)
    d3pm = D3PM.create(beta, cfg.timesteps, cfg.max_atoms, cfg.d3pm_hybrid_coeff)
    return Schedulers(beta, sigma, d3pm)


def build_decoder(cfg: ChemeleonConfig) -> CSPNet:
    return CSPNet(
        hidden_dim=cfg.hidden_dim, time_dim=cfg.time_dim,
        text_dim=cfg.text_dim if cfg.text_guide else 0,
        num_layers=cfg.num_layers, max_atoms=cfg.max_atoms, act_fn=cfg.act_fn,
        dis_emb=cfg.dis_emb, num_freqs=cfg.num_freqs, edge_style=cfg.edge_style,
        cutoff=cfg.cutoff, max_neighbors=cfg.max_neighbors,
        image_range=cfg.knn_image_range, ln=cfg.ln,
        ip=cfg.ip, smooth=cfg.smooth, pred_atom_types=cfg.pred_atom_types,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        remat=cfg.remat)


# ---------------------------------------------------------------------------
# Training loss (reference Chemeleon.forward, chemeleon.py:137-244)
# ---------------------------------------------------------------------------

def diffusion_loss(decoder_params: Any, decoder: CSPNet, sched: Schedulers,
                   cfg: ChemeleonConfig, batch: CrystalBatch,
                   text_embeds: Optional[jnp.ndarray],
                   key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Joint loss over the three modalities. ``text_embeds`` is the already
    cond-dropped [B, text_dim] conditioning (or None when unguided).

    Masked means reproduce the reference's flat-node means exactly (padding
    does not exist upstream)."""
    B, N = batch.atom_types.shape
    mask = batch.node_mask
    maskf = mask.astype(jnp.float32)
    k_t, k_a, k_l, k_x = jax.random.split(key, 4)

    batched_t = sched.beta.uniform_sample_t(k_t, B)              # [B] in 1..T
    time_emb = sinusoidal_time_embedding(batched_t, cfg.time_dim)

    alpha_cumprod = sched.beta.alphas_cumprod[batched_t]         # [B]
    c0 = jnp.sqrt(alpha_cumprod)
    c1 = jnp.sqrt(1.0 - alpha_cumprod)
    sigmas = sched.sigma.sigmas[batched_t]
    sigmas_norm = sched.sigma.sigmas_norm[batched_t]

    # 1) D3PM q_sample for atom types (chemeleon.py:159-169)
    t_per_node = batched_t[:, None]                              # [B, 1] -> bcast
    a_0 = batch.atom_types
    x_t_atom_types = sched.d3pm.q_sample_key(k_a, a_0, t_per_node)
    # keep padding at the absorbing class
    x_t_atom_types = jnp.where(mask, x_t_atom_types, 0)

    # 2) VP lattice (chemeleon.py:171-175)
    lmask = jnp.asarray(MASK_LATTICE_MATRIX)
    noise_lattice = jax.random.normal(k_l, batch.lattices.shape) * lmask
    x_t_lattice = (c0[:, None, None] * batch.lattices
                   + c1[:, None, None] * noise_lattice)

    # 3) VE coords with wrapped-normal target (chemeleon.py:177-188)
    noise_coords = jax.random.normal(k_x, batch.frac_coords.shape)
    sigmas_per_atom = sigmas[:, None, None]                      # [B, 1, 1]
    sigmas_norm_per_atom = sigmas_norm[:, None, None]
    target_coords = (d_log_p_wrapped_normal(sigmas_per_atom * noise_coords,
                                            jnp.broadcast_to(sigmas_per_atom,
                                                             noise_coords.shape))
                     / jnp.sqrt(sigmas_norm_per_atom))
    x_t_coords = (batch.frac_coords + sigmas_per_atom * noise_coords) % 1.0

    out = decoder.apply(decoder_params, x_t_atom_types, x_t_coords,
                        x_t_lattice, mask, time_emb, text_embeds)

    # atom-type loss: VB + hybrid_coeff * CE (chemeleon.py:211-222)
    true_logits = sched.d3pm.q_posterior_logits(a_0, x_t_atom_types, t_per_node)
    pred_logits = sched.d3pm.q_posterior_logits(out.atom_types_out,
                                                x_t_atom_types, t_per_node,
                                                is_x_0_one_hot=True)
    vb_loss = sched.d3pm.categorical_kl_logits(true_logits, pred_logits,
                                               mask=mask)
    logp = jax.nn.log_softmax(out.atom_types_out, axis=-1)
    ce = -jnp.take_along_axis(logp, a_0[..., None], axis=-1)[..., 0]
    ce_loss = (ce * maskf).sum() / jnp.maximum(maskf.sum(), 1.0)
    loss_atom_types = vb_loss + ce_loss * sched.d3pm.hybrid_coeff

    # lattice loss over the 6 unmasked entries (chemeleon.py:224-227)
    diff_l = (out.lattice_out - noise_lattice) * lmask
    loss_lattice = (diff_l ** 2).sum() / (B * lmask.sum())

    # coords loss (chemeleon.py:229)
    diff_x = (out.coords_out - target_coords) * maskf[..., None]
    loss_coords = (diff_x ** 2).sum() / jnp.maximum(maskf.sum() * 3.0, 1.0)

    loss = (cfg.cost_atom_types * loss_atom_types
            + cfg.cost_lattice * loss_lattice
            + cfg.cost_coords * loss_coords)

    # MAE metrics matching base_module.py:55-72
    mae_lattice = (jnp.abs(diff_l).sum() / (B * lmask.sum()))
    mae_coords = (jnp.abs(diff_x).sum()
                  / jnp.maximum(maskf.sum() * 3.0, 1.0))
    metrics = {
        "loss": loss,
        "vb_loss_atom_types": vb_loss,
        "ce_loss_atom_types": ce_loss,
        "loss_lattice": loss_lattice,
        "loss_coords": loss_coords,
        "mae_lattice": mae_lattice,
        "mae_coords": mae_coords,
    }
    return loss, metrics


# ---------------------------------------------------------------------------
# CFG model predictions (reference chemeleon.py:246-303), single 2B forward
# ---------------------------------------------------------------------------

def model_predictions(decoder_params: Any, decoder: CSPNet,
                      time_emb: jnp.ndarray, atom_types: jnp.ndarray,
                      frac_coords: jnp.ndarray, lattices: jnp.ndarray,
                      mask: jnp.ndarray, cond_scale: float,
                      text_embeds: Optional[jnp.ndarray],
                      null_text_embeds: Optional[jnp.ndarray]):
    if text_embeds is not None:
        # One forward with R=2 conditioning replicas [conditional; null] over
        # shared geometry — the pairwise Fourier matmuls run once, not twice
        # (vs the reference's two separate decoder calls, chemeleon.py:258-285).
        out = decoder.apply(decoder_params, atom_types, frac_coords,
                            lattices, mask, time_emb,
                            jnp.stack([text_embeds, null_text_embeds], axis=0))
        B = atom_types.shape[0]
        mix = lambda y: ((1.0 - cond_scale) * y[B:] + cond_scale * y[:B])
        return (mix(out.atom_types_out), mix(out.lattice_out),
                mix(out.coords_out))
    out = decoder.apply(decoder_params, atom_types, frac_coords, lattices,
                        mask, time_emb, None)
    return out.atom_types_out, out.lattice_out, out.coords_out


# ---------------------------------------------------------------------------
# Predictor–corrector sampler as a lax.scan (reference chemeleon.py:305-467)
# ---------------------------------------------------------------------------

def sampler_step(decoder_params: Any, decoder: CSPNet, sched: Schedulers,
                 cfg: ChemeleonConfig, state: SamplerState, t: jnp.ndarray,
                 mask: jnp.ndarray, text_embeds: Optional[jnp.ndarray],
                 null_text_embeds: Optional[jnp.ndarray], key: jax.Array,
                 cond_scale: float, step_lr: float,
                 fixed_types: Optional[jnp.ndarray] = None,
                 type_prior: Optional[jnp.ndarray] = None,
                 s: Optional[jnp.ndarray] = None,
                 lattice_sys: Optional[jnp.ndarray] = None,
                 corrector_noise: float = 1.0,
                 fixed_lattice: Optional[jnp.ndarray] = None) -> SamplerState:
    """One reverse step t -> t-1 (predictor + corrector).

    ``s`` switches to the strided (few-step) update t -> s for an arbitrary
    0 <= s < t: the D3PM ancestral step becomes the absorbing-chain jump
    posterior (d3pm.q_posterior_logits_jump), the lattice step becomes the
    DDIM eta=1 update (whose mean and variance reduce EXACTLY to this DDPM
    ancestral step at s == t-1, since sched.beta.sigmas is the posterior
    std), and the VE coords predictor anneals to sigma[s] instead of
    sigma[t-1]. ``s is None`` keeps the reference-parity one-step math
    untouched. The reference sampler is strictly 1000-step
    (chemeleon.py:305-467); sample_steps is a framework extension that
    trades sampler steps for serving throughput at a measured validity cost
    (BENCH.md).

    ``fixed_types`` [B, N] switches to CSP mode (the DiffCSP task CSPNet was
    built for): atom types are KNOWN and clamped every step — only lattice
    and coords diffuse. The reference has no such mode (its composition
    workflow filters text-guided samples, sample_target_composition.py:57-62);
    here it turns exact-composition generation from a rejection-sampling
    lottery into a certainty.

    ``type_prior`` [B, C] is an additive log-bias on the predicted x0 type
    logits (composition-prior guidance — classifier guidance with an analytic
    classifier): types still diffuse freely, but each ancestral step is
    steered toward the target element fractions. Softer than CSP (atom
    counts/stoichiometry stay free), stronger than text guidance alone.

    ``lattice_sys`` [B] int32 (ops/lattice_proj.SYSTEM_IDS; 0 = free) clamps
    each row's lattice to its prompted lattice-system metric constraints
    after every reverse update — the symmetry analog of ``fixed_types``,
    motivated by the measured steering gap (BENCH.md "Crystal-system
    conditioning": prompts pull lattice geometry up to 8.7 sigma but never
    reach exact symmetry). The chain then diffuses within the constraint
    manifold and the final cell satisfies the prompted lattice system by
    construction."""
    B, N = state.atom_types.shape
    C = cfg.max_atoms
    lmask = jnp.asarray(MASK_LATTICE_MATRIX)
    T = cfg.timesteps

    key_t = jax.random.fold_in(key, t)
    k_a, k_l, k_x1, k_x2 = jax.random.split(key_t, 4)
    # zero noise at the final step (t == 1 one-step; s == 0 strided)
    not_last = ((t > 1) if s is None else (s > 0)).astype(jnp.float32)

    batched_t = jnp.full((B,), t, jnp.int32)
    time_emb = sinusoidal_time_embedding(batched_t, cfg.time_dim)

    a_t, l_t, x_t = state.atom_types, state.lattices, state.frac_coords

    # ---- Predictor (chemeleon.py:387-398) ----
    pred_a, pred_l, pred_x = model_predictions(
        decoder_params, decoder, time_emb, a_t, x_t, l_t, mask, cond_scale,
        text_embeds, null_text_embeds)

    # atom types: D3PM ancestral step (chemeleon.py:399-411)
    if type_prior is not None:
        pred_a = pred_a + type_prior[:, None, :]
    rand_a = jax.random.uniform(k_a, (B, N, C))
    t_bn = jnp.full((B, N), t, jnp.int32)
    if s is None:
        a_next = sched.d3pm.p_logits(pred_a, a_t, t_bn, rand_a)
    else:
        s_bn = jnp.full((B, N), s, jnp.int32)
        a_next = sched.d3pm.p_logits_jump(pred_a, a_t, t_bn, s_bn, rand_a)
    a_next = jnp.where(mask, a_next, 0)
    if fixed_types is not None:
        # CSP rows clamp to their known types; -1 sentinel rows (mixed
        # batches, e.g. a /generate window coalescing CSP and free
        # requests) keep the diffused update. The extra D3PM step on
        # all-CSP batches is noise-free w.r.t. the other chains (separate
        # split keys) and negligible vs the network forward.
        csp_row = jnp.any(fixed_types > 0, axis=-1)
        a_next = jnp.where(csp_row[:, None] & mask,
                           jnp.maximum(fixed_types, 0), a_next)

    rand_l = jax.random.normal(k_l, (B, 3, 3)) * not_last * lmask
    if s is None:
        # lattice: DDPM ancestral step (chemeleon.py:412-425)
        alpha_t = sched.beta.alphas[t]
        acp_t = sched.beta.alphas_cumprod[t]
        sig_t = sched.beta.sigmas[t]
        c0 = 1.0 / jnp.sqrt(alpha_t)
        c1 = (1.0 - alpha_t) / jnp.sqrt(1.0 - acp_t)
        l_next = c0 * (l_t - c1 * pred_l) + sig_t * rand_l
    else:
        # lattice: DDIM eta=1 jump t -> s. alphas_cumprod[0] == 1, so at
        # s == 0 the variance and direction terms vanish and l_0 = x0_hat.
        acp_t = sched.beta.alphas_cumprod[t]
        acp_s = sched.beta.alphas_cumprod[s]
        x0_hat = (l_t - jnp.sqrt(1.0 - acp_t) * pred_l) / jnp.sqrt(acp_t)
        var = (1.0 - acp_s) / (1.0 - acp_t) * (1.0 - acp_t / acp_s)
        dir_coef = jnp.sqrt(jnp.clip(1.0 - acp_s - var, 0.0))
        l_next = (jnp.sqrt(acp_s) * x0_hat + dir_coef * pred_l
                  + jnp.sqrt(jnp.clip(var, 0.0)) * rand_l)
    l_next = l_next * lmask
    l_next = jnp.where(t == T, jnp.clip(l_next, -6.0, 6.0), l_next)
    if lattice_sys is not None:
        from chemeleon_tpu.ops.lattice_proj import project_lattice_system
        l_next = project_lattice_system(l_next, lattice_sys) * lmask
    if fixed_lattice is not None:
        # fixed-cell mode (the exact-cell sibling of lattice_sys): the cell
        # is KNOWN (already canonical/scaled host-side) and clamped every
        # step — only coordinates (and types, unless CSP) diffuse
        l_next = fixed_lattice

    # coords half-step: VE ancestral (chemeleon.py:426-437); the strided
    # path anneals straight to sigma[s] (sigmas[0] == 0, so the final jump
    # is noiseless either way)
    sx = sched.sigma.sigmas[t]
    sn = sched.sigma.sigmas_norm[t]
    adj = sched.sigma.sigmas[t - 1 if s is None else s]
    step_size = sx ** 2 - adj ** 2
    std_x = jnp.sqrt((adj ** 2 * (sx ** 2 - adj ** 2)) / (sx ** 2))
    rand_x = jax.random.normal(k_x1, (B, N, 3)) * not_last
    x_half = x_t - step_size * (pred_x * jnp.sqrt(sn)) + std_x * rand_x

    # ---- Corrector (chemeleon.py:439-457): Langevin on coords ----
    _, _, pred_x2 = model_predictions(
        decoder_params, decoder, time_emb, a_next, x_half, l_next, mask,
        cond_scale, text_embeds, null_text_embeds)
    step2 = step_lr * (sx / sched.sigma.sigma_begin) ** 2
    std2 = jnp.sqrt(2.0 * step2)
    # corrector_noise scales ONLY the Langevin noise injection (1.0 =
    # reference parity; 0.0 = deterministic corrector drift) — the
    # validity-tuning knob swept in scripts/probe_step_lr.py
    rand_x2 = jax.random.normal(k_x2, (B, N, 3)) * not_last * corrector_noise
    x_next = x_half - step2 * (pred_x2 * jnp.sqrt(sn)) + std2 * rand_x2

    return SamplerState(atom_types=a_next, lattices=l_next,
                        frac_coords=x_next % 1.0)


def init_sampler_state(key: jax.Array, natoms: jnp.ndarray,
                       n_max: int,
                       fixed_types: Optional[jnp.ndarray] = None,
                       lattice_sys: Optional[jnp.ndarray] = None,
                       fixed_lattice: Optional[jnp.ndarray] = None,
                       ) -> Tuple[SamplerState, jnp.ndarray]:
    """Pure-noise init (chemeleon.py:346-349): a_T all-dummy, l_T masked
    N(0,1), x_T N(0,1) wrapped. In CSP mode (``fixed_types``) a_T starts at
    the known types instead of the absorbing state; rows whose fixed_types
    are the -1 free-row sentinel (mixed batches — serve/server.py
    ``fixed_comp``) start at the absorbing state like a plain batch.
    ``lattice_sys`` projects l_T onto the prompted lattice-system manifold
    so even the FIRST decoder call sees an in-class cell (see
    sampler_step)."""
    B = natoms.shape[0]
    k_l, k_x = jax.random.split(key)
    lmask = jnp.asarray(MASK_LATTICE_MATRIX)
    if fixed_types is None:
        a_T = jnp.zeros((B, n_max), jnp.int32)
    else:
        csp_row = jnp.any(fixed_types > 0, axis=-1)
        a_T = jnp.where(csp_row[:, None],
                        jnp.maximum(fixed_types, 0), 0).astype(jnp.int32)
    l_T = jax.random.normal(k_l, (B, 3, 3)) * lmask
    if lattice_sys is not None:
        from chemeleon_tpu.ops.lattice_proj import project_lattice_system
        l_T = project_lattice_system(l_T, lattice_sys) * lmask
    if fixed_lattice is not None:
        l_T = fixed_lattice  # fixed-cell mode: start AT the known cell
    x_T = jax.random.normal(k_x, (B, n_max, 3))
    mask = node_mask(natoms, n_max)
    return SamplerState(a_T, l_T, x_T % 1.0), mask


def run_sampler_scan(decoder_params: Any, decoder: CSPNet, sched: Schedulers,
                     cfg: ChemeleonConfig, state: SamplerState,
                     ts: jnp.ndarray, mask: jnp.ndarray,
                     text_embeds: Optional[jnp.ndarray],
                     null_text_embeds: Optional[jnp.ndarray], key: jax.Array,
                     cond_scale: float, step_lr: float,
                     record_traj: bool, stride: int = 1,
                     fixed_types: Optional[jnp.ndarray] = None,
                     type_prior: Optional[jnp.ndarray] = None,
                     lattice_sys: Optional[jnp.ndarray] = None,
                     corrector_noise: float = 1.0,
                     fixed_lattice: Optional[jnp.ndarray] = None):
    """Scan the reverse process over ``ts``.

    ``ts`` is either [K] descending consecutive timesteps (the
    reference-parity path: every step is t -> t-1) or [K, 2] (t, s) pairs
    from ``strided_sample_ts`` (the few-step path: each step jumps t -> s).

    ``stride`` (cfg.trajectory_stride) thins the recorded trajectory: the
    scan runs over ``ts`` reshaped [T/stride, stride] with an inner scan per
    chunk and emits only the last-of-chunk state, so the stacked ys (the
    host transfer in trajectory mode) shrink stride-fold. The reference
    snapshots at the consumer's cadence instead (streamlit_app.py:19-21)."""
    strided = ts.ndim == 2

    def step(carry: SamplerState, t):
        t, s = (t[0], t[1]) if strided else (t, None)
        return sampler_step(decoder_params, decoder, sched, cfg, carry, t,
                            mask, text_embeds, null_text_embeds, key,
                            cond_scale, step_lr, fixed_types=fixed_types,
                            type_prior=type_prior, s=s,
                            lattice_sys=lattice_sys,
                            corrector_noise=corrector_noise,
                            fixed_lattice=fixed_lattice)

    unroll = max(1, int(getattr(cfg, "sampler_scan_unroll", 1)))
    if not record_traj or stride <= 1:
        def body(carry, t):
            nxt = step(carry, t)
            ys = ((nxt.atom_types, nxt.frac_coords, nxt.lattices)
                  if record_traj else None)
            return nxt, ys
        return jax.lax.scan(body, state, ts, unroll=unroll)

    n = ts.shape[0]
    if n % stride != 0:
        raise ValueError(
            f"trajectory_stride={stride} must divide the number of sampler "
            f"steps ({n})")

    def chunk_body(carry, t_chunk):
        nxt, _ = jax.lax.scan(lambda c, t: (step(c, t), None), carry, t_chunk,
                              unroll=unroll)
        return nxt, (nxt.atom_types, nxt.frac_coords, nxt.lattices)

    shape = (n // stride, stride, 2) if strided else (n // stride, stride)
    return jax.lax.scan(chunk_body, state, ts.reshape(shape))


def strided_sample_ts(timesteps: int, sample_steps: Optional[int]) -> jnp.ndarray:
    """Timestep schedule for the sampler scan.

    Returns the [T] descending consecutive array (reference-parity path)
    when ``sample_steps`` is falsy or == timesteps, else a [K, 2] array of
    (t, s) jump pairs over K timesteps spread evenly across [1, T] with a
    final jump to s = 0 (run_sampler_scan dispatches on ndim)."""
    T = int(timesteps)
    K = int(sample_steps or 0)
    if K in (0, T):
        return jnp.arange(T, 0, -1)
    if not 1 <= K < T:
        raise ValueError(f"sample_steps={K} must be in [1, timesteps={T}]")
    # descending, always starting at T (K=1 => one jump T -> 0)
    ts = np.round(np.linspace(T, 1, K)).astype(np.int64)
    s = np.concatenate([ts[1:], [0]])
    return jnp.asarray(np.stack([ts, s], axis=1), jnp.int32)


# ---------------------------------------------------------------------------
# Public facade
# ---------------------------------------------------------------------------

class Chemeleon:
    """User-facing model (reference Chemeleon LightningModule,
    chemeleon.py:31-490). Holds config + modules + params; heavy math lives
    in the pure functions above."""

    def __init__(self, config: ChemeleonConfig,
                 text_backend: str = "auto"):
        # every consumer (CLI, server, scripts, notebooks) benefits from the
        # cross-process XLA cache; no-ops if the process configured its own
        from chemeleon_tpu.utils.compilation_cache import (
            enable_persistent_compilation_cache)
        enable_persistent_compilation_cache()
        self.cfg = config
        self.decoder = build_decoder(config)
        # one decoder for training and sampling: the XLA compute schedule won
        # every on-chip shootout vs the fused Pallas edge kernel (see
        # BENCH.md 'Pallas kernel post-mortem'); the kernel was removed.
        self.decoder_sample = self.decoder
        self.sched = build_schedulers(config)
        self.text_encoder = None
        if config.text_guide:
            from chemeleon_tpu.text.encoder import TextEncoder
            self.text_encoder = TextEncoder(
                text_encoder_name=config.text_encoder,
                text_embed_dim=config.text_embed_dim,
                max_text_len=config.max_text_len,
                text_dim=config.text_dim,
                trainable_text_encoder=config.trainable_text_encoder,
                backend=text_backend)
        self.params: Optional[Dict[str, Any]] = None
        self._sampler_cache: Dict[Tuple, Any] = {}

    # -- params -------------------------------------------------------------
    def init_params(self, key: jax.Array, n_max: int = 8) -> Dict[str, Any]:
        k_dec, k_txt = jax.random.split(key)
        B = 2
        types = jnp.zeros((B, n_max), jnp.int32)
        coords = jnp.zeros((B, n_max, 3))
        lat = jnp.eye(3)[None].repeat(B, 0)
        mask = jnp.ones((B, n_max), bool)
        temb = sinusoidal_time_embedding(jnp.ones((B,)), self.cfg.time_dim)
        text = (jnp.zeros((B, self.cfg.text_dim))
                if self.cfg.text_guide else None)
        dec = self.decoder.init(k_dec, types, coords, lat, mask, temb, text)
        params = {"decoder": dec}
        if self.text_encoder is not None:
            params["text"] = self.text_encoder.init_params(k_txt)
        self.params = params
        return params

    # -- training loss -------------------------------------------------------
    def loss(self, params: Dict[str, Any], batch: CrystalBatch,
             raw_text, key: jax.Array):
        """Jit-friendly loss. ``raw_text`` is ``text_encoder.text_inputs``
        output: [B, text_embed_dim] backend embeddings (frozen encoder),
        (input_ids, attention_mask) tokens when ``trainable_text_encoder``
        (the tower forward then runs here, under grad — reference
        text_encoder.py:36-46), or None when unguided."""
        text_embeds = None
        k_drop, k_loss = jax.random.split(key)
        if self.cfg.text_guide:
            keep = prob_mask_like(k_drop, (batch.batch_size,),
                                  1.0 - self.cfg.cond_drop_prob)
            te = self.text_encoder
            raw = te.raw_embeds_in_loss(params["text"], raw_text)
            text_embeds = te.conditioner.apply(
                te.conditioner_params(params["text"]), raw, keep)
        return diffusion_loss(params["decoder"], self.decoder, self.sched,
                              self.cfg, batch, text_embeds, k_loss)

    # -- sampling ------------------------------------------------------------
    def _get_compiled_sampler(self, B: int, n_max: int, record_traj: bool,
                              chunk: Optional[int], csp: bool = False,
                              prior: bool = False, lsys: bool = False,
                              flat: bool = False):
        stride = self.cfg.trajectory_stride if record_traj else 1
        sig = (B, n_max, record_traj, chunk, self.cfg.text_guide, stride, csp,
               prior, lsys, flat)
        if sig in self._sampler_cache:
            return self._sampler_cache[sig]

        decoder, sched, cfg = self.decoder_sample, self.sched, self.cfg

        @functools.partial(jax.jit, static_argnames=())
        def run(params, natoms, text_embeds, null_text_embeds, key,
                cond_scale, step_lr, ts, fixed_types=None, state_in=None,
                type_prior=None, lattice_sys=None, corrector_noise=1.0,
                fixed_lattice=None):
            if state_in is None:
                state, mask = init_sampler_state(key, natoms, n_max,
                                                 fixed_types=fixed_types,
                                                 lattice_sys=lattice_sys,
                                                 fixed_lattice=fixed_lattice)
            else:
                state = state_in
                mask = node_mask(natoms, n_max)
            final, traj = run_sampler_scan(
                params, decoder, sched, cfg, state, ts, mask,
                text_embeds if cfg.text_guide else None,
                null_text_embeds if cfg.text_guide else None,
                jax.random.fold_in(key, 1), cond_scale, step_lr, record_traj,
                stride=stride, fixed_types=fixed_types,
                type_prior=type_prior, lattice_sys=lattice_sys,
                corrector_noise=corrector_noise,
                fixed_lattice=fixed_lattice)
            return final, traj

        self._sampler_cache[sig] = run
        return run

    def _prepare_sampling_inputs(self, natoms, texts, key,
                                 n_max: Optional[int] = None):
        """Shared input validation + empty batch + text conditioning for
        sample_batch and the streaming path (kept in ONE place so fixes
        reach both)."""
        if self.params is None:
            raise RuntimeError("call init_params() or load a checkpoint "
                               "before sampling")
        cfg = self.cfg
        if cfg.text_guide and texts is None:
            raise ValueError(
                "this model is text-guided (cfg.text_guide=True): pass a "
                "prompt (sample) / texts list (sample_batch)")
        if texts is not None and len(natoms) != len(texts):
            raise ValueError(
                "natoms and texts must have the same number of elements.")
        if n_max is not None and natoms and n_max < max(natoms):
            raise ValueError(
                f"n_max={n_max} is smaller than the largest requested "
                f"structure ({max(natoms)} atoms) — results would be "
                "silently truncated")
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        batch0 = make_empty_batch(natoms, n_max=n_max,
                                  buckets=cfg.pad_buckets)
        B = batch0.atom_types.shape[0]
        text_embeds = null_embeds = jnp.zeros((B, max(cfg.text_dim, 1)))
        if cfg.text_guide:
            text_embeds, null_embeds = self.text_encoder.embed_cond_and_null(
                self.params["text"], texts)
        return batch0, text_embeds, null_embeds, key

    def _pad_fixed_types(self, fixed_types, natoms: List[int], N: int):
        """[B, N] int32 from per-structure atomic-number sequences; each must
        have exactly natoms[i] entries (the padded tail is 0/dummy). None
        entries mark free rows (mixed CSP/free batches — the dynamic
        batcher coalesces both kinds into one window): encoded as the -1
        sentinel the sampler blends on (see sampler_step)."""
        arr = np.zeros((len(natoms), N), np.int32)
        for i, (types, n) in enumerate(zip(fixed_types, natoms)):
            if types is None:
                arr[i] = -1
                continue
            types = np.asarray(types, np.int32)
            if types.shape != (n,):
                raise ValueError(
                    f"fixed_types[{i}] has {types.shape[0] if types.ndim else 0}"
                    f" entries but natoms[{i}]={n}")
            if (types < 1).any() or (types >= self.cfg.max_atoms).any():
                raise ValueError(
                    f"fixed_types[{i}] entries must be atomic numbers in "
                    f"[1, {self.cfg.max_atoms - 1}]")
            arr[i, :n] = types
        return jnp.asarray(arr)

    def _prepare_type_conditioning(self, natoms: List[int], B: int, N: int,
                                   fixed_types, comp_prior,
                                   comp_prior_scale):
        """Validate + build the (ftypes, type_prior) pair shared by the
        batched and streaming samplers (see sample_batch docstring)."""
        cfg = self.cfg
        ftypes = None
        if fixed_types is not None:
            if len(fixed_types) != len(natoms):
                raise ValueError("fixed_types and natoms must have the same "
                                 "number of elements.")
            if comp_prior is not None:
                # mixed batches may carry CSP rows AND prior-guided free
                # rows (None entries on the other list), but the SAME row
                # cannot have both: types that do not diffuse cannot be
                # steered
                both = [i for i, (ft, cp) in enumerate(
                    zip(fixed_types, comp_prior))
                    if ft is not None and cp is not None]
                if both:
                    raise ValueError(
                        f"rows {both} set both fixed_types and comp_prior; "
                        "comp_prior has no effect in CSP mode (fixed_types):"
                        " types do not diffuse")
            if all(ft is None for ft in fixed_types):
                fixed_types = None  # all-free degenerates to a plain batch
            else:
                ftypes = self._pad_fixed_types(fixed_types, natoms, N)
        type_prior = None
        if comp_prior is not None:
            if len(comp_prior) != len(natoms):
                raise ValueError("comp_prior and natoms must have the same "
                                 "number of elements.")
            # per-row scales let one coalesced batch mix requests with
            # different guidance strengths (serve/server.py /generate)
            scales = (list(comp_prior_scale)
                      if isinstance(comp_prior_scale, (list, tuple))
                      else [comp_prior_scale] * len(comp_prior))
            if len(scales) != len(comp_prior):
                raise ValueError("comp_prior_scale list must match "
                                 "comp_prior length.")
            from chemeleon_tpu.chem.composition import composition_log_prior
            prior_np = np.zeros((B, cfg.max_atoms), np.float32)
            rows = [i for i, c in enumerate(comp_prior)
                    if c is not None and scales[i] != 0.0]
            if rows:
                prior_np[rows] = (
                    np.asarray([scales[i] for i in rows],
                               np.float32)[:, None]
                    * composition_log_prior([comp_prior[i] for i in rows],
                                            cfg.max_atoms))
                type_prior = jnp.asarray(prior_np)
        return ftypes, type_prior

    def _prepare_fixed_lattice(self, natoms: List[int], B: int,
                               fixed_lattice, lattice_system):
        """[B, 3, 3] clamped cells (canonicalized to the training frame's
        zero pattern) from one matrix or a per-structure list. Mutually
        exclusive with lattice_system (an exact cell already implies its
        system)."""
        if fixed_lattice is None:
            return None
        if lattice_system is not None:
            raise ValueError("fixed_lattice and lattice_system are mutually "
                             "exclusive: an exact cell already pins the "
                             "lattice system")
        from chemeleon_tpu.chem.lattice import canonicalize_lattice
        mats = (list(fixed_lattice)
                if isinstance(fixed_lattice, (list, tuple))
                else [fixed_lattice] * len(natoms))
        if len(mats) != len(natoms):
            raise ValueError("fixed_lattice and natoms must have the same "
                             "number of elements.")
        arr = np.zeros((B, 3, 3), np.float32)
        arr[:, 0, 0] = arr[:, 1, 1] = arr[:, 2, 2] = 1.0  # benign pad rows
        for i, m in enumerate(mats):
            m = np.asarray(m, np.float64)
            if m.shape != (3, 3):
                raise ValueError(f"fixed_lattice[{i}] must be 3x3")
            arr[i] = canonicalize_lattice(m)
        return jnp.asarray(arr)

    def _prepare_lattice_system(self, natoms: List[int], B: int,
                                lattice_system):
        """[B] int32 system ids (0 = free, incl. padding rows) from a single
        crystal-system word or a per-structure list (None entries = free).
        Returns None when nothing is actually clamped."""
        if lattice_system is None:
            return None
        from chemeleon_tpu.ops.lattice_proj import system_ids
        systems = ([lattice_system] * len(natoms)
                   if isinstance(lattice_system, str)
                   else list(lattice_system))
        if len(systems) != len(natoms):
            raise ValueError("lattice_system and natoms must have the same "
                             "number of elements.")
        ids = np.zeros((B,), np.int32)
        ids[:len(systems)] = system_ids(systems)
        return jnp.asarray(ids) if ids.any() else None

    def sample_batch(self, natoms: List[int],
                     texts: Optional[List[str]] = None,
                     cond_scale: float = 2.0,
                     step_lr: Optional[float] = None,
                     key: Optional[jax.Array] = None,
                     return_trajectory: bool = False,
                     n_max: Optional[int] = None,
                     mesh=None, fixed_types=None,
                     comp_prior: Optional[List[Optional[str]]] = None,
                     comp_prior_scale: float = 1.0,
                     sample_steps: Optional[int] = None,
                     lattice_system=None,
                     corrector_noise: float = 1.0,
                     fixed_lattice=None,
                     profile: Optional[str] = None):
        """Batched sampling API (heals the reference's API skew — SURVEY §3.5:
        evaluate.py/dash_app.py call an older (natoms, texts) signature).

        ``mesh``: optional jax.sharding.Mesh — shards the batch over the
        data axis for multi-chip inference (params replicated; one compiled
        program, bitwise-equal to single-device per
        test_sharded_sampling_matches_single_device). len(natoms) must be
        divisible by the data-axis size.

        ``fixed_types``: optional per-structure atomic-number sequences
        (len == natoms[i]) switching to CSP mode — types clamped, only
        geometry diffuses (see sampler_step).

        ``comp_prior``: optional per-structure composition strings (None
        entries = unbiased row) for composition-prior guided sampling —
        ``comp_prior_scale`` * log-fraction bias added to the predicted x0
        type logits each step (see sampler_step). Mutually exclusive with
        ``fixed_types``; scale 0.0 reproduces unbiased sampling exactly.

        ``sample_steps``: run K < cfg.timesteps strided reverse steps
        (defaults to cfg.sample_steps; 0/None = all timesteps). ~T/K faster
        at a measured validity cost (BENCH.md few-step table).

        ``lattice_system``: a crystal-system word or per-structure list
        (None entries free) — clamps each row's lattice to that system's
        Bravais metric constraints every reverse step (ops/lattice_proj;
        see sampler_step). Composable with ``fixed_types`` (CSP): together
        they guarantee exact composition AND lattice system by
        construction.

        ``corrector_noise``: multiplier on the Langevin corrector's noise
        injection (1.0 = reference parity, 0.0 = deterministic corrector
        drift). Swept for validity in scripts/probe_step_lr.py.

        ``fixed_lattice``: optional per-structure 3x3 cell matrices (or one
        matrix for all rows) — the cell is KNOWN and clamped every step
        (canonicalized host-side to the training frame), so only
        coordinates (and types, unless ``fixed_types``) diffuse. The
        exact-cell sibling of ``lattice_system``; with ``fixed_types`` this
        is Rietveld-style structure solution at a known cell.

        ``profile`` / ``step_lr``: corrector strength. Default is the
        ``"validity"`` profile (corrector off — measured +5-6 pts raw
        validity, SAMPLING_PROFILES); ``profile="reference"`` restores the
        upstream 1e-5; an explicit ``step_lr`` overrides both."""
        step_lr = resolve_step_lr(step_lr, profile)
        cfg = self.cfg
        if sample_steps is None:
            sample_steps = cfg.sample_steps
        batch0, text_embeds, null_embeds, key = \
            self._prepare_sampling_inputs(natoms, texts, key, n_max)
        B, N = batch0.atom_types.shape
        ftypes, type_prior = self._prepare_type_conditioning(
            natoms, B, N, fixed_types, comp_prior, comp_prior_scale)
        lsys_ids = self._prepare_lattice_system(natoms, B, lattice_system)
        flat = self._prepare_fixed_lattice(natoms, B, fixed_lattice,
                                           lattice_system)

        decoder_params = self.params["decoder"]
        batch_natoms = batch0.natoms
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from chemeleon_tpu.parallel.mesh import DATA_AXIS, replicate

            dp = mesh.shape[DATA_AXIS]
            assert B % dp == 0, (
                f"batch of {B} structures does not divide the data axis "
                f"({dp}); pad natoms/texts to a multiple of {dp}")
            shard = lambda x: jax.device_put(x, NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))
            batch_natoms = shard(batch_natoms)
            text_embeds = shard(text_embeds)
            null_embeds = shard(null_embeds)
            if ftypes is not None:
                ftypes = shard(ftypes)
            if type_prior is not None:
                type_prior = shard(type_prior)
            if lsys_ids is not None:
                lsys_ids = shard(lsys_ids)
            if flat is not None:
                flat = shard(flat)
            # replicate params once per (mesh, params), not per call (serving
            # hot path). Identity-compare BOTH sources and keep them alive in
            # the cache entry: keying on id(mesh) alone served stale weights
            # after init_params()/fit()/load reassigned self.params.
            cached = getattr(self, "_mesh_params_src", None)
            if (cached is None or cached[0] is not mesh
                    or cached[1] is not decoder_params):
                self._mesh_params = replicate(mesh, decoder_params)
                self._mesh_params_src = (mesh, decoder_params)
            decoder_params = self._mesh_params

        if sample_steps and return_trajectory and \
                sample_steps != cfg.timesteps:
            raise ValueError(
                "return_trajectory assumes the consecutive-timestep index "
                "convention (TrajectoryContainer); run few-step sampling "
                "without trajectory recording")
        run = self._get_compiled_sampler(B, N, return_trajectory, None,
                                         csp=ftypes is not None,
                                         prior=type_prior is not None,
                                         lsys=lsys_ids is not None,
                                         flat=flat is not None)
        ts = strided_sample_ts(cfg.timesteps, sample_steps)
        final, traj = run(decoder_params, batch_natoms, text_embeds,
                          null_embeds, key, cond_scale, step_lr, ts,
                          fixed_types=ftypes, type_prior=type_prior,
                          lattice_sys=lsys_ids,
                          corrector_noise=corrector_noise,
                          fixed_lattice=flat)

        natoms_np = np.asarray(batch0.natoms)
        if return_trajectory:
            tt, tx, tl = traj
            container = TrajectoryContainer.from_scan_output(
                natoms_np, np.asarray(tt), np.asarray(tx), np.asarray(tl),
                total_steps=cfg.timesteps, stride=cfg.trajectory_stride)
            # container[T] is the initial pure-noise state (the documented
            # index convention; reference chemeleon.py:361-368 records it).
            # init_sampler_state is deterministic in `key`, so re-deriving
            # it host-side reproduces exactly what the scan started from.
            state0, _ = init_sampler_state(key, batch0.natoms, N,
                                           fixed_types=ftypes,
                                           lattice_sys=lsys_ids,
                                           fixed_lattice=flat)
            container[cfg.timesteps] = TrajectoryStep(
                natoms=natoms_np,
                atom_types=np.asarray(state0.atom_types),
                frac_coords=np.asarray(state0.frac_coords),
                lattices=np.asarray(state0.lattices))
            return container
        step = TrajectoryStep(natoms=natoms_np,
                              atom_types=np.asarray(final.atom_types),
                              frac_coords=np.asarray(final.frac_coords),
                              lattices=np.asarray(final.lattices))
        return step.get_crystals()

    def warmup(self, batch_sizes: Optional[List[int]] = None,
               buckets: Optional[List[int]] = None,
               stream_chunk: Optional[int] = None,
               sample_steps: Optional[int] = None) -> List[dict]:
        """Precompile sampler programs for a (batch, bucket) grid.

        Every novel shape costs a fresh XLA compile (20-60 s through the TPU
        tunnel); with the persistent compilation cache enabled (it is, by
        default) one warmup run moves that cost out of serving cold-starts
        and first requests. Returns [{batch, bucket, seconds}] per program.
        ``stream_chunk`` additionally warms the chunked streaming program
        used by /predict coalescing."""
        if self.params is None:
            raise RuntimeError("call init_params() or load a checkpoint "
                               "before warmup")
        cfg = self.cfg
        buckets = list(buckets if buckets is not None else cfg.pad_buckets)
        if batch_sizes is None:
            batch_sizes = [2 ** i for i in range(0, 7)]  # 1..64 ladder
        timings = []
        if sample_steps is None:
            sample_steps = cfg.sample_steps
        ts = strided_sample_ts(cfg.timesteps, sample_steps)
        for n in buckets:
            for B in batch_sizes:
                for chunk in ({None, stream_chunk} if stream_chunk
                              else {None}):
                    t0 = time.perf_counter()
                    run = self._get_compiled_sampler(B, n, False, chunk)
                    natoms = jnp.full((B,), n, jnp.int32)
                    text = jnp.zeros((B, max(cfg.text_dim, 1)))
                    tsc = ts if chunk is None else ts[:chunk]
                    run.lower(self.params["decoder"], natoms, text, text,
                              jax.random.PRNGKey(0), 2.0, 1e-5,
                              tsc).compile()
                    timings.append({"batch": B, "bucket": n,
                                    "stream_chunk": chunk,
                                    "seconds": round(
                                        time.perf_counter() - t0, 2)})
        return timings

    def sampler_cost_analysis(self, natoms: List[int],
                              texts: Optional[List[str]] = None,
                              cond_scale: float = 2.0,
                              step_lr: Optional[float] = None,
                              key: Optional[jax.Array] = None,
                              ts_len: Optional[int] = None) -> dict:
        """XLA's own cost analysis (flops, bytes accessed, ...) of the
        compiled whole-sampler program for this batch shape. bench.py divides
        `flops` by measured wall time for a per-bucket achieved-TFLOP/s and
        MFU figure — using the compiler's flop count avoids hand-derived
        analytic estimates drifting from the program XLA actually emits.

        Caveat: XLA cost analysis counts a while/scan BODY once, without
        multiplying by the trip count, on current TPU backends. ``ts_len``
        lets the caller lower a shorter scan (e.g. 1 step) and compare
        against the full program to calibrate that multiplier (bench.py
        `_scan_flops_multiplier`)."""
        step_lr = resolve_step_lr(step_lr, None)
        cfg = self.cfg
        batch0, text_embeds, null_embeds, key = \
            self._prepare_sampling_inputs(natoms, texts, key)
        B, N = batch0.atom_types.shape
        run = self._get_compiled_sampler(B, N, False, None)
        ts = jnp.arange(cfg.timesteps, cfg.timesteps - (ts_len or
                                                        cfg.timesteps), -1)
        lowered = run.lower(self.params["decoder"], batch0.natoms,
                            text_embeds, null_embeds, key, cond_scale,
                            step_lr, ts)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        return dict(ca) if ca else {}

    def sample(self, text_input: Optional[str], n_atoms: int, n_samples: int,
               cond_scale: float = 2.0, step_lr: Optional[float] = None,
               return_trajectory: bool = False, stream: bool = False,
               key: Optional[jax.Array] = None,
               stream_chunk: int = 100,
               sample_steps: Optional[int] = None,
               lattice_system: Optional[str] = None,
               profile: Optional[str] = None):
        """Reference-parity sampling API (chemeleon.py:469-490).
        ``lattice_system`` clamps the lattice to that system's metric
        constraints (sample_batch docstring); honored on both the batch
        and streaming paths. ``profile``/``step_lr`` as in sample_batch
        (default = the "validity" profile, corrector off)."""
        step_lr = resolve_step_lr(step_lr, profile)
        natoms = [n_atoms] * n_samples
        texts = [text_input] * n_samples if text_input is not None else None
        if stream:
            return self._sample_stream(natoms, texts, cond_scale, step_lr,
                                       key, stream_chunk,
                                       sample_steps=sample_steps,
                                       lattice_system=lattice_system)
        result = self.sample_batch(natoms, texts, cond_scale, step_lr, key,
                                   return_trajectory=return_trajectory,
                                   sample_steps=sample_steps,
                                   lattice_system=lattice_system)
        if return_trajectory:
            return result.get_trajectory()
        return result

    def sample_csp(self, composition: str, n_samples: int, z: int = 1,
                   cond_scale: float = 2.0, step_lr: Optional[float] = None,
                   key: Optional[jax.Array] = None,
                   sample_steps: Optional[int] = None,
                   lattice_system: Optional[str] = None,
                   profile: Optional[str] = None):
        """Crystal-structure-prediction sampling: atom types are fixed to
        ``z`` formula units of ``composition``; lattice + coords diffuse.
        Guarantees the exact composition by construction — the task CSPNet
        (DiffCSP) was designed for, exposed as a first-class mode the
        reference's filter-based composition workflow lacks.
        ``lattice_system`` additionally clamps the cell to that system's
        metric constraints — composition AND lattice system both exact.
        ``profile``/``step_lr`` as in sample_batch."""
        step_lr = resolve_step_lr(step_lr, profile)
        from chemeleon_tpu.chem.composition import (
            parse_composition, reduced_composition,
            reduced_formula_alphabetical)

        red = reduced_composition(parse_composition(composition))
        comp = reduced_formula_alphabetical(red)
        from chemeleon_tpu.chem.composition import composition_to_types
        types = composition_to_types(composition, z)
        natoms = [len(types)] * n_samples
        texts = ([comp] * n_samples if self.cfg.text_guide else None)
        return self.sample_batch(natoms, texts, cond_scale, step_lr, key,
                                 fixed_types=[types] * n_samples,
                                 sample_steps=sample_steps,
                                 lattice_system=lattice_system)

    def sample_batch_stream(self, natoms: List[int],
                            texts: Optional[List[str]] = None,
                            cond_scale: float = 2.0,
                            step_lr: Optional[float] = None,
                            key: Optional[jax.Array] = None,
                            stream_chunk: int = 100,
                            fixed_types=None, comp_prior=None,
                            comp_prior_scale: float = 1.0,
                            sample_steps: Optional[int] = None,
                            lattice_system=None,
                            profile: Optional[str] = None):
        """Batched streaming: one compiled chunked scan over a MIXED batch,
        yielding the whole batch's crystals every ``stream_chunk`` steps.
        This is what lets a server coalesce N concurrent streams into one
        device program instead of N serialized scans (the reference scales
        streams with workers_per_device=4 instead, app/server.py:55-58).
        ``fixed_types``/``comp_prior``/``lattice_system`` as in
        sample_batch; ``profile``/``step_lr`` too."""
        step_lr = resolve_step_lr(step_lr, profile)
        return self._sample_stream(natoms, texts, cond_scale, step_lr, key,
                                   stream_chunk, fixed_types=fixed_types,
                                   comp_prior=comp_prior,
                                   comp_prior_scale=comp_prior_scale,
                                   sample_steps=sample_steps,
                                   lattice_system=lattice_system)

    def _sample_stream(self, natoms, texts, cond_scale, step_lr, key,
                       chunk: int, fixed_types=None, comp_prior=None,
                       comp_prior_scale: float = 1.0,
                       sample_steps: Optional[int] = None,
                       lattice_system=None):
        """Generator yielding crystals every ``chunk`` steps via chunked scans
        (the jit-compatible analog of the reference's per-step streaming,
        chemeleon.py:379-467 / app/server.py:22-47). With ``sample_steps``
        the chunks walk the strided (t, s) ladder instead — same yield
        cadence in chunks, ~T/K less compute per stream."""
        cfg = self.cfg
        if sample_steps is None:
            sample_steps = cfg.sample_steps
        ladder = strided_sample_ts(cfg.timesteps, sample_steps)
        total = ladder.shape[0]
        if total % chunk != 0:
            raise ValueError("chunk must divide the number of sampler steps "
                             f"({total})")
        batch0, text_embeds, null_embeds, key = \
            self._prepare_sampling_inputs(natoms, texts, key)
        B, N = batch0.atom_types.shape
        ftypes, type_prior = self._prepare_type_conditioning(
            natoms, B, N, fixed_types, comp_prior, comp_prior_scale)
        lsys_ids = self._prepare_lattice_system(natoms, B, lattice_system)

        run = self._get_compiled_sampler(B, N, False, chunk,
                                         csp=ftypes is not None,
                                         prior=type_prior is not None,
                                         lsys=lsys_ids is not None)
        state, _ = init_sampler_state(key, batch0.natoms, N,
                                      fixed_types=ftypes,
                                      lattice_sys=lsys_ids)
        natoms_np = np.asarray(batch0.natoms)
        for start in range(0, total, chunk):
            ts = ladder[start:start + chunk]
            state, _ = run(self.params["decoder"], batch0.natoms, text_embeds,
                           null_embeds, key, cond_scale, step_lr, ts,
                           state_in=state, fixed_types=ftypes,
                           type_prior=type_prior, lattice_sys=lsys_ids)
            step = TrajectoryStep(natoms=natoms_np,
                                  atom_types=np.asarray(state.atom_types),
                                  frac_coords=np.asarray(state.frac_coords),
                                  lattices=np.asarray(state.lattices))
            yield step.get_crystals()

    # -- checkpoint loading ----------------------------------------------------
    @classmethod
    def load_from_checkpoint(cls, path: str, use_ema: bool = False,
                             **kwargs) -> "Chemeleon":
        """Load either an orbax checkpoint directory produced by the Trainer
        (with meta.json carrying the config) or a reference Lightning .ckpt
        (converted on the fly). Mirrors Lightning's argument-free
        load_from_checkpoint (reference chemeleon.py:113-115).

        ``use_ema=True`` restores the EMA weights a cfg.ema_decay > 0 run
        saved alongside the raw params (errors if the checkpoint has none)."""
        import json
        import os

        if str(path).endswith(".ckpt"):
            if use_ema:
                raise ValueError("reference Lightning checkpoints carry no "
                                 "EMA params (use_ema requires a Trainer "
                                 "checkpoint from an ema_decay > 0 run)")
            from chemeleon_tpu.utils.checkpoints import load_pretrained
            return load_pretrained("general_text", path_ckpt=path, **kwargs)
        import orbax.checkpoint as ocp
        from pathlib import Path as _P
        p = _P(path)
        with open(p / "meta.json") as f:
            meta = json.load(f)
        cfg = ChemeleonConfig.from_dict(meta["config"])
        model = cls(cfg, **kwargs)
        like = model.init_params(jax.random.PRNGKey(0))
        leaf = "params_ema" if use_ema else "params"
        if use_ema and not (p / "params_ema").exists():
            raise FileNotFoundError(
                f"{p} has no params_ema (trained with ema_decay=0?)")
        ckptr = ocp.StandardCheckpointer()
        model.params = ckptr.restore(p.absolute() / leaf, like)
        return model

    @classmethod
    def load_general_text_model(cls, **kwargs) -> "Chemeleon":
        from chemeleon_tpu.utils.checkpoints import load_pretrained
        return load_pretrained("general_text", **kwargs)

    @classmethod
    def load_composition_model(cls, **kwargs) -> "Chemeleon":
        from chemeleon_tpu.utils.checkpoints import load_pretrained
        return load_pretrained("composition", **kwargs)
