"""Independent verification of the sampler update equations.

Re-derives the reference's predictor–corrector step (reference
chemeleon.py:379-467) in this test — D3PM ancestral types step, DDPM lattice
step with c0/c1 coefficients and the t=T clip, VE coords half-step, Langevin
corrector — and replays the whole reverse process step by step outside
lax.scan, with the same key derivation. Catches schedule-index or wiring
mistakes that per-op golden tests cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import (
    MASK_LATTICE_MATRIX,
    Chemeleon,
    init_sampler_state,
    model_predictions,
)
from chemeleon_tpu.models.cspnet import sinusoidal_time_embedding

TINY = dict(hidden_dim=16, time_dim=8, text_dim=12, num_layers=1,
            num_freqs=2, timesteps=6, text_embed_dim=16, pad_buckets=(4,))


def manual_reverse_process(model, natoms, text_embeds, null_embeds, key,
                           cond_scale, step_lr):
    """Hand-rolled reverse process following the reference equations."""
    cfg = model.cfg
    sched = model.sched
    B = len(natoms)
    N = cfg.pad_buckets[0]
    T = cfg.timesteps
    lmask = jnp.asarray(MASK_LATTICE_MATRIX)

    state, mask = init_sampler_state(key, jnp.asarray(natoms), N)
    a, l, x = state.atom_types, state.lattices, state.frac_coords
    key = jax.random.fold_in(key, 1)  # matches the compiled path

    for t in range(T, 0, -1):
        kt = jax.random.fold_in(key, t)
        k_a, k_l, k_x1, k_x2 = jax.random.split(kt, 4)
        nz = 1.0 if t > 1 else 0.0
        temb = sinusoidal_time_embedding(jnp.full((B,), t), cfg.time_dim)

        pred_a, pred_l, pred_x = model_predictions(
            model.params["decoder"], model.decoder, temb, a, x, l, mask,
            cond_scale, text_embeds, null_embeds)

        # --- atom types: q_posterior of predicted x0 + gumbel (ref :399-411)
        noise_a = jnp.clip(jax.random.uniform(k_a, (B, N, cfg.max_atoms)),
                           1e-6, 1.0)
        t_bn = jnp.full((B, N), t, jnp.int32)
        fact1 = sched.d3pm.q_one_step_transposed[t - 1, a, :]
        soft = jax.nn.softmax(pred_a, axis=-1)
        qm2 = sched.d3pm.q_mats[max(t - 2, 0)]
        fact2 = jnp.einsum("bnc,cd->bnd", soft, qm2)
        post = jnp.log(fact1 + 1e-6) + jnp.log(fact2 + 1e-6)
        post = jnp.where(t == 1, pred_a, post)
        gumbel = -jnp.log(-jnp.log(noise_a))
        a_next = jnp.argmax(post + gumbel * nz, axis=-1)
        a_next = jnp.where(mask, a_next, 0)

        # --- lattice: DDPM ancestral (ref :412-425)
        alpha = sched.beta.alphas[t]
        acp = sched.beta.alphas_cumprod[t]
        sig = sched.beta.sigmas[t]
        c0 = 1.0 / jnp.sqrt(alpha)
        c1 = (1.0 - alpha) / jnp.sqrt(1.0 - acp)
        rand_l = jax.random.normal(k_l, (B, 3, 3)) * nz * lmask
        l_next = (c0 * (l - c1 * pred_l) + sig * rand_l) * lmask
        if t == T:
            l_next = jnp.clip(l_next, -6.0, 6.0)

        # --- coords half-step: VE ancestral (ref :426-437)
        sx = sched.sigma.sigmas[t]
        sn = sched.sigma.sigmas_norm[t]
        adj = sched.sigma.sigmas[t - 1]
        step_size = sx ** 2 - adj ** 2
        std_x = jnp.sqrt(adj ** 2 * (sx ** 2 - adj ** 2) / sx ** 2)
        rand_x = jax.random.normal(k_x1, (B, N, 3)) * nz
        x_half = x - step_size * pred_x * jnp.sqrt(sn) + std_x * rand_x

        # --- corrector: Langevin on coords (ref :439-457)
        _, _, pred_x2 = model_predictions(
            model.params["decoder"], model.decoder, temb, a_next, x_half,
            l_next, mask, cond_scale, text_embeds, null_embeds)
        step2 = step_lr * (sx / sched.sigma.sigma_begin) ** 2
        std2 = jnp.sqrt(2.0 * step2)
        rand_x2 = jax.random.normal(k_x2, (B, N, 3)) * nz
        x_next = x_half - step2 * pred_x2 * jnp.sqrt(sn) + std2 * rand_x2

        a, l, x = a_next, l_next, x_next % 1.0
    return a, l, x


def test_scan_sampler_matches_manual_reverse_process():
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    natoms = [3, 4]
    texts = ["TiO2", "NaCl"]

    crystals = model.sample_batch(natoms, texts, cond_scale=2.0,
                                  step_lr=1e-5, key=key)

    text_embeds, null_embeds = model.text_encoder.embed_cond_and_null(
        model.params["text"], texts)
    a, l, x = manual_reverse_process(model, natoms, text_embeds, null_embeds,
                                     key, 2.0, 1e-5)
    a, l, x = np.asarray(a), np.asarray(l), np.asarray(x)
    for i, c in enumerate(crystals):
        n = natoms[i]
        types = a[i, :n].copy()
        types[(types < 0) | (types > 103)] = 0
        order = np.argsort(types, kind="stable")
        np.testing.assert_array_equal(c.atom_types, types[order])
        np.testing.assert_allclose(c.frac_coords, (x[i, :n] % 1.0)[order],
                                   atol=1e-6)
        # f32 + jit fusion differences; untrained lattices reach O(100)
        np.testing.assert_allclose(c.lattice, l[i], rtol=1e-4, atol=1e-4)
