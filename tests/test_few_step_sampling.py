"""Few-step (strided) sampling: D3PM jump posterior, DDIM eta=1 lattice
jump, coarser VE coord ladder (models/chemeleon.py sampler_step ``s`` path,
diffusion/d3pm.py q_posterior_logits_jump).

The reference sampler is strictly one-step (chemeleon.py:305-467,
diff_utils.py:258-329); sample_steps is a framework extension. Invariants
pinned here:
  * the jump posterior at s == t-1 equals the one-step posterior
  * the jump posterior matches a brute-force matrix-product posterior for
    arbitrary jumps (on chain-reachable states)
  * one strided sampler step at s == t-1 matches the legacy step to f32
    tolerance (whole-chain equality is NOT expected: ulp-level lattice
    differences amplify chaotically through 20 network evaluations)
  * ladders start at T, end with s == 0, and are strictly descending
  * end-to-end few-step sampling produces in-range crystals, streams match
    batches, and trajectory recording rejects the strided path
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemeleon_tpu.config import get_config
from chemeleon_tpu.diffusion.d3pm import D3PM
from chemeleon_tpu.diffusion.schedules import BetaScheduler
from chemeleon_tpu.models.chemeleon import (Chemeleon, init_sampler_state,
                                            sampler_step, strided_sample_ts)

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, text_embed_dim=32,
            pad_buckets=(8,))


@pytest.fixture(scope="module")
def model():
    cfg = get_config(None, **TINY)
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    return m


@pytest.fixture(scope="module")
def d3pm():
    bs = BetaScheduler.create(50)
    return D3PM.create(bs, 50, 8, 0.01)


def test_jump_posterior_matches_one_step(d3pm):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.randint(key, (4, 6), 0, 8)
    xt = jax.random.randint(jax.random.fold_in(key, 1), (4, 6), 0, 8)
    for t in [1, 2, 7, 25, 50]:
        tt = jnp.full(x0.shape, t, jnp.int32)
        p1 = jax.nn.softmax(d3pm.q_posterior_logits(x0, xt, tt), -1)
        p2 = jax.nn.softmax(
            d3pm.q_posterior_logits_jump(x0, xt, tt, tt - 1), -1)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=1e-5)


def test_jump_posterior_matches_brute_force(d3pm):
    """q(x_s | x_t, x_0) ∝ Q_{s->t}[x_s, x_t] * Q̄_s[x_0, x_s] with the
    transition computed by explicit one-step matrix products. Only
    chain-reachable (x_0, x_t) pairs — an absorbing chain allows
    x_t ∈ {x_0, 0}."""
    q1 = np.asarray(d3pm.q_one_step_mats, np.float64)
    qm = np.asarray(d3pm.q_mats, np.float64)
    for (t, s) in [(50, 25), (30, 7), (10, 1), (7, 3), (5, 0)]:
        for x0v, xtv in [(3, 3), (3, 0)]:
            if s == 0:
                expect = np.eye(8)[x0v]
            else:
                Qst = np.eye(8)
                for k in range(s, t):
                    Qst = Qst @ q1[k]
                p = Qst[:, xtv] * qm[s - 1][x0v]
                expect = p / p.sum()
            tt = jnp.full((1,), t, jnp.int32)
            ss = jnp.full((1,), s, jnp.int32)
            got = jax.nn.softmax(d3pm.q_posterior_logits_jump(
                jnp.array([x0v]), jnp.array([xtv]), tt, ss), -1)[0]
            # atol dominated by the eps=1e-6 logit smoothing (present in
            # the reference one-step posterior too), which perturbs small
            # probabilities by ~eps/p_min at long jumps
            np.testing.assert_allclose(np.asarray(got), expect, atol=1e-3)


def test_p_logits_jump_deterministic_at_s0(d3pm):
    """At s == 0 the gumbel noise is zeroed: the sample is the argmax of the
    predicted x_0 logits (mirrors p_logits at t == 1)."""
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (2, 5, 8))
    xt = jax.random.randint(jax.random.fold_in(key, 1), (2, 5), 0, 8)
    noise = jax.random.uniform(jax.random.fold_in(key, 2), (2, 5, 8))
    t = jnp.full((2, 5), 9, jnp.int32)
    s = jnp.zeros((2, 5), jnp.int32)
    out = d3pm.p_logits_jump(logits, xt, t, s, noise)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_single_strided_step_matches_legacy(model):
    """One strided step at s = t-1 == one legacy step (same noise): the DDIM
    eta=1 lattice mean/variance reduce algebraically to the DDPM ancestral
    step because sched.beta.sigmas is the posterior std."""
    cfg = model.cfg
    key = jax.random.PRNGKey(42)
    b0, te, ne, k2 = model._prepare_sampling_inputs(
        [5, 6], ["TiO2", "NaCl"], key)
    state, mask = init_sampler_state(k2, b0.natoms, 8)
    for t in [20, 13, 7, 2, 1]:
        a = sampler_step(model.params["decoder"], model.decoder, model.sched,
                         cfg, state, jnp.int32(t), mask, te, ne, k2,
                         2.0, 1e-5)
        b = sampler_step(model.params["decoder"], model.decoder, model.sched,
                         cfg, state, jnp.int32(t), mask, te, ne, k2,
                         2.0, 1e-5, s=jnp.int32(t - 1))
        assert (a.atom_types == b.atom_types).all(), f"types differ at t={t}"
        np.testing.assert_allclose(np.asarray(a.lattices),
                                   np.asarray(b.lattices), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.frac_coords),
                                   np.asarray(b.frac_coords), atol=1e-5)


def test_strided_sample_ts_ladder():
    full = strided_sample_ts(20, 0)
    assert full.shape == (20,) and int(full[0]) == 20 and int(full[-1]) == 1
    assert strided_sample_ts(20, 20).shape == (20,)  # K == T: legacy path

    pairs = strided_sample_ts(1000, 50)
    assert pairs.shape == (50, 2)
    ts, ss = np.asarray(pairs[:, 0]), np.asarray(pairs[:, 1])
    assert ts[0] == 1000 and ts[-1] == 1 and ss[-1] == 0
    assert (np.diff(ts) < 0).all()           # strictly descending
    np.testing.assert_array_equal(ss[:-1], ts[1:])  # s chains to next t

    one = strided_sample_ts(1000, 1)
    np.testing.assert_array_equal(np.asarray(one), [[1000, 0]])

    with pytest.raises(ValueError):
        strided_sample_ts(20, 21)


def test_few_step_sampling_end_to_end(model):
    key = jax.random.PRNGKey(11)
    crystals = model.sample_batch([5, 6], ["TiO2", "NaCl"], key=key,
                                  sample_steps=5)
    assert len(crystals) == 2
    for c in crystals:
        assert np.isfinite(c.lattice).all()
        assert ((c.frac_coords >= 0) & (c.frac_coords < 1)).all()
        assert ((c.atom_types >= 0) & (c.atom_types <= 103)).all()
    # deterministic under the same key
    again = model.sample_batch([5, 6], ["TiO2", "NaCl"], key=key,
                               sample_steps=5)
    for a, b in zip(crystals, again):
        np.testing.assert_array_equal(a.atom_types, b.atom_types)
        np.testing.assert_allclose(a.frac_coords, b.frac_coords)


def test_few_step_stream_matches_batch(model):
    key = jax.random.PRNGKey(13)
    outs = list(model.sample_batch_stream([5, 6], ["TiO2", "NaCl"], key=key,
                                          stream_chunk=5, sample_steps=10))
    assert len(outs) == 2  # 10 strided steps / chunk 5
    batch = model.sample_batch([5, 6], ["TiO2", "NaCl"], key=key,
                               sample_steps=10)
    for a, b in zip(outs[-1], batch):
        np.testing.assert_array_equal(a.atom_types, b.atom_types)
        np.testing.assert_allclose(a.frac_coords, b.frac_coords, atol=1e-6)


def test_few_step_csp_mode(model):
    """CSP clamp composes with the strided path: types stay fixed."""
    crystals = model.sample_csp("TiO2", n_samples=2, z=2,
                                key=jax.random.PRNGKey(5))
    want = sorted(c for c in crystals[0].atom_types)
    few = model.sample_batch([6, 6], ["TiO2", "TiO2"],
                             key=jax.random.PRNGKey(5),
                             fixed_types=[[8, 8, 8, 8, 22, 22]] * 2,
                             sample_steps=4)
    for c in few:
        assert sorted(c.atom_types.tolist()) == [8, 8, 8, 8, 22, 22]
    assert want  # silence unused warning if sample_csp shapes change


def test_trajectory_rejects_few_steps(model):
    with pytest.raises(ValueError, match="trajectory"):
        model.sample_batch([5], ["TiO2"], key=jax.random.PRNGKey(1),
                           return_trajectory=True, sample_steps=5)
