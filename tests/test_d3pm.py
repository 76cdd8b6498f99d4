"""Golden parity tests for D3PM against the reference (torch), plus intrinsic
property checks on dense padded inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from chemeleon_tpu.diffusion.d3pm import D3PM
from chemeleon_tpu.diffusion.schedules import BetaScheduler
from tests.ref_oracle import ref_diff_utils

T, C = 40, 16


@pytest.fixture(scope="module")
def pair():
    ref = ref_diff_utils()
    ours_beta = BetaScheduler.create(T, "cosine")
    ours = D3PM.create(ours_beta, T, C, 1.0)
    theirs = ref.D3PM(ref.BetaScheduler(T, "cosine"), T, C, 1.0)
    return ours, theirs


def test_transition_matrices_match(pair):
    ours, theirs = pair
    np.testing.assert_allclose(np.asarray(ours.q_one_step_mats),
                               theirs.q_one_step_mats.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.q_mats), theirs.q_mats.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_q_sample_matches_reference_with_same_noise(pair):
    ours, theirs = pair
    rng = np.random.default_rng(0)
    x0 = rng.integers(1, C, size=(6, 5))
    t = rng.integers(1, T + 1, size=(6, 1))
    noise = rng.uniform(size=(6, 5, C)).astype(np.float32)
    got = ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    # reference operates on flat node lists; flatten to its shape convention
    want = theirs.q_sample(torch.tensor(x0.reshape(-1)),
                           torch.tensor(np.broadcast_to(t, (6, 5)).reshape(-1)),
                           torch.tensor(noise.reshape(-1, C)))
    np.testing.assert_array_equal(np.asarray(got).reshape(-1), want.numpy())


def test_q_posterior_logits_match_reference(pair):
    ours, theirs = pair
    rng = np.random.default_rng(1)
    x0 = rng.integers(0, C, size=(24,))
    xt = rng.integers(0, C, size=(24,))
    t = rng.integers(1, T + 1, size=(24,))
    got = ours.q_posterior_logits(jnp.asarray(x0), jnp.asarray(xt),
                                  jnp.asarray(t))
    want = theirs.q_posterior_logits(torch.tensor(x0), torch.tensor(xt),
                                     torch.tensor(t))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_p_logits_match_reference_with_same_noise(pair):
    ours, theirs = pair
    rng = np.random.default_rng(2)
    B = 30
    pred_logits = rng.standard_normal((B, C)).astype(np.float32)
    xt = rng.integers(0, C, size=(B,))
    t = rng.integers(1, T + 1, size=(B,))
    noise = rng.uniform(size=(B, C)).astype(np.float32)
    got = ours.p_logits(jnp.asarray(pred_logits), jnp.asarray(xt),
                        jnp.asarray(t), jnp.asarray(noise))
    want = theirs.p_logits(torch.tensor(pred_logits), torch.tensor(xt),
                           torch.tensor(t), torch.tensor(noise))
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_categorical_kl_matches_reference(pair):
    ours, theirs = pair
    rng = np.random.default_rng(3)
    l1 = rng.standard_normal((10, C)).astype(np.float32)
    l2 = rng.standard_normal((10, C)).astype(np.float32)
    got = ours.categorical_kl_logits(jnp.asarray(l1), jnp.asarray(l2))
    want = theirs.categorical_kl_logits(torch.tensor(l1), torch.tensor(l2))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_absorbing_at_large_t(pair):
    ours, _ = pair
    key = jax.random.PRNGKey(0)
    x0 = jax.random.randint(key, (8, 6), 1, C)
    xt = ours.q_sample_key(key, x0, jnp.full((8, 1), T))
    # cosine schedule: alphas_cumprod ~ 0 at t=T -> fully absorbed
    assert float((xt == 0).mean()) > 0.95


def test_t1_is_deterministic_argmax(pair):
    ours, _ = pair
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((5, C)).astype(np.float32)
    xt = rng.integers(0, C, size=(5,))
    out = ours.p_logits(jnp.asarray(logits), jnp.asarray(xt),
                        jnp.ones((5,), jnp.int32),
                        jnp.asarray(rng.uniform(size=(5, C)), dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(out), logits.argmax(-1))


def test_masked_kl():
    beta = BetaScheduler.create(T, "cosine")
    d3 = D3PM.create(beta, T, C, 1.0)
    rng = np.random.default_rng(5)
    l1 = jnp.asarray(rng.standard_normal((2, 4, C)), dtype=jnp.float32)
    l2 = jnp.asarray(rng.standard_normal((2, 4, C)), dtype=jnp.float32)
    mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]], bool)
    full = d3.categorical_kl_logits(l1, l2)
    masked = d3.categorical_kl_logits(l1, l2, mask=mask)
    # masked result equals mean over only the 6 real positions
    kl = (jax.nn.softmax(l1 + 1e-6, -1)
          * (jax.nn.log_softmax(l1 + 1e-6, -1)
             - jax.nn.log_softmax(l2 + 1e-6, -1))).sum(-1)
    want = float((np.asarray(kl) * np.asarray(mask)).sum() / 6)
    np.testing.assert_allclose(float(masked), want, rtol=1e-6)
    assert abs(float(full) - want) > 1e-8  # they differ in general
