"""Golden parity tests for the diffusion schedules against the reference
implementation (torch), plus intrinsic property checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from chemeleon_tpu.diffusion.schedules import (
    BetaScheduler,
    SigmaScheduler,
    cosine_beta_schedule,
    d_log_p_wrapped_normal,
    linear_beta_schedule,
    p_wrapped_normal,
    prob_mask_like,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
)
from tests.ref_oracle import ref_diff_utils


@pytest.fixture(scope="module")
def ref():
    return ref_diff_utils()


@pytest.mark.parametrize("mode", ["cosine", "linear", "quadratic", "sigmoid"])
def test_beta_schedules_match_reference(ref, mode):
    T = 100
    ours = {
        "cosine": lambda: cosine_beta_schedule(T),
        "linear": lambda: linear_beta_schedule(T, 1e-4, 0.02),
        "quadratic": lambda: quadratic_beta_schedule(T, 1e-4, 0.02),
        "sigmoid": lambda: sigmoid_beta_schedule(T, 1e-4, 0.02),
    }[mode]()
    theirs = {
        "cosine": lambda: ref.cosine_beta_schedule(T),
        "linear": lambda: ref.linear_beta_schedule(T, 1e-4, 0.02),
        "quadratic": lambda: ref.quadratic_beta_schedule(T, 1e-4, 0.02),
        "sigmoid": lambda: ref.sigmoid_beta_schedule(T, 1e-4, 0.02),
    }[mode]().numpy()
    np.testing.assert_allclose(np.asarray(ours, np.float64), theirs,
                               rtol=5e-5, atol=1e-7)


def test_beta_scheduler_tables_match_reference(ref):
    T = 50
    ours = BetaScheduler.create(T, "cosine")
    theirs = ref.BetaScheduler(T, "cosine")
    for name in ["betas", "alphas", "alphas_cumprod", "posterior_mean_coeff1",
                 "posterior_mean_coeff2", "sigmas"]:
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)),
            getattr(theirs, name).numpy(), rtol=2e-4, atol=1e-6,
            err_msg=name)


def test_wrapped_normal_score_matches_reference(ref):
    x = np.linspace(-2, 2, 37, dtype=np.float32)
    sigma = np.full_like(x, 0.3)
    ours = d_log_p_wrapped_normal(jnp.asarray(x), jnp.asarray(sigma))
    theirs = ref.d_log_p_wrapped_normal(torch.tensor(x), torch.tensor(sigma))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)
    ours_p = p_wrapped_normal(jnp.asarray(x), jnp.asarray(sigma))
    theirs_p = ref.p_wrapped_normal(torch.tensor(x), torch.tensor(sigma))
    np.testing.assert_allclose(np.asarray(ours_p), theirs_p.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_sigma_scheduler_ladder_matches_reference(ref):
    T = 50
    ours = SigmaScheduler.create(T)
    theirs = ref.SigmaScheduler(T)
    np.testing.assert_allclose(np.asarray(ours.sigmas), theirs.sigmas.numpy(),
                               rtol=1e-5, atol=1e-7)
    # sigma_norm is Monte-Carlo on both sides (different RNGs) — match
    # loosely; tiny large-sigma entries are pure MC noise, hence the atol.
    np.testing.assert_allclose(np.asarray(ours.sigmas_norm),
                               theirs.sigmas_norm.numpy(), rtol=0.2, atol=1e-3)


def test_wrapped_normal_score_periodicity():
    # the score is periodic with period T=1
    x = jnp.linspace(0.0, 1.0, 11)
    s = jnp.full_like(x, 0.2)
    a = d_log_p_wrapped_normal(x, s)
    b = d_log_p_wrapped_normal(x + 3.0, s)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_prob_mask_like():
    key = jax.random.PRNGKey(0)
    assert prob_mask_like(key, (10,), 1.0).all()
    assert not prob_mask_like(key, (10,), 0.0).any()
    m = prob_mask_like(key, (100000,), 0.3)
    assert 0.28 < float(m.mean()) < 0.32
