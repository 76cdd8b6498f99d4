"""Sampling-profile tests (round-5 VERDICT item 6): the deployed default is
the "validity" profile (Langevin corrector off — measured +5-6 pts raw
validity, results/step_lr_sweep.json), with "reference" opting back into
upstream step_lr=1e-5 parity (reference chemeleon.py:452-462)."""

import jax
import numpy as np
import pytest

from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import (
    DEFAULT_PROFILE,
    SAMPLING_PROFILES,
    Chemeleon,
    resolve_step_lr,
)

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, text_embed_dim=32,
            pad_buckets=(8,))


@pytest.fixture(scope="module")
def model():
    cfg = get_config(None, **TINY)
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_resolution_order():
    assert DEFAULT_PROFILE == "validity"
    assert resolve_step_lr(None, None) == 0.0
    assert resolve_step_lr(None, "validity") == 0.0
    assert resolve_step_lr(None, "reference") == 1e-5
    # explicit step_lr always wins, even over a profile
    assert resolve_step_lr(3e-6, "reference") == 3e-6
    assert resolve_step_lr(0.0, "reference") == 0.0


def test_unknown_profile_raises():
    with pytest.raises(ValueError, match="unknown sampling profile"):
        resolve_step_lr(None, "fastest")


def test_profiles_registry_matches_reference_default():
    # the parity profile must stay at the reference's hard-coded value
    assert SAMPLING_PROFILES["reference"]["step_lr"] == pytest.approx(1e-5)
    assert SAMPLING_PROFILES["validity"]["step_lr"] == 0.0


def test_default_equals_explicit_corrector_off(model):
    """sample_batch() with no corrector args == step_lr=0.0 bitwise."""
    key = jax.random.PRNGKey(11)
    a = model.sample_batch([4, 4], ["TiO2", "TiO2"], key=key)
    b = model.sample_batch([4, 4], ["TiO2", "TiO2"], key=key, step_lr=0.0)
    for ca, cb in zip(a, b):
        np.testing.assert_array_equal(ca.atom_types, cb.atom_types)
        np.testing.assert_array_equal(ca.frac_coords, cb.frac_coords)
        np.testing.assert_array_equal(ca.lattice, cb.lattice)


def test_reference_profile_equals_upstream_step_lr(model):
    """profile="reference" == explicit step_lr=1e-5 bitwise, and differs
    from the validity default (the corrector injects noise)."""
    key = jax.random.PRNGKey(12)
    ref = model.sample_batch([4], ["TiO2"], key=key, profile="reference")
    exp = model.sample_batch([4], ["TiO2"], key=key, step_lr=1e-5)
    val = model.sample_batch([4], ["TiO2"], key=key)
    np.testing.assert_array_equal(ref[0].frac_coords, exp[0].frac_coords)
    np.testing.assert_array_equal(ref[0].lattice, exp[0].lattice)
    assert not np.allclose(ref[0].frac_coords, val[0].frac_coords)


def test_profile_reaches_csp_and_stream(model):
    """profile= propagates through sample_csp and the streaming path (the
    stream path resolves before _sample_stream, so reference != validity)."""
    key = jax.random.PRNGKey(13)
    a = model.sample_csp("TiO2", n_samples=2, key=key, profile="reference")
    b = model.sample_csp("TiO2", n_samples=2, key=key, step_lr=1e-5)
    np.testing.assert_array_equal(a[0].frac_coords, b[0].frac_coords)

    sa = list(model.sample_batch_stream([4], ["TiO2"], key=key,
                                        stream_chunk=5,
                                        profile="reference"))[-1]
    sb = list(model.sample_batch_stream([4], ["TiO2"], key=key,
                                        stream_chunk=5, step_lr=1e-5))[-1]
    np.testing.assert_array_equal(sa[0].frac_coords, sb[0].frac_coords)


def test_server_profile_knob():
    """ChemeleonServer stores the deployment-wide profile (default
    validity) without touching the network stack."""
    from chemeleon_tpu.serve.server import ChemeleonServer

    cfg = get_config(None, **TINY)
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    s = ChemeleonServer(model=m, port=0)
    assert s.profile == "validity"
    s2 = ChemeleonServer(model=m, port=0, profile="reference")
    assert s2.profile == "reference"
