"""Fused Pallas edge-aggregation kernel vs the XLA reference path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemeleon_tpu.models.cspnet import CSPNet, sinusoidal_time_embedding
from chemeleon_tpu.ops.pallas.edge_agg import fused_edge_aggregate, supported

H, F = 128, 128  # lane-aligned dims for the kernel


def test_supported_shapes():
    assert supported(16, 512, 768)
    assert not supported(16, 100, 768)   # H not lane-aligned
    assert not supported(16, 512, 100)


@pytest.mark.parametrize("N,B,R", [(8, 3, 2), (16, 2, 1), (24, 2, 2)])
def test_kernel_matches_xla(N, B, R):
    rng = np.random.default_rng(0)
    RB = R * B
    term_i = jnp.asarray(rng.standard_normal((RB, N, H)), dtype=jnp.float32)
    term_j = jnp.asarray(rng.standard_normal((RB, N, H)), dtype=jnp.float32)
    base = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    fourier = jnp.asarray(rng.standard_normal((B, N, N, F)),
                          dtype=jnp.float32)
    natoms = rng.integers(2, N + 1, B)
    mask = np.zeros((B, N), bool)
    for b, n in enumerate(natoms):
        mask[b, :n] = True
    maskf = jnp.asarray(mask, dtype=jnp.float32)
    jmask = maskf / jnp.maximum(maskf.sum(-1, keepdims=True), 1.0)
    w_f = jnp.asarray(rng.standard_normal((F, H)) * 0.05, dtype=jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, H)) * 0.05, dtype=jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(H) * 0.1, dtype=jnp.float32)

    got = fused_edge_aggregate(term_i, term_j, base, fourier, jmask, w_f,
                               w2, b2, interpret=True)

    # XLA reference
    tf = fourier @ w_f                                        # [B,N,N,H]
    e = (term_i.reshape(R, B, N, 1, H) + term_j.reshape(R, B, 1, N, H)
         + base[None, :, None, None, :] + tf[None])
    e = jax.nn.silu(e)
    e2 = jax.nn.silu(e @ w2 + b2)
    want = (e2 * jmask[None, :, None, :, None]).sum(axis=3).reshape(RB, N, H)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cspnet_pallas_matches_xla_interpret():
    """Full CSPNet forward with use_pallas=True (interpret) vs False."""
    net_x = CSPNet(hidden_dim=H, time_dim=16, text_dim=24, num_layers=2,
                   num_freqs=F // 6 if F % 6 == 0 else 21, ln=True)
    # num_freqs must make dis_dim lane-aligned: choose freqs so 6*freqs % 128 == 0
    freqs = 64  # dis_dim = 384 = 3*128
    net_x = CSPNet(hidden_dim=H, time_dim=16, text_dim=24, num_layers=2,
                   num_freqs=freqs, ln=True, use_pallas=False)
    net_p = CSPNet(hidden_dim=H, time_dim=16, text_dim=24, num_layers=2,
                   num_freqs=freqs, ln=True, use_pallas=True)
    rng = np.random.default_rng(1)
    B, N = 2, 8
    types = jnp.asarray(rng.integers(0, 104, (B, N)), dtype=jnp.int32)
    coords = jnp.asarray(rng.uniform(size=(B, N, 3)), dtype=jnp.float32)
    lat = jnp.asarray(rng.standard_normal((B, 3, 3)), dtype=jnp.float32)
    mask = jnp.asarray([[True] * 6 + [False] * 2, [True] * 8])
    temb = sinusoidal_time_embedding(jnp.array([3.0, 9.0]), 16)
    text = jnp.asarray(rng.standard_normal((2, B, 24)), dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    params = net_x.init(key, types, coords, lat, mask, temb, text)
    out_x = net_x.apply(params, types, coords, lat, mask, temb, text)
    out_p = net_p.apply(params, types, coords, lat, mask, temb, text)
    # compare REAL rows only: the kernel skips the i-side pair mask, so
    # padded rows legitimately differ (they are masked downstream)
    m = np.asarray(jnp.tile(mask, (2, 1)))
    np.testing.assert_allclose(np.asarray(out_p.coords_out)[m],
                               np.asarray(out_x.coords_out)[m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.atom_types_out)[m],
                               np.asarray(out_x.atom_types_out)[m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.lattice_out),
                               np.asarray(out_x.lattice_out),
                               rtol=1e-3, atol=1e-4)
