"""CSPNet correctness: dense padded implementation vs an independent
flattened-graph numpy oracle (same math as the reference's PyG version,
written from the spec), plus invariance properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemeleon_tpu.models.cspnet import (
    CSPNet,
    sinusoidal_time_embedding,
    sinusoids_embedding,
)

H, TIME, TEXT, LAYERS, FREQS, C = 32, 16, 24, 2, 4, 104


@pytest.fixture(scope="module")
def net_and_params():
    net = CSPNet(hidden_dim=H, time_dim=TIME, text_dim=TEXT, num_layers=LAYERS,
                 max_atoms=C, num_freqs=FREQS, ln=True, ip=True, smooth=False)
    key = jax.random.PRNGKey(0)
    B, N = 2, 6
    types = jax.random.randint(key, (B, N), 0, C)
    coords = jax.random.uniform(key, (B, N, 3))
    lat = jnp.asarray(np.random.default_rng(0).standard_normal((B, 3, 3)),
                      dtype=jnp.float32)
    mask = jnp.ones((B, N), bool)
    temb = sinusoidal_time_embedding(jnp.array([3.0, 7.0]), TIME)
    text = jnp.asarray(np.random.default_rng(1).standard_normal((B, TEXT)),
                       dtype=jnp.float32)
    params = net.init(key, types, coords, lat, mask, temb, text)
    return net, params


def _np(x):
    return np.asarray(x, dtype=np.float64)


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _gelu(x):  # unused here but kept for other oracles
    from scipy.stats import norm
    return x * norm.cdf(x)


def _layernorm(x, scale, bias, eps=1e-5):  # torch nn.LayerNorm default
    #                                        (reference parity, round 5)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _fourier(xdiff, n_freqs):
    freqs = 2 * np.pi * np.arange(n_freqs)
    emb = xdiff[..., None] * freqs            # [..., 3, F]
    emb = emb.reshape(*xdiff.shape[:-1], 3 * n_freqs)
    return np.concatenate([np.sin(emb), np.cos(emb)], -1)


def oracle_forward(params, types, coords, lat, temb, text):
    """Flattened-graph oracle for ONE graph (no padding), numpy float64."""
    p = params["params"]
    n = len(types)
    emb_tbl = _np(p["node_embedding"]["embedding"])
    h = emb_tbl[types]                                     # [n, H]

    lat_ip = lat @ lat.T
    lat9 = lat_ip.reshape(9)
    cond = np.concatenate([temb, text])                    # [TIME+TEXT]

    fl = p["film_layer"]
    for li in range(LAYERS):
        # FiLM
        ce = _silu(cond @ _np(fl["mlp_cond"]["kernel"]) + _np(fl["mlp_cond"]["bias"]))
        scale, shift = ce[:H], ce[H:]
        x_init = h
        x = h @ _np(fl["proj"]["kernel"]) + _np(fl["proj"]["bias"])
        x = _layernorm(x, _np(fl["norm"]["scale"]), _np(fl["norm"]["bias"]))
        x = x * scale + shift
        h = _silu(x) + x_init

        lp = p[f"csp_layer_{li}"]
        h_in = h
        hn = _layernorm(h, _np(lp["layer_norm"]["scale"]),
                        _np(lp["layer_norm"]["bias"]))
        # all edges incl self-loops
        e1k, e1b = _np(lp["edge_lin1_kernel"]), _np(lp["edge_lin1_bias"])
        e2k, e2b = _np(lp["edge_lin2_kernel"]), _np(lp["edge_lin2_bias"])
        agg = np.zeros((n, H))
        for i in range(n):
            msgs = []
            for j in range(n):
                fd = (coords[j] - coords[i]) % 1.0
                four = _fourier(fd, FREQS)
                inp = np.concatenate([hn[i], hn[j], lat9, four])
                e = _silu(inp @ e1k + e1b)
                e = _silu(e @ e2k + e2b)
                msgs.append(e)
            agg[i] = np.mean(msgs, axis=0)
        n1k, n1b = _np(lp["node_lin1_kernel"]), _np(lp["node_lin1_bias"])
        n2k, n2b = _np(lp["node_lin2"]["kernel"]), _np(lp["node_lin2"]["bias"])
        out = _silu(np.concatenate([hn, agg], -1) @ n1k + n1b)
        out = _silu(out @ n2k + n2b)
        h = h_in + out

    h = _layernorm(h, _np(p["final_layer_norm"]["scale"]),
                   _np(p["final_layer_norm"]["bias"]))
    coord_out = h @ _np(p["coord_out"]["kernel"])
    gfeat = h.mean(0)
    lattice_out = (gfeat @ _np(p["lattice_out"]["kernel"])).reshape(3, 3) @ lat
    type_out = h @ _np(p["type_out"]["kernel"]) + _np(p["type_out"]["bias"])
    return type_out, lattice_out, coord_out


def test_dense_matches_flat_oracle(net_and_params):
    net, params = net_and_params
    rng = np.random.default_rng(42)
    B = 2
    natoms = [4, 6]
    N = 6
    types_np = np.zeros((B, N), np.int32)
    coords_np = np.zeros((B, N, 3), np.float32)
    for b, n in enumerate(natoms):
        types_np[b, :n] = rng.integers(0, C, n)
        coords_np[b, :n] = rng.uniform(size=(n, 3))
    lat_np = rng.standard_normal((B, 3, 3)).astype(np.float32) * 2
    mask = jnp.arange(N)[None, :] < jnp.asarray(natoms)[:, None]
    temb = sinusoidal_time_embedding(jnp.array([5.0, 11.0]), TIME)
    text = rng.standard_normal((B, TEXT)).astype(np.float32)

    out = net.apply(params, jnp.asarray(types_np), jnp.asarray(coords_np),
                    jnp.asarray(lat_np), mask, temb, jnp.asarray(text))

    for b, n in enumerate(natoms):
        t_o, l_o, c_o = oracle_forward(params, types_np[b, :n],
                                       coords_np[b, :n].astype(np.float64),
                                       lat_np[b].astype(np.float64),
                                       np.asarray(temb)[b].astype(np.float64),
                                       text[b].astype(np.float64))
        np.testing.assert_allclose(np.asarray(out.coords_out)[b, :n], c_o,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.lattice_out)[b], l_o,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.atom_types_out)[b, :n], t_o,
                                   rtol=1e-3, atol=1e-4)


def test_permutation_equivariance(net_and_params):
    net, params = net_and_params
    rng = np.random.default_rng(7)
    B, N = 2, 6
    types = jnp.asarray(rng.integers(0, C, (B, N)), dtype=jnp.int32)
    coords = jnp.asarray(rng.uniform(size=(B, N, 3)), dtype=jnp.float32)
    lat = jnp.asarray(rng.standard_normal((B, 3, 3)), dtype=jnp.float32)
    mask = jnp.ones((B, N), bool)
    temb = sinusoidal_time_embedding(jnp.array([2.0, 9.0]), TIME)
    text = jnp.asarray(rng.standard_normal((B, TEXT)), dtype=jnp.float32)

    out = net.apply(params, types, coords, lat, mask, temb, text)
    perm = rng.permutation(N)
    out_p = net.apply(params, types[:, perm], coords[:, perm], lat, mask,
                      temb, text)
    np.testing.assert_allclose(np.asarray(out.coords_out)[:, perm],
                               np.asarray(out_p.coords_out), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.lattice_out),
                               np.asarray(out_p.lattice_out), atol=1e-4)


def test_batch_independence(net_and_params):
    net, params = net_and_params
    rng = np.random.default_rng(8)
    B, N = 3, 5
    types = jnp.asarray(rng.integers(0, C, (B, N)), dtype=jnp.int32)
    coords = jnp.asarray(rng.uniform(size=(B, N, 3)), dtype=jnp.float32)
    lat = jnp.asarray(rng.standard_normal((B, 3, 3)), dtype=jnp.float32)
    mask = jnp.ones((B, N), bool)
    temb = sinusoidal_time_embedding(jnp.array([2.0, 9.0, 4.0]), TIME)
    text = jnp.asarray(rng.standard_normal((B, TEXT)), dtype=jnp.float32)
    out = net.apply(params, types, coords, lat, mask, temb, text)
    # mutate graph 2; graph 0/1 outputs must not change
    types2 = types.at[2].set((types[2] + 1) % C)
    out2 = net.apply(params, types2, coords, lat, mask, temb, text)
    np.testing.assert_array_equal(np.asarray(out.coords_out[:2]),
                                  np.asarray(out2.coords_out[:2]))


def test_time_embedding_matches_transformer_formula():
    t = jnp.array([0.0, 1.0, 100.0])
    emb = np.asarray(sinusoidal_time_embedding(t, 8))
    half = 4
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    want = np.concatenate([np.sin(t[:, None] * freqs),
                           np.cos(t[:, None] * freqs)], -1)
    np.testing.assert_allclose(emb, want, atol=1e-6)


def test_fourier_embedding_order():
    x = jnp.array([[0.25, 0.5, 0.75]])
    emb = np.asarray(sinusoids_embedding(x, 2))
    assert emb.shape == (1, 12)
    freqs = 2 * np.pi * np.arange(2)
    flat = (np.asarray(x)[0][:, None] * freqs).reshape(-1)  # coord-major
    want = np.concatenate([np.sin(flat), np.cos(flat)])
    np.testing.assert_allclose(emb[0], want, atol=1e-6)


def test_param_count_full_size():
    """Full-size model parameter count is stable (config.py:28-42 scale)."""
    net = CSPNet()  # defaults = reference defaults at full scale
    key = jax.random.PRNGKey(0)
    B, N = 1, 4
    params = net.init(key, jnp.zeros((B, N), jnp.int32),
                      jnp.zeros((B, N, 3)), jnp.eye(3)[None],
                      jnp.ones((B, N), bool),
                      sinusoidal_time_embedding(jnp.ones((B,)), 128),
                      jnp.zeros((B, 512)))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    # hand-computed from the reference architecture:
    # embed 104*512; film: (640*1024+1024)+(512*512+512)+2*512
    # per layer: LN 1024 + e1 ((2*512+9+768)*512+512) + e2 (512*512+512)
    #            + n1 (1024*512+512) + n2 (512*512+512)
    # final LN 1024; heads: 512*3 + 512*9 + (512*104+104)
    expected = (104 * 512
                + (640 * 1024 + 1024) + (512 * 512 + 512) + 1024
                + 6 * (1024 + (1801 * 512 + 512) + (512 * 512 + 512)
                       + (1024 * 512 + 512) + (512 * 512 + 512))
                + 1024 + 512 * 3 + 512 * 9 + 512 * 104 + 104)
    assert n_params == expected, (n_params, expected)


def test_knn_edge_style():
    """knn edge path: finite outputs, dual-cond consistency, padding
    invariance, and messages restricted to neighbors within cutoff."""
    net = CSPNet(hidden_dim=H, time_dim=TIME, text_dim=TEXT, num_layers=2,
                 num_freqs=FREQS, edge_style="knn", cutoff=5.0,
                 max_neighbors=6)
    rng = np.random.default_rng(11)
    B, N = 2, 6
    types = jnp.asarray(rng.integers(0, C, (B, N)), dtype=jnp.int32)
    coords = jnp.asarray(rng.uniform(size=(B, N, 3)), dtype=jnp.float32)
    lat = jnp.eye(3)[None].repeat(B, 0) * 4.0
    mask = jnp.asarray([[True] * 4 + [False] * 2, [True] * 6])
    temb = sinusoidal_time_embedding(jnp.array([2.0, 5.0]), TIME)
    text = jnp.asarray(rng.standard_normal((B, TEXT)), dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), types, coords, lat, mask, temb,
                      text)
    out = net.apply(params, types, coords, lat, mask, temb, text)
    assert bool(jnp.isfinite(out.coords_out).all())
    # dual-conditioning first half == single conditional forward
    outR = net.apply(params, types, coords, lat, mask, temb,
                     jnp.stack([text, text * 0], 0))
    np.testing.assert_allclose(np.asarray(outR.coords_out[:B]),
                               np.asarray(out.coords_out), atol=1e-5)
    # padded-node inputs don't affect real outputs
    types2 = types.at[0, 5].set(77)
    out2 = net.apply(params, types2, coords, lat, mask, temb, text)
    np.testing.assert_allclose(np.asarray(out.coords_out[0, :4]),
                               np.asarray(out2.coords_out[0, :4]), atol=1e-6)
