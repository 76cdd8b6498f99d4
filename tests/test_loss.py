"""Training-loss tests: finiteness, gradient flow, masking invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import Chemeleon
from chemeleon_tpu.ops.graph import CrystalBatch, batch_from_arrays

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, text_embed_dim=32, pad_buckets=(8,))


@pytest.fixture(scope="module")
def model():
    cfg = get_config(None, **TINY)
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    return m


def make_batch(natoms, n_max=8, seed=0):
    rng = np.random.default_rng(seed)
    types = [rng.integers(1, 104, n) for n in natoms]
    coords = [rng.uniform(size=(n, 3)).astype(np.float32) for n in natoms]
    lats = [np.diag(rng.uniform(3, 6, 3)).astype(np.float32)
            for _ in natoms]
    return batch_from_arrays(types, coords, lats, n_max=n_max)


def test_loss_finite_and_components(model):
    batch = make_batch([5, 8, 3])
    raw = jnp.asarray(model.text_encoder.backend(["a", "b", "c"]))
    loss, metrics = model.loss(model.params, batch, raw, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    for k in ["vb_loss_atom_types", "ce_loss_atom_types", "loss_lattice",
              "loss_coords", "mae_lattice", "mae_coords"]:
        assert np.isfinite(float(metrics[k])), k


def test_gradients_flow_everywhere(model):
    batch = make_batch([5, 8, 3])
    raw = jnp.asarray(model.text_encoder.backend(["a", "b", "c"]))

    def f(params):
        return model.loss(params, batch, raw, jax.random.PRNGKey(1))[0]

    grads = jax.grad(f)(model.params)
    leaves, _ = jax.tree.flatten(grads)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.9, f"{nonzero}/{len(leaves)} grads nonzero"


def test_padding_invariance_of_loss(model):
    """Changing values in padded slots must not change the loss."""
    batch = make_batch([5, 3])
    raw = jnp.asarray(model.text_encoder.backend(["a", "b"]))
    key = jax.random.PRNGKey(2)
    loss1, _ = model.loss(model.params, batch, raw, key)
    batch2 = CrystalBatch(
        atom_types=batch.atom_types.at[0, 6].set(50),
        frac_coords=batch.frac_coords.at[1, 5].set(0.77),
        lattices=batch.lattices,
        natoms=batch.natoms)
    loss2, _ = model.loss(model.params, batch2, raw, key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_loss_jits(model):
    batch = make_batch([5, 8, 3])
    raw = jnp.asarray(model.text_encoder.backend(["a", "b", "c"]))
    jitted = jax.jit(lambda p, b, r, k: model.loss(p, b, r, k)[0])
    v = jitted(model.params, batch, raw, jax.random.PRNGKey(1))
    assert np.isfinite(float(v))


def test_remat_grads_match():
    """Rematerialized CSP layers must give identical loss and gradients."""
    from chemeleon_tpu.config import get_config
    cfg = get_config(None, **TINY)
    cfg_r = cfg.replace(remat=True)
    m = Chemeleon(cfg, text_backend="hash")
    m_r = Chemeleon(cfg_r, text_backend="hash")
    params = m.init_params(jax.random.PRNGKey(0))
    m_r.params = params
    batch = make_batch([5, 3])
    raw = jnp.asarray(m.text_encoder.backend(["a", "b"]))
    key = jax.random.PRNGKey(2)

    l1, g1 = jax.value_and_grad(lambda p: m.loss(p, batch, raw, key)[0])(params)
    l2, g2 = jax.value_and_grad(lambda p: m_r.loss(p, batch, raw, key)[0])(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k1))
