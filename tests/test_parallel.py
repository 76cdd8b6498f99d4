"""Multi-device tests on the virtual 8-device CPU mesh: DP+TP train step,
sharded CLIP contrastive loss (GSPMD all-gather), sharding invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import Chemeleon
from chemeleon_tpu.ops.graph import batch_from_arrays
from chemeleon_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_params,
)
from chemeleon_tpu.train.optim import build_optimizer
from chemeleon_tpu.train.step import make_train_step

TINY = dict(hidden_dim=64, time_dim=16, text_dim=32, num_layers=2,
            num_freqs=8, timesteps=20, text_embed_dim=64, pad_buckets=(8,))


def _make_batch(B, seed=0):
    rng = np.random.default_rng(seed)
    natoms = rng.integers(4, 9, B)
    return batch_from_arrays(
        [rng.integers(1, 104, n) for n in natoms],
        [rng.uniform(size=(n, 3)).astype(np.float32) for n in natoms],
        [np.diag(rng.uniform(3, 6, 3)).astype(np.float32) for _ in natoms],
        n_max=8)


def _shard_data(mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))), tree)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_train_step_on_mesh(eight_devices, shape):
    mesh = make_mesh(shape, devices=eight_devices)
    cfg = get_config(None, mesh_shape=shape, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    params = shard_params(mesh, model.init_params(jax.random.PRNGKey(0)))
    tx = build_optimizer(cfg)
    opt_state = tx.init(params)
    B = shape[0] * 2
    batch = _shard_data(mesh, _make_batch(B))
    raw = _shard_data(mesh, jnp.asarray(
        model.text_encoder.backend([f"t{i}" for i in range(B)])))
    step = make_train_step(model, tx, mesh=mesh)
    with mesh:
        params, opt_state, metrics = step(params, opt_state, batch, raw,
                                          jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_tp_params_are_actually_sharded(eight_devices):
    mesh = make_mesh((4, 2), devices=eight_devices)
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    params = shard_params(mesh, model.init_params(jax.random.PRNGKey(0)))
    k = params["decoder"]["params"]["csp_layer_0"]["edge_lin1_kernel"]
    # column-sharded over the model axis: each shard holds H/2 columns
    assert len(k.sharding.device_set) == 8
    shard_shape = k.sharding.shard_shape(k.shape)
    assert shard_shape[-1] == k.shape[-1] // 2


def test_sharded_loss_matches_single_device(eight_devices):
    """DP-sharded loss must equal the unsharded loss (same global batch)."""
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _make_batch(8)
    raw = jnp.asarray(model.text_encoder.backend(
        [f"t{i}" for i in range(8)]))
    key = jax.random.PRNGKey(3)
    loss_single, _ = model.loss(params, batch, raw, key)

    mesh = make_mesh((8, 1), devices=eight_devices)
    params_s = replicate(mesh, params)
    batch_s = _shard_data(mesh, batch)
    raw_s = _shard_data(mesh, raw)
    with mesh:
        loss_sharded, _ = jax.jit(model.loss)(params_s, batch_s, raw_s, key)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=1e-5)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_tp_loss_matches_single_device(eight_devices, shape):
    """Tensor-parallel (column-sharded decoder kernels) loss must equal the
    unsharded loss — proves the TP decomposition is numerically a no-op, not
    just that shards are placed (round-1 gap)."""
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _make_batch(8)
    raw = jnp.asarray(model.text_encoder.backend(
        [f"t{i}" for i in range(8)]))
    key = jax.random.PRNGKey(3)
    loss_single, _ = model.loss(params, batch, raw, key)

    mesh = make_mesh(shape, devices=eight_devices)
    params_s = shard_params(mesh, params)  # real TP placement
    batch_s = _shard_data(mesh, batch)
    raw_s = _shard_data(mesh, raw)
    with mesh:
        loss_tp, _ = jax.jit(model.loss)(params_s, batch_s, raw_s, key)
    np.testing.assert_allclose(float(loss_single), float(loss_tp), rtol=2e-5)


def test_tp_train_step_matches_single_device(eight_devices):
    """One full TP train step (grads through the TP collectives + optimizer
    update) must reproduce the single-device updated params."""
    # sgd: the update is linear in the gradient, so cross-sharding equality
    # is a clean test (adam's g/(sqrt(v)+eps) amplifies reduction-order
    # noise on near-zero gradient entries)
    cfg = get_config(None, mesh_shape=(4, 2), optimizer="sgd", **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    params = model.init_params(jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)
    batch = _make_batch(8)
    raw = jnp.asarray(model.text_encoder.backend(
        [f"t{i}" for i in range(8)]))
    key = jax.random.PRNGKey(7)

    step_single = make_train_step(model, tx, mesh=None)
    p1, _, m1 = step_single(jax.tree.map(jnp.copy, params), tx.init(params),
                            batch, raw, key)

    mesh = make_mesh((4, 2), devices=eight_devices)
    params_s = shard_params(mesh, params)
    opt_state_s = tx.init(params_s)
    step_mesh = make_train_step(model, tx, mesh=mesh)
    with mesh:
        p2, _, m2 = step_mesh(params_s, opt_state_s,
                              _shard_data(mesh, batch),
                              _shard_data(mesh, raw), key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    flat1, flat2 = jax.tree.leaves(p1), jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_clip_global_batch_contrastive_sharded(eight_devices):
    """The CLIP similarity matrix spans the GLOBAL batch under sharding
    (GSPMD inserts the all-gather the reference does by hand,
    crystal_clip.py:125-130)."""
    from chemeleon_tpu.models.clip import CrystalClip
    cfg = get_config("clip_prompt", clip_dim=16, **TINY)
    clip = CrystalClip(cfg, text_backend="hash")
    params = clip.init_params(jax.random.PRNGKey(0))
    batch = _make_batch(8)
    raw = jnp.asarray(clip.hash_backend([f"t{i}" for i in range(8)]))
    loss_single = clip.loss(params, batch, raw)

    mesh = make_mesh((8, 1), devices=eight_devices)
    params_s = replicate(mesh, params)
    batch_s = _shard_data(mesh, batch)
    raw_s = _shard_data(mesh, raw)
    with mesh:
        loss_sharded = jax.jit(clip.loss)(params_s, batch_s, raw_s)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=1e-5)


def test_dryrun_multichip_entrypoint(eight_devices):
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_sample_batch_mesh_api(eight_devices):
    """The one-argument multi-chip path: sample_batch(..., mesh=) must
    reproduce the single-device result exactly."""
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(11)
    single = model.sample_batch([6] * 8, ["TiO2"] * 8, key=key)

    mesh = make_mesh((8, 1), devices=eight_devices)
    with mesh:
        sharded = model.sample_batch([6] * 8, ["TiO2"] * 8, key=key,
                                     mesh=mesh)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.atom_types, b.atom_types)
        np.testing.assert_allclose(a.frac_coords, b.frac_coords, atol=1e-6)

    with pytest.raises(AssertionError):
        model.sample_batch([6] * 3, ["TiO2"] * 3, mesh=mesh)  # 3 % 8 != 0


def test_sharded_sampling_matches_single_device(eight_devices):
    """Sampling with data-sharded inputs over the mesh must reproduce the
    single-device result exactly (serving scale-out: one program, batch
    sharded over chips)."""
    import jax.numpy as jnp
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    # pin step_lr to the raw run() call's literal below (the default is the
    # validity profile since round 5; this test compares mechanisms, so
    # both legs must take the same trajectory)
    single = model.sample_batch([6] * 8, ["TiO2"] * 8, key=key,
                                step_lr=1e-5)

    mesh = make_mesh((8, 1), devices=eight_devices)
    run = model._get_compiled_sampler(8, 8, False, None)
    batch_shard = NamedSharding(mesh, P(DATA_AXIS))
    natoms = jax.device_put(jnp.full((8,), 6, jnp.int32), batch_shard)
    text, null = model.text_encoder.embed_cond_and_null(
        model.params["text"], ["TiO2"] * 8)
    text = jax.device_put(text, NamedSharding(mesh, P(DATA_AXIS, None)))
    null = jax.device_put(null, NamedSharding(mesh, P(DATA_AXIS, None)))
    params = replicate(mesh, model.params["decoder"])
    ts = jnp.arange(cfg.timesteps, 0, -1)
    with mesh:
        final, _ = run(params, natoms, text, null, key, 2.0, 1e-5, ts)
    types = np.asarray(final.atom_types)
    coords = np.asarray(final.frac_coords)
    for i, c in enumerate(single):
        np.testing.assert_array_equal(types[i, :6], c.atom_types)
        np.testing.assert_allclose(coords[i, :6] % 1.0, c.frac_coords,
                                   atol=1e-6)


def test_mesh_sampling_uses_current_params(eight_devices):
    """The replicated-params cache must refresh when model params change
    (regression: keying on id(mesh) alone served STALE weights after
    init_params/fit/load reassigned model.params)."""
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh((8, 1), devices=eight_devices)
    key = jax.random.PRNGKey(7)
    with mesh:
        model.sample_batch([6] * 8, ["TiO2"] * 8, key=key, mesh=mesh)

    model.init_params(jax.random.PRNGKey(42))  # new weights, same mesh
    single = model.sample_batch([6] * 8, ["TiO2"] * 8, key=key)
    with mesh:
        sharded = model.sample_batch([6] * 8, ["TiO2"] * 8, key=key,
                                     mesh=mesh)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.atom_types, b.atom_types)
        # stale weights would differ at O(0.1); 5e-6 allows the CPU virtual
        # mesh's fusion-order float noise (sharded vs single compile to
        # different partitioned programs; measured up to ~2e-6)
        np.testing.assert_allclose(a.frac_coords, b.frac_coords, atol=5e-6)
