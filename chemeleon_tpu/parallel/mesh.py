"""Device mesh + sharding rules.

The TPU-native replacement for the reference's Lightning DDP/NCCL stack
(reference run.py:78-90, SURVEY §2.7): a (data, model) mesh; batches sharded
on the data axis (gradients all-reduced by XLA over ICI), large decoder
kernels optionally sharded on the model axis (tensor parallelism). No
explicit collectives are written — GSPMD inserts psum/all-gather from the
sharding annotations.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    dp, tp = shape
    if dp * tp != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Batches shard their leading dim over the data axis."""
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def shard_batch_tree(mesh: Mesh, tree: Any) -> Any:
    """Place every array in a pytree with its leading axis on the data axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))), tree)


def param_spec(path: Tuple, leaf: jax.Array, tp: int) -> P:
    """Tensor-parallel sharding rule for decoder params.

    Every 2-D kernel/table whose output dim divides the model axis is
    sharded column-wise — including the atom-type embedding table, whose
    column-sharded lookup output is already laid out like the column-sharded
    Dense kernels that consume it. Everything else (biases, LayerNorm
    scales) is replicated. The CSPNet hidden dim (512) divides any
    practical tp degree.
    """
    if tp <= 1:
        return P()
    if leaf.ndim == 2 and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp:
        return P(None, MODEL_AXIS)
    return P()


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Apply the TP rules and place params on the mesh."""
    tp = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = param_spec(path, leaf, tp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(mesh: Mesh, tree: Any) -> Any:
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
