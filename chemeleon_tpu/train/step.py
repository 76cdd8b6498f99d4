"""Jitted, mesh-sharded train/eval steps.

The TPU-native replacement for Lightning's training_step + DDP backward
(reference base_module.py:30-38; run.py:78-90): one jit-compiled function per
(batch-shape) with the batch sharded over the data axis. Gradient all-reduce
is inserted by GSPMD; metric reduction is a by-product of the (already
global) masked means — the analog of ``sync_dist=True`` (base_module.py:53).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chemeleon_tpu.models.chemeleon import Chemeleon
from chemeleon_tpu.ops.graph import CrystalBatch


def make_train_step(model: Chemeleon, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Returns step(params, opt_state, batch, raw_text, key) ->
    (params, opt_state, metrics)."""

    def step(params, opt_state, batch: CrystalBatch, raw_text, key):
        def loss_fn(p):
            return model.loss(p, batch, raw_text, key)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    # Mesh branch: constrain the batch/text inputs to the data axis INSIDE
    # the compiled step (params keep their committed TP placement from
    # shard_params; GSPMD inserts the grad all-reduce + TP collectives).
    # with_sharding_constraint makes the layout part of the program instead
    # of trusting callers to device_put correctly.
    def data_shard(x):
        return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))

    def sharded_step(params, opt_state, batch, raw_text, key):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, data_shard(x)),
            batch)
        if raw_text is not None:
            raw_text = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, data_shard(x)),
                raw_text)
        return step(params, opt_state, batch, raw_text, key)

    return jax.jit(sharded_step, donate_argnums=(0, 1))


def make_eval_step(model: Chemeleon) -> Callable:
    def step(params, batch: CrystalBatch, raw_text, key):
        _, metrics = model.loss(params, batch, raw_text, key)
        return metrics

    return jax.jit(step)
