"""Segment (scatter) reductions with static segment counts.

API-parity layer for the reference's torch-scatter rewrite
(reference: chemeleon/utils/scatter.py:27-112). On TPU the hot model path uses
dense masked means (see ops/graph.py) and never scatters; these functions exist
for the flattened-graph utilities, the CLIP graph pooling on flattened inputs,
and for tests that validate the dense path against the flattened one.

All functions require a static ``num_segments`` so shapes stay compile-time
constant under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_sum(src: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum-reduce rows of ``src`` into ``num_segments`` buckets by ``index``
    (reference scatter.py:27-48)."""
    return jax.ops.segment_sum(src, index, num_segments=num_segments)


def scatter_mean(src: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Mean-reduce (reference scatter.py:88-112). Empty segments yield 0."""
    total = jax.ops.segment_sum(src, index, num_segments=num_segments)
    count = jax.ops.segment_sum(jnp.ones((src.shape[0],), src.dtype), index,
                                num_segments=num_segments)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape((num_segments,) + (1,) * (src.ndim - 1))


def scatter_std(src: jnp.ndarray, index: jnp.ndarray, num_segments: int,
                unbiased: bool = True) -> jnp.ndarray:
    """Per-segment standard deviation (reference scatter.py:51-85)."""
    count = jax.ops.segment_sum(jnp.ones((src.shape[0],), src.dtype), index,
                                num_segments=num_segments)
    count_b = count.reshape((num_segments,) + (1,) * (src.ndim - 1))
    mean = jax.ops.segment_sum(src, index, num_segments=num_segments) / jnp.maximum(
        count_b, 1.0)
    var = jax.ops.segment_sum((src - mean[index]) ** 2, index,
                              num_segments=num_segments)
    denom = count_b - 1.0 if unbiased else count_b
    return jnp.sqrt(var / jnp.maximum(denom, 1.0))


def repeat_blocks(sizes: jnp.ndarray, repeats: int, total_size: int,
                  continuous_indexing: bool = True,
                  repeat_inc: int = 0) -> jnp.ndarray:
    """Static-shape analog of the reference's block-repeat indexer
    (reference: chemeleon/utils/data_utils.py:10-148), restricted to the single
    call pattern the reference actually uses (cspnet.py:296-301): constant
    ``repeats``, scalar ``repeat_inc``, continuous indexing.

    Returns an index array of length ``total_size`` (= repeats * sizes.sum(),
    which the caller must supply statically).
    """
    n_blocks = sizes.shape[0]
    starts = jnp.concatenate([jnp.zeros(1, sizes.dtype), jnp.cumsum(sizes)[:-1]])
    # Build [block, rep, pos] grid over max size, then compact via sort.
    max_size = total_size  # loose bound; we mask invalid entries to the end
    pos = jnp.arange(max_size)
    out = []
    # Vectorized: for each output slot, determine (block, rep, offset).
    rep_sizes = jnp.repeat(sizes, repeats, total_repeat_length=n_blocks * repeats)
    rep_starts = jnp.concatenate([jnp.zeros(1, sizes.dtype),
                                  jnp.cumsum(rep_sizes)[:-1]])
    block_of_rep = jnp.arange(n_blocks * repeats) // repeats
    rep_idx = jnp.arange(n_blocks * repeats) % repeats
    base = (starts[block_of_rep] if continuous_indexing
            else jnp.zeros_like(block_of_rep)) + rep_idx * repeat_inc
    # slot -> which repeated block it belongs to
    seg = jnp.searchsorted(jnp.cumsum(rep_sizes), pos, side="right")
    seg = jnp.clip(seg, 0, n_blocks * repeats - 1)
    offset = pos - rep_starts[seg]
    out = base[seg] + offset
    return out[:total_size]
