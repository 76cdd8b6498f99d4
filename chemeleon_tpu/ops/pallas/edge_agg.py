"""Fused edge-message + aggregation Pallas TPU kernel.

The CSP layer's hot op is, per graph pair (i, j):

    e    = silu(fourier_ij @ Wf + term_i + term_j + base)    # edge MLP lin1
    e2   = silu(e @ W2 + b2)                                  # edge MLP lin2
    agg_i = sum_j jmask_j * e2_ij                             # masked mean

The XLA path materializes ``e`` and ``e2`` ([R*B, N, N, H] each) in HBM;
this kernel keeps the pair tensors in VMEM: per grid step it loads the
Fourier blocks of G graphs, runs both matmuls on the MXU with f32
accumulation, applies the silus in bf16 on the VPU, and reduces over j —
only the [G, N, H] aggregates leave the chip.

Grid: (R, B // G). Graphs are blocked G at a time so each step's matmuls
are [G*N*N, F] @ [F, H] — large enough to keep the MXU busy. The
conditioning replica r shares the Fourier blocks with the other replicas
(CFG geometry sharing).

Used on the inference path (no custom VJP yet); training uses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x: jnp.ndarray) -> jnp.ndarray:
    """silu with dtype-consistent constants (jax.nn.sigmoid trips a Mosaic
    f32-scalar-into-bf16-vector broadcast bug on TPU)."""
    one = jnp.asarray(1.0, dtype=x.dtype)
    return x / (one + jnp.exp(-x))


def _kernel(term_i_ref, term_j_ref, base_ref, fourier_ref, jmask_ref,
            w_f_ref, w2_ref, b2_ref, out_ref, t1_scratch, *, g: int, n: int,
            hidden: int):
    G, N, H = g, n, hidden
    dt = w2_ref.dtype
    r = pl.program_id(1)

    # The Fourier matmul depends only on geometry (graph b), not on the
    # conditioning replica r. Grid order is (b outer, r inner), so compute it
    # once at r == 0 into persistent VMEM scratch and reuse for the other
    # replicas — the same CFG geometry sharing the XLA path gets for free.
    @pl.when(r == 0)
    def _():
        four = fourier_ref[:]                                # [G, N, N, F]
        F = four.shape[-1]
        t1_scratch[:] = jnp.dot(
            four.reshape(G * N * N, F), w_f_ref[:],
            preferred_element_type=jnp.float32).astype(dt)

    # elementwise chain in the compute dtype (matches the XLA path, which
    # also adds/activates in bf16); matmuls accumulate f32 on the MXU
    e = (t1_scratch[:].reshape(G, N, N, H)
         + term_i_ref[:].astype(dt)[:, :, None, :]
         + term_j_ref[:].astype(dt)[:, None, :, :]
         + base_ref[:].astype(dt)[:, None, :, :])            # base [G,1,H]
    e = _silu(e)
    e2 = jnp.dot(e.reshape(G * N * N, H), w2_ref[:],
                 preferred_element_type=jnp.float32)
    e2 = _silu(e2.astype(dt) + b2_ref[0].astype(dt))
    e2 = e2.reshape(G, N, N, H)
    # j-reduction accumulates in f32
    agg = (e2.astype(jnp.float32)
           * jmask_ref[:][:, :, :, None]).sum(axis=2)        # [G, N, H]
    out_ref[:] = agg.astype(out_ref.dtype)


def _pick_g(n: int, b: int, f: int, hidden: int) -> int:
    """Largest G dividing B with the VMEM working set under ~6 MB."""
    for g in (8, 4, 2, 1):
        if b % g != 0:
            continue
        pairs = g * n * n
        vmem = (pairs * f * 2        # fourier block (bf16)
                + 2 * pairs * hidden * 2   # e / e2 (bf16)
                + pairs * hidden * 4)      # f32 accumulator
        if vmem < 6 * 1024 * 1024:
            return g
    return 1


def supported(n: int, hidden: int, dis_dim: int) -> bool:
    """Shapes the kernel handles (lane/sublane alignment for the MXU)."""
    return hidden % 128 == 0 and dis_dim % 128 == 0 and n >= 8 and n % 8 == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_edge_aggregate(term_i: jnp.ndarray, term_j: jnp.ndarray,
                         base: jnp.ndarray, fourier: jnp.ndarray,
                         jmask: jnp.ndarray, w_f: jnp.ndarray,
                         w2: jnp.ndarray, b2: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """agg[rb, i] = sum_j jmask[b, j] * silu(silu(fourier[b,i,j] @ w_f
    + term_i[rb,i] + term_j[rb,j] + base[b]) @ w2 + b2)

    term_i/term_j: [R*B, N, H]; base: [B, H]; fourier: [B, N, N, F];
    jmask: [B, N] (mask / natoms); w_f: [F, H]; w2: [H, H]; b2: [H].
    Returns [R*B, N, H] in term_i.dtype.
    """
    RB, N, H = term_i.shape
    B = fourier.shape[0]
    R = RB // B
    F = fourier.shape[-1]
    G = _pick_g(N, B, F, H)
    BG = B // G

    # grid order (b outer, r inner): consecutive steps over r share the same
    # fourier/base/jmask blocks, so the pipeline skips their re-fetch
    grid = (BG, R)
    kernel = functools.partial(_kernel, g=G, n=N, hidden=H)
    b2_2d = b2.reshape(1, H)
    jmask_3d = jmask.reshape(B, 1, N)
    base_3d = base.reshape(B, 1, H)  # unit middle dim for TPU tile rules

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, N, H), lambda b, r: (r * BG + b, 0, 0),
                         memory_space=pltpu.VMEM),           # term_i
            pl.BlockSpec((G, N, H), lambda b, r: (r * BG + b, 0, 0),
                         memory_space=pltpu.VMEM),           # term_j
            pl.BlockSpec((G, 1, H), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # base
            pl.BlockSpec((G, N, N, F), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # fourier
            pl.BlockSpec((G, 1, N), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # jmask
            pl.BlockSpec((F, H), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),           # w_f
            pl.BlockSpec((H, H), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),           # w2
            pl.BlockSpec((1, H), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),           # b2
        ],
        out_specs=pl.BlockSpec((G, N, H), lambda b, r: (r * BG + b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RB, N, H), term_i.dtype),
        scratch_shapes=[pltpu.VMEM((G * N * N, H), w2.dtype)],
        interpret=interpret,
    )(term_i, term_j, base_3d, fourier, jmask_3d, w_f, w2, b2_2d)
