"""CSPNet score network — dense, TPU-native flax.linen rebuild.

Re-implements the reference CSPNet GNN denoiser (reference:
chemeleon/modules/cspnet.py:184-405, itself adapted from DiffCSP) on dense
padded batches ``[B, N, ...]`` instead of flattened PyG graphs.

Math is identical to the reference; the *compute schedule* is TPU-first:

  * fc message passing is a masked all-pairs op. The first edge-MLP linear over
    ``[h_i, h_j, lat_ip(9), fourier_ij]`` (cspnet.py:113-118, :150-151) is
    algebraically decomposed into per-node terms ``h @ W_i``, ``h @ W_j``, a
    per-graph lattice term, and one genuinely pairwise matmul
    ``fourier @ W_f`` — turning an O(N^2 * (2H+9+F) * H) contraction into
    O(N * H^2) + O(N^2 * F * H), all MXU-shaped batched matmuls.
  * Edge aggregation (reference scatter_mean over edge_index[0],
    cspnet.py:154-160) becomes a masked mean over the j axis — no scatters.
  * The pairwise Fourier features are computed once and reused by all layers,
    matching the reference (frac_diff computed once in gen_edges,
    cspnet.py:355) and carry a stop_gradient like the reference's
    ``.detach()`` (cspnet.py:52).

Self-loops are included in the fc edge set, as in the reference
(torch.ones(n, n) diagonal, cspnet.py:320-324).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from chemeleon_tpu.ops.graph import (
    fc_pair_mask,
    masked_mean_nodes,
    masked_mean_pairs,
    pairwise_frac_diff,
)


class DecoderOutputs(NamedTuple):
    """Mirror of the reference's DECODER_OUTPUTS namedtuple (cspnet.py:16-18)."""
    atom_types_out: Optional[jnp.ndarray]  # [B, N, max_atoms]
    lattice_out: jnp.ndarray               # [B, 3, 3]
    coords_out: jnp.ndarray                # [B, N, 3]
    node_features: jnp.ndarray             # [B, N, hidden_dim]


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """'Attention is all you need' time embedding (cspnet.py:21-35).
    t: [B] -> [B, dim]."""
    half_dim = dim // 2
    scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def sinusoids_embedding(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """Periodic Fourier distance features (cspnet.py:38-52).

    x: [..., 3] -> [..., n_frequencies * 2 * 3]. Frequencies are
    2*pi*arange(F) (including 0), ordering (coord-major then freq) and the
    stop_gradient match the reference exactly.
    """
    freqs = 2.0 * math.pi * jnp.arange(n_frequencies, dtype=x.dtype)
    emb = x[..., None] * freqs                                   # [..., 3, F]
    emb = emb.reshape(*x.shape[:-1], 3 * n_frequencies)          # [..., 3F]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)  # [..., 6F]
    return jax.lax.stop_gradient(emb)


class FilmLayer(nn.Module):
    """Feature-wise linear modulation + residual block (cspnet.py:55-97).

    A single instance is shared across all message-passing layers, as in the
    reference (cspnet.py:212, :371-375).
    """
    hidden_dim: int
    cond_dim: int  # time_dim + text_dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, H]; cond: [B, cond_dim]
        cond_emb = nn.Dense(self.hidden_dim * 2, name="mlp_cond",
                            dtype=self.dtype)(cond)
        cond_emb = nn.silu(cond_emb)
        scale, shift = jnp.split(cond_emb, 2, axis=-1)           # [B, H] each
        x_init = x
        x = nn.Dense(self.hidden_dim, name="proj", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        x = x * scale[:, None, :] + shift[:, None, :]
        x = nn.silu(x)
        return x + x_init


class CSPLayer(nn.Module):
    """One dense message-passing layer (reference CSPLayer, cspnet.py:100-181).

    Parameters keep the reference's logical layout (edge_mlp has input
    ``[h_i, h_j, lat_ip_flat(9), fourier]``) so checkpoints convert 1:1; the
    forward pass slices the first kernel into its four blocks and applies the
    decomposed schedule described in the module docstring.
    """
    hidden_dim: int
    dis_dim: int      # fourier dim (num_freqs * 6) or 3 when dis_emb is None
    ln: bool = False
    ip: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_features: jnp.ndarray, fourier_ij: jnp.ndarray,
                 lat_ip_flat: jnp.ndarray, pair_mask: jnp.ndarray,
                 neighbors: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        """fc mode: fourier_ij [B, N, N, D], pair_mask [B, N, N].
        knn mode (``neighbors=(nbr_j, nbr_mask)``, each [B, N, K]):
        fourier_ij [B, N, K, D]; pair_mask unused. Padded nodes are handled
        entirely by pair_mask/nbr_mask and the downstream masked
        reductions — no per-node mask is needed here."""
        H, D = self.hidden_dim, self.dis_dim
        in_dim = 2 * H + 9 + D

        # Parameters (same shapes as reference nn.Linear weights, transposed
        # to flax's [in, out] convention).
        e1_kernel = self.param("edge_lin1_kernel", nn.initializers.lecun_normal(),
                               (in_dim, H), jnp.float32)
        e1_bias = self.param("edge_lin1_bias", nn.initializers.zeros, (H,),
                             jnp.float32)
        e2_kernel = self.param("edge_lin2_kernel", nn.initializers.lecun_normal(),
                               (H, H), jnp.float32)
        e2_bias = self.param("edge_lin2_bias", nn.initializers.zeros, (H,),
                             jnp.float32)
        dt = self.dtype
        e1_kernel = e1_kernel.astype(dt)

        node_input = node_features
        if self.ln:
            node_features = nn.LayerNorm(epsilon=1e-5, name="layer_norm",
                                         dtype=dt)(node_features)

        h = node_features.astype(dt)
        RB = h.shape[0]
        B = fourier_ij.shape[0]
        N = h.shape[1]
        # Decomposed first edge linear: blocks [W_i; W_j; W_lat; W_f].
        w_i = e1_kernel[:H]
        w_j = e1_kernel[H: 2 * H]
        w_lat = e1_kernel[2 * H: 2 * H + 9]
        w_f = e1_kernel[2 * H + 9:]

        term_i = h @ w_i                                          # [RB, N, H]
        term_j = h @ w_j                                          # [RB, N, H]
        term_lat = lat_ip_flat.astype(dt) @ w_lat                 # [B, H]

        if neighbors is not None:
            # knn mode (reference edge_style='knn', cspnet.py:325-343 — the
            # upstream flattened path is broken, data_utils.py:7; here each
            # node aggregates its K nearest periodic neighbors).
            nbr_j, nbr_mask = neighbors                       # [B, N, K]
            K = nbr_j.shape[-1]
            R = RB // B
            idx = jnp.tile(nbr_j, (R, 1, 1))                  # [RB, N, K]
            # gather term_j at neighbor indices: [RB, N, K, H]
            term_j_g = jnp.take_along_axis(
                term_j, idx.reshape(RB, N * K)[..., None],
                axis=1).reshape(RB, N, K, H)
            term_f = fourier_ij.astype(dt) @ w_f              # [B, N, K, H]
            e = (term_i[:, :, None, :] + term_j_g
                 + jnp.tile(term_lat, (R, 1))[:, None, None, :]
                 + jnp.tile(term_f, (R, 1, 1, 1))
                 + e1_bias.astype(dt))
            e = nn.silu(e)
            e = e @ e2_kernel.astype(dt) + e2_bias.astype(dt)
            e = nn.silu(e)                                    # [RB, N, K, H]
            w = jnp.tile(nbr_mask, (R, 1, 1)).astype(e.dtype)[..., None]
            agg = (e * w).sum(axis=2) / jnp.maximum(w.sum(axis=2), 1.0)
        else:
            term_f = fourier_ij.astype(dt) @ w_f              # [B, N, N, H]
            if RB != B:
                # CFG dual-conditioning: the R conditioning replicas share
                # the same geometry, so the dominant pairwise Fourier matmul
                # above is computed ONCE for B graphs and broadcast over R.
                R = RB // B
                e = (term_i.reshape(R, B, N, 1, H)
                     + term_j.reshape(R, B, 1, N, H)
                     + term_lat[None, :, None, None, :]
                     + term_f[None] + e1_bias.astype(dt))     # [R,B,N,N,H]
                agg_mask = pair_mask[None]                    # [1,B,N,N]
            else:
                e = (term_i[:, :, None, :] + term_j[:, None, :, :]
                     + term_lat[:, None, None, :] + term_f
                     + e1_bias.astype(dt))
                agg_mask = pair_mask
            e = nn.silu(e)
            e = e @ e2_kernel.astype(dt) + e2_bias.astype(dt)
            e = nn.silu(e)
            agg = masked_mean_pairs(e, agg_mask)              # [.., N, H]
            agg = agg.reshape(RB, N, H)

        # Node MLP on concat([h, agg]) (cspnet.py:119-124, :154-163),
        # decomposed the same way.
        n1_kernel = self.param("node_lin1_kernel", nn.initializers.lecun_normal(),
                               (2 * H, H), jnp.float32).astype(dt)
        n1_bias = self.param("node_lin1_bias", nn.initializers.zeros, (H,),
                             jnp.float32)
        out = h @ n1_kernel[:H] + agg @ n1_kernel[H:] + n1_bias.astype(dt)
        out = nn.silu(out)
        out = nn.Dense(H, name="node_lin2", dtype=dt)(out)
        out = nn.silu(out)

        return node_input + out.astype(node_input.dtype)


class CSPNet(nn.Module):
    """Dense CSPNet (reference cspnet.py:184-405).

    Inputs are dense padded batches; ``mask`` marks real atoms. ``t_emb`` and
    ``text_embeds`` are per-graph and broadcast per node (the reference's
    repeat_interleave, cspnet.py:359-369).
    """
    hidden_dim: int = 512
    time_dim: int = 128
    text_dim: int = 512
    num_layers: int = 6
    max_atoms: int = 104
    act_fn: str = "silu"
    dis_emb: str = "sin"
    num_freqs: int = 128
    edge_style: str = "fc"
    cutoff: float = 6.0
    max_neighbors: int = 20
    image_range: int = 1      # knn periodic image search range (see
    #                           radius_graph_pbc: raise when cell axes can
    #                           be shorter than the cutoff)
    ln: bool = True
    ip: bool = True
    smooth: bool = False
    pred_atom_types: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False       # rematerialize CSP layers (training memory:
    #                           drops the [RB, N, N, H] edge activations and
    #                           recomputes them in the backward pass)

    @nn.compact
    def __call__(self, atom_types: jnp.ndarray, frac_coords: jnp.ndarray,
                 lattices: jnp.ndarray, mask: jnp.ndarray,
                 t_emb: Optional[jnp.ndarray] = None,
                 text_embeds: Optional[jnp.ndarray] = None) -> DecoderOutputs:
        dt = self.dtype
        B, N = atom_types.shape
        if self.act_fn != "silu":
            # the reference supports only silu and fails loudly otherwise
            # (cspnet.py:213-214: self.act_fn set only when act_fn=='silu');
            # raise here instead of silently ignoring the config
            raise ValueError(f"unsupported act_fn {self.act_fn!r} "
                             "(only 'silu', as upstream)")

        # Edge generation, once per forward (reference gen_edges,
        # cspnet.py:319-343, computed once and reused by every layer).
        neighbors = None
        if self.edge_style == "fc":
            pair_mask = fc_pair_mask(mask)
            frac_diff = pairwise_frac_diff(frac_coords)           # [B,N,N,3]
        elif self.edge_style == "knn":
            from chemeleon_tpu.ops.graph import radius_graph_pbc
            nbr_j, _, nbr_mask, frac_diff = radius_graph_pbc(
                frac_coords, lattices, mask, self.cutoff,
                self.max_neighbors, self.image_range)             # [B,N,2K,*]
            neighbors = (nbr_j, nbr_mask)
            pair_mask = None
        else:
            raise ValueError(f"unknown edge_style {self.edge_style!r}")
        if self.dis_emb == "sin":
            fourier_ij = sinusoids_embedding(frac_diff, self.num_freqs)
            dis_dim = self.num_freqs * 2 * 3
        elif self.dis_emb in (None, "none"):  # raw frac diff (reference
            fourier_ij = frac_diff            # dis_emb=None, cspnet.py:104)
            dis_dim = 3
        else:
            # a typo like 'sine' must not silently change the architecture
            raise ValueError(f"unknown dis_emb {self.dis_emb!r} "
                             "(expected 'sin' or None)")
        # Fourier storage dtype, size-gated by measurement: at small N the
        # per-layer fused convert wins (explicit bf16 cast measured 17.6 vs
        # 18.7 structs/s @ N=16 — it materializes an extra copy); at large N
        # the [B, N, N, F] f32 reads dominate (~4.6 ms/step @ N=40), so
        # storing bf16 halves the hot-loop traffic.
        if N >= 24:
            fourier_ij = fourier_ij.astype(dt)

        # Lattice inner products, flattened per graph (cspnet.py:144-149).
        if self.ip:
            lat_ip = jnp.einsum("bij,bkj->bik", lattices, lattices)
        else:
            lat_ip = lattices
        lat_ip_flat = lat_ip.reshape(B, 9)

        # Node embedding (cspnet.py:206-210, :357).
        if self.smooth:
            one_hot = jax.nn.one_hot(atom_types, self.max_atoms, dtype=dt)
            h = nn.Dense(self.hidden_dim, name="node_embedding", dtype=dt)(one_hot)
        else:
            h = nn.Embed(self.max_atoms, self.hidden_dim, name="node_embedding",
                         dtype=dt)(atom_types)

        # CFG dual-conditioning: text_embeds of shape [R, B, D] runs R
        # conditioning replicas over the SAME geometry in one forward — the
        # pairwise Fourier work is shared (see CSPLayer). Output leading dim
        # is R*B with replica-major layout ([cond...; null...] for R=2,
        # matching a batch-concat layout).
        R = 1
        if text_embeds is not None and text_embeds.ndim == 3:
            R = text_embeds.shape[0]
            h = jnp.tile(h, (R, 1, 1))
            text_embeds = text_embeds.reshape(R * B, -1)
            if t_emb is not None:
                t_emb = jnp.tile(t_emb, (R, 1))
        mask_rb = jnp.tile(mask, (R, 1)) if R > 1 else mask
        lattices_rb = jnp.tile(lattices, (R, 1, 1)) if R > 1 else lattices

        # Conditioning (FiLM shared across layers, cspnet.py:211-212, :371-375).
        cond = None
        if t_emb is not None and text_embeds is not None:
            cond = jnp.concatenate([t_emb, text_embeds], axis=-1)
        elif t_emb is not None:
            cond = t_emb
        elif text_embeds is not None:
            cond = text_embeds

        film = (FilmLayer(self.hidden_dim, cond_dim=self.time_dim + self.text_dim,
                          name="film_layer", dtype=dt)
                if (self.time_dim > 0 or self.text_dim > 0) else None)

        layer_cls = nn.remat(CSPLayer) if self.remat else CSPLayer
        for i in range(self.num_layers):
            if cond is not None and film is not None:
                h = film(h, cond)
            h = layer_cls(self.hidden_dim, dis_dim, ln=self.ln, ip=self.ip,
                          name=f"csp_layer_{i}", dtype=dt)(
                h, fourier_ij, lat_ip_flat, pair_mask,
                neighbors=neighbors)

        if self.ln:
            h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm", dtype=dt)(h)

        coord_out = nn.Dense(3, use_bias=False, name="coord_out", dtype=dt)(h)

        graph_features = masked_mean_nodes(h, mask_rb)            # [R*B, H]
        lattice_out = nn.Dense(9, use_bias=False, name="lattice_out",
                               dtype=dt)(graph_features)
        lattice_out = lattice_out.reshape(R * B, 3, 3)
        if self.ip:
            lattice_out = jnp.einsum("bij,bjk->bik", lattice_out,
                                     lattices_rb.astype(lattice_out.dtype))

        type_out = None
        if self.pred_atom_types:
            type_out = nn.Dense(self.max_atoms, name="type_out", dtype=dt)(h)

        f32 = lambda a: None if a is None else a.astype(jnp.float32)
        return DecoderOutputs(atom_types_out=f32(type_out),
                              lattice_out=f32(lattice_out),
                              coords_out=f32(coord_out),
                              node_features=f32(h))
