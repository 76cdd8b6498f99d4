"""Dense, static-shape crystal graph batches.

This is the TPU-first replacement for the reference's dynamic PyG graphs
(reference: chemeleon/modules/cspnet.py:319-343 builds fc edges with
``torch.block_diag`` + ``dense_to_sparse``; chemeleon/utils/data_utils.py:159-398
implements a flattened periodic radius graph). Instead of a flattened node list
with O(sum n_i^2) dynamic edges, we keep graphs padded to a static ``N`` per
batch (``[B, N, ...]``) and express fully-connected message passing as masked
dense pairwise ops — which XLA maps onto the MXU as batched matmuls with zero
scatters/gathers on the hot path.

The fc edge set of the reference *includes self-loops* (torch.ones(n, n) has a
non-zero diagonal, cspnet.py:320-324); the dense pair mask reproduces that.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class CrystalBatch:
    """A batch of padded crystal graphs.

    atom_types:  [B, N] int32 — element Z (1..103), 0 = dummy/absorbing state.
                 Padded slots are 0 and masked out.
    frac_coords: [B, N, 3] float — fractional coordinates in [0, 1).
    lattices:    [B, 3, 3] float — row-vector lattice matrices.
    natoms:      [B] int32 — real atom counts per graph.
    """

    atom_types: jnp.ndarray
    frac_coords: jnp.ndarray
    lattices: jnp.ndarray
    natoms: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.atom_types.shape[0]

    @property
    def n_max(self) -> int:
        return self.atom_types.shape[1]

    @property
    def node_mask(self) -> jnp.ndarray:
        """[B, N] bool — True for real atoms."""
        return node_mask(self.natoms, self.n_max)


def node_mask(natoms: jnp.ndarray, n_max: int) -> jnp.ndarray:
    """[B, N] mask from per-graph atom counts."""
    return jnp.arange(n_max)[None, :] < natoms[:, None]


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest padding bucket >= n (compile-once-per-bucket discipline)."""
    for b in sorted(buckets):
        if n <= b:
            return b
    return int(np.ceil(n / 8) * 8)


def make_empty_batch(natoms: Sequence[int], n_max: int | None = None,
                     buckets: Sequence[int] = (8, 12, 16, 20, 24, 32, 36, 40, 48)) -> CrystalBatch:
    """Build a zero-initialized batch for sampling (reference builds an empty
    PyG Batch at chemeleon.py:335-337)."""
    natoms_arr = np.asarray(natoms, dtype=np.int32)
    if n_max is None:
        n_max = pick_bucket(int(natoms_arr.max()), buckets)
    elif natoms_arr.size and n_max < int(natoms_arr.max()):
        raise ValueError(
            f"n_max={n_max} < largest structure ({int(natoms_arr.max())} "
            "atoms): the batch would silently truncate it")
    B = len(natoms_arr)
    return CrystalBatch(
        atom_types=jnp.zeros((B, n_max), jnp.int32),
        frac_coords=jnp.zeros((B, n_max, 3), jnp.float32),
        lattices=jnp.zeros((B, 3, 3), jnp.float32),
        natoms=jnp.asarray(natoms_arr))


def batch_from_arrays(atom_types_list: List[np.ndarray],
                      frac_coords_list: List[np.ndarray],
                      lattices_list: List[np.ndarray],
                      n_max: int | None = None,
                      buckets: Sequence[int] = (8, 12, 16, 20, 24, 32, 36, 40, 48)) -> CrystalBatch:
    """Pad a list of variable-size crystals into one dense batch."""
    natoms = np.asarray([len(a) for a in atom_types_list], dtype=np.int32)
    if n_max is None:
        n_max = pick_bucket(int(natoms.max()), buckets)
    elif natoms.size and n_max < int(natoms.max()):
        raise ValueError(
            f"n_max={n_max} < largest structure ({int(natoms.max())} "
            "atoms): the batch would silently truncate it")
    B = len(atom_types_list)
    types = np.zeros((B, n_max), np.int32)
    coords = np.zeros((B, n_max, 3), np.float32)
    for i, (a, x) in enumerate(zip(atom_types_list, frac_coords_list)):
        types[i, : len(a)] = a
        coords[i, : len(a)] = x
    lattices = np.stack(lattices_list).astype(np.float32)
    return CrystalBatch(atom_types=jnp.asarray(types), frac_coords=jnp.asarray(coords),
                        lattices=jnp.asarray(lattices), natoms=jnp.asarray(natoms))


# ---------------------------------------------------------------------------
# Dense masked reductions (replace scatter_mean on the hot path)
# ---------------------------------------------------------------------------

def masked_mean_nodes(h: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over real nodes: [B, N, H], [B, N] -> [B, H].

    Replaces ``scatter_mean(node_features, node2graph)`` (cspnet.py:390)."""
    m = mask.astype(h.dtype)[..., None]
    return (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


def masked_sum_nodes(h: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(h.dtype)[..., None]
    return (h * m).sum(axis=1)


def masked_mean_pairs(m_ij: jnp.ndarray, pair_mask: jnp.ndarray) -> jnp.ndarray:
    """Aggregate messages over j: [..., N, N, H], [..., N, N] -> [..., N, H].

    Replaces ``scatter_mean(edge_features, edge_index[0])`` (cspnet.py:155-160).
    For fc graphs the per-node denominator is natoms (self-loops included).
    Leading dims broadcast (used by the CFG dual-conditioning path where the
    mask is shared across conditioning replicas)."""
    w = pair_mask.astype(m_ij.dtype)[..., None]
    return (m_ij * w).sum(axis=-2) / jnp.maximum(w.sum(axis=-2), 1.0)


def fc_pair_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, N] -> [B, N, N] fully-connected pair mask incl. self-loops
    (the reference fc edge set, cspnet.py:320-324)."""
    return mask[:, :, None] & mask[:, None, :]


def pairwise_frac_diff(frac_coords: jnp.ndarray) -> jnp.ndarray:
    """(x_j - x_i) mod 1 for all pairs: [B, N, 3] -> [B, N, N, 3]
    (cspnet.py:324, :140-141)."""
    diff = frac_coords[:, None, :, :] - frac_coords[:, :, None, :]
    return diff % 1.0


# ---------------------------------------------------------------------------
# Periodic radius graph (knn edge style) — static shapes
# ---------------------------------------------------------------------------

def _image_offsets(image_range: int) -> np.ndarray:
    """Lexicographic [-r..r]^3 offsets; index(-o) == count-1-index(o)."""
    r = image_range
    span = range(-r, r + 1)
    return np.array([[i, j, k] for i in span for j in span for k in span],
                    dtype=np.float32)


_IMAGE_OFFSETS = _image_offsets(1)  # [27, 3], center image at index 13


def radius_graph_pbc(frac_coords: jnp.ndarray, lattices: jnp.ndarray,
                     mask: jnp.ndarray, cutoff: float,
                     max_neighbors: int,
                     image_range: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                    jnp.ndarray, jnp.ndarray]:
    """Batched periodic neighbor search with static output shapes.

    Rebuild of the reference's ``radius_graph_pbc`` (data_utils.py:159-398,
    whose knn path is broken upstream — it calls segment_coo with the import
    commented out, data_utils.py:7). Per atom, the K=``max_neighbors``
    nearest in-cutoff neighbors are selected by top-k over the
    (2r+1)^3-image set, then the edge set is SYMMETRIZED — every selected
    i->j edge gets its mirrored j->i counterpart, the invariant the
    reference enforces via reorder_symmetric_edges (cspnet.py:246-317) —
    so the output carries 2K slots per atom. Hub atoms selected by more
    than K neighbors overflow their 2K slots; overflowing edges are
    dropped in BOTH directions (longest first), so the symmetry invariant
    holds unconditionally.

    ``image_range`` must satisfy r >= ceil(cutoff / min plane spacing) to
    see every in-range image; r=1 matches cells whose axes exceed the
    cutoff (true for mp-40 at the default 6 A cutoff, not for very short
    axes — raise it when relaxing tiny cells).

    Returns (nbr_j, nbr_img, nbr_mask, frac_diff):
      nbr_j:     [B, N, 2K] int32 neighbor node index
      nbr_img:   [B, N, 2K] int32 image index into the (2r+1)^3 offsets
      nbr_mask:  [B, N, 2K] bool valid-edge mask
      frac_diff: [B, N, 2K, 3] unwrapped fractional difference
                 x_j + image - x_i (what the knn path feeds the Fourier
                 embedding, cspnet.py:336-343)
    """
    B, N, _ = frac_coords.shape
    offsets = jnp.asarray(_image_offsets(image_range))          # [C, 3]
    C = offsets.shape[0]
    cart = jnp.einsum("bni,bij->bnj", frac_coords, lattices)    # [B, N, 3]
    # displacement for each (i, j, c): x_j + offset_c - x_i in cartesian
    img_cart = jnp.einsum("ci,bij->bcj", offsets, lattices)     # [B, C, 3]
    disp = (cart[:, None, :, None, :] + img_cart[:, None, None, :, :]
            - cart[:, :, None, None, :])                        # [B, N, N, C, 3]
    dist = jnp.sqrt((disp ** 2).sum(-1) + 1e-12)                # [B, N, N, C]

    pair_ok = mask[:, :, None] & mask[:, None, :]               # [B, N, N]
    valid = pair_ok[..., None] & (dist <= cutoff) & (dist > 1e-6)
    big = jnp.float32(1e10)
    dist_flat = jnp.where(valid, dist, big).reshape(B, N, N * C)

    # per-atom directed K-nearest cap (reference get_max_neighbors_mask,
    # data_utils.py:319-398); flat index layout over (j, c), c fastest.
    # Selection masks are built by THRESHOLD COMPARE against the K-th
    # distance instead of scattering top-k indices back into a [B,N,N*C]
    # bool — TPU scatters serialize on the VPU while a broadcast-compare
    # fuses into the distance computation (the round-3 knn path spent its
    # gap on two such scatters). Tie semantics: atoms whose K-th neighbor
    # distance is degenerate (symmetric cells) select the whole tie class;
    # the 2K-slot cap below still bounds the edge count and the kept-edge
    # re-symmetrization keeps the invariant exact.
    K = max_neighbors
    neg_top, _ = jax.lax.top_k(-dist_flat, K)                   # [B, N, K]
    kth = -neg_top[..., -1]                                     # [B, N]
    selected = valid & (dist <= kth[:, :, None, None])
    # symmetrize: the mirror of edge (i->j, offset o) is (j->i, -o), i.e.
    # image index C-1-c under the lexicographic enumeration
    selected = selected | selected.transpose(0, 2, 1, 3)[..., ::-1]

    K2 = 2 * K
    dist_flat2 = jnp.where(selected, dist, big).reshape(B, N, N * C)
    neg_top2, idx2 = jax.lax.top_k(-dist_flat2, K2)             # [B, N, 2K]
    nbr_j = idx2 // C
    nbr_img = idx2 % C
    nbr_mask = -neg_top2 < big / 2
    # A hub atom selected by more than K neighbors overflows its 2K slots
    # and the top-k above drops its farthest mirrors, which would leave
    # one-directional edges. Re-symmetrize by KEPT edges: an edge survives
    # only if both directions fit (both dropped otherwise), preserving the
    # invariant exactly at the cost of a few longest hub edges. "Kept"
    # (= landed in the 2K slots) is again scatter-free: strictly closer
    # than the boundary distance always lands; AT the boundary distance,
    # top_k's stable tie-break (lower flat index first) means exactly the
    # entries up to the largest slotted tie index landed.
    kth2 = -neg_top2[..., -1]                                   # [B, N]
    at_boundary = (-neg_top2) == kth2[..., None]                # [B, N, 2K]
    boundary_idx = jnp.max(
        jnp.where(at_boundary & nbr_mask, idx2, -1), axis=-1)   # [B, N]
    flat_idx = (jnp.arange(N)[:, None] * C
                + jnp.arange(C)[None, :])                       # [N, C]
    kth2_b = kth2[:, :, None, None]
    kept = selected & (
        (dist < kth2_b)
        | ((dist == kth2_b)
           & (flat_idx[None, None] <= boundary_idx[:, :, None, None])))
    kept = kept & kept.transpose(0, 2, 1, 3)[..., ::-1]
    nbr_mask = nbr_mask & jnp.take_along_axis(
        kept.reshape(B, N, N * C), idx2, axis=2)

    xi = frac_coords[:, :, None, :]                             # [B, N, 1, 3]
    xj = jnp.take_along_axis(
        jnp.broadcast_to(frac_coords[:, None, :, :], (B, N, N, 3)),
        nbr_j[..., None], axis=2)                               # [B, N, 2K, 3]
    frac_diff = xj + offsets[nbr_img] - xi
    return nbr_j, nbr_img, nbr_mask, frac_diff


# ---------------------------------------------------------------------------
# Analog-bits codecs (reference data_utils.py:401-438 — dead code upstream,
# kept for API parity)
# ---------------------------------------------------------------------------

def decimal_to_bits(x: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """Int [0, 2^bits) -> {-1, 1} bit representation."""
    x = x.astype(jnp.int32)
    shifts = 2 ** jnp.arange(bits - 1, -1, -1)
    b = (x[..., None] // shifts) % 2
    return b.astype(jnp.float32) * 2.0 - 1.0


def bits_to_decimal(b: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """{-1, 1} bits -> integer."""
    bi = (b > 0).astype(jnp.int32)
    shifts = 2 ** jnp.arange(bits - 1, -1, -1)
    return (bi * shifts).sum(-1)
