"""ops/graph + ops/scatter unit tests: PBC radius graph, segment ops,
bit codecs, dataset utils."""

import jax
import jax.numpy as jnp
import numpy as np

from chemeleon_tpu.ops.graph import (
    bits_to_decimal,
    decimal_to_bits,
    node_mask,
    pick_bucket,
    radius_graph_pbc,
)
from chemeleon_tpu.ops.scatter import scatter_mean, scatter_std, scatter_sum


def test_radius_graph_pbc_simple_cubic():
    # 2 atoms in a 4A cubic cell at (0,0,0) and (0.5,0,0): nearest neighbor
    # distance 2A in both directions along x (direct and periodic image).
    frac = jnp.asarray([[[0, 0, 0], [0.5, 0, 0]]], dtype=jnp.float32)
    lat = jnp.eye(3)[None] * 4.0
    mask = jnp.ones((1, 2), bool)
    nbr_j, nbr_img, nbr_mask, frac_diff = radius_graph_pbc(
        frac, lat, mask, cutoff=2.5, max_neighbors=4)
    # atom 0: neighbors are atom 1 (direct) and atom 1 (image -1 in x)
    valid = np.asarray(nbr_mask)[0, 0]
    js = np.asarray(nbr_j)[0, 0][valid]
    assert (js == 1).all()
    assert valid.sum() == 2
    # frac diffs are +-0.5 along x
    fd = np.asarray(frac_diff)[0, 0][valid]
    assert sorted(np.round(fd[:, 0], 3).tolist()) == [-0.5, 0.5]
    # self-edges at distance 0 excluded, self-images at 4A beyond cutoff
    assert not ((js == 0).any())


def test_radius_graph_pbc_max_neighbors_cap_and_symmetry():
    rng = np.random.default_rng(0)
    frac = jnp.asarray(rng.uniform(size=(1, 8, 3)), dtype=jnp.float32)
    lat = jnp.eye(3)[None] * 3.0  # dense cell -> many neighbors
    mask = jnp.ones((1, 8), bool)
    K = 5
    nbr_j, nbr_img, nbr_mask, _ = radius_graph_pbc(frac, lat, mask,
                                                   cutoff=6.0,
                                                   max_neighbors=K)
    # directed selection capped at K, then mirrored -> at most 2K per atom
    valid = np.asarray(nbr_mask)
    assert valid.sum(-1).max() <= 2 * K
    # the edge set is symmetric: (i->j, offset o) implies (j->i, -o)
    # (the invariant the reference enforces via reorder_symmetric_edges)
    C = 27
    edges = set()
    js, imgs = np.asarray(nbr_j), np.asarray(nbr_img)
    for i in range(8):
        for k in range(valid.shape[-1]):
            if valid[0, i, k]:
                edges.add((i, int(js[0, i, k]), int(imgs[0, i, k])))
    for (i, j, c) in edges:
        assert (j, i, C - 1 - c) in edges, (i, j, c)


def test_radius_graph_pbc_image_range_covers_short_axes():
    # 2.5 A axis with a 6 A cutoff: in-range images 2 cells away exist;
    # image_range=1 cannot see them, image_range=3 must.
    frac = jnp.asarray([[[0.0, 0.0, 0.0]]], dtype=jnp.float32)
    lat = jnp.asarray([np.diag([2.5, 12.0, 12.0])], dtype=jnp.float32)
    mask = jnp.ones((1, 1), bool)
    _, _, m1, _ = radius_graph_pbc(frac, lat, mask, cutoff=6.0,
                                   max_neighbors=8, image_range=1)
    _, _, m3, fd3 = radius_graph_pbc(frac, lat, mask, cutoff=6.0,
                                     max_neighbors=8, image_range=3)
    # self-images along x at 2.5 and 5.0 A are in range: r=1 sees 2 of them,
    # r=3 sees all 4 (+-1, +-2 cells)
    assert int(np.asarray(m1).sum()) == 2
    assert int(np.asarray(m3).sum()) == 4
    xs = sorted(np.round(np.asarray(fd3)[0, 0][np.asarray(m3)[0, 0], 0], 3))
    assert xs == [-2.0, -1.0, 1.0, 2.0]


def test_radius_graph_pbc_padding():
    frac = jnp.asarray([[[0, 0, 0], [0.5, 0.5, 0.5], [0.9, 0.9, 0.9]]],
                       dtype=jnp.float32)
    lat = jnp.eye(3)[None] * 4.0
    mask = jnp.asarray([[True, True, False]])
    nbr_j, _, nbr_mask, _ = radius_graph_pbc(frac, lat, mask, cutoff=5.0,
                                             max_neighbors=6)
    valid = np.asarray(nbr_mask)
    js = np.asarray(nbr_j)
    # no valid edge touches the padded atom 2
    assert not (js[valid] == 2).any()
    assert valid[0, 2].sum() == 0


def test_scatter_ops():
    src = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
    idx = jnp.asarray([0, 0, 1, 1])
    s = scatter_sum(src, idx, 2)
    np.testing.assert_allclose(np.asarray(s), [[4, 6], [12, 14]])
    m = scatter_mean(src, idx, 2)
    np.testing.assert_allclose(np.asarray(m), [[2, 3], [6, 7]])
    sd = scatter_std(src, idx, 2)
    np.testing.assert_allclose(np.asarray(sd),
                               [[np.sqrt(2), np.sqrt(2)],
                                [np.sqrt(2), np.sqrt(2)]], rtol=1e-6)


def test_bit_codecs_roundtrip():
    x = jnp.arange(104)
    b = decimal_to_bits(x, bits=8)
    assert set(np.unique(np.asarray(b))) <= {-1.0, 1.0}
    np.testing.assert_array_equal(np.asarray(bits_to_decimal(b, 8)),
                                  np.arange(104))


def test_pick_bucket():
    assert pick_bucket(5, (8, 16)) == 8
    assert pick_bucket(16, (8, 16)) == 16
    assert pick_bucket(17, (8, 16)) == 24  # next multiple of 8


def test_dataset_utils_roundtrip():
    from chemeleon_tpu.chem.lattice import lattice_from_parameters
    from chemeleon_tpu.chem.structure import Crystal
    from chemeleon_tpu.data.dataset_utils import (
        batch_to_crystal_list,
        convert_reduced_composition,
        crystals_to_batch,
    )
    rng = np.random.default_rng(0)
    crystals = [Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                        rng.uniform(size=(n, 3)), rng.integers(1, 20, n))
                for n in (3, 5)]
    batch = crystals_to_batch(crystals, n_max=8)
    back = batch_to_crystal_list(batch)
    for a, b in zip(crystals, back):
        np.testing.assert_array_equal(a.atom_types, b.atom_types)
        np.testing.assert_allclose(a.frac_coords % 1.0, b.frac_coords,
                                   atol=1e-6)
    assert convert_reduced_composition("Li2O3Mn2") == "Li2 Mn2 O3"


def test_radius_graph_pbc_hub_overflow_stays_symmetric():
    """A hub atom selected by more than K neighbors overflows its 2K slots;
    overflowing edges must be dropped in BOTH directions, never leaving a
    one-directional edge (regression: the second top-k silently truncated
    only the hub's side)."""
    rng = np.random.default_rng(1)
    n = 14
    # 13 atoms clustered around a center atom in a roomy cell
    frac = np.full((n, 3), 0.5)
    frac[1:] += rng.uniform(-0.08, 0.08, size=(n - 1, 3))
    lat = jnp.eye(3)[None] * 12.0
    mask = jnp.ones((1, n), bool)
    K = 3
    nbr_j, nbr_img, nbr_mask, _ = radius_graph_pbc(
        jnp.asarray(frac[None], jnp.float32), lat, mask,
        cutoff=4.0, max_neighbors=K)
    C = 27
    edges = set()
    valid = np.asarray(nbr_mask)
    js, imgs = np.asarray(nbr_j), np.asarray(nbr_img)
    for i in range(n):
        for k in range(valid.shape[-1]):
            if valid[0, i, k]:
                edges.add((i, int(js[0, i, k]), int(imgs[0, i, k])))
    assert edges, "no edges found"
    missing = [(i, j, c) for (i, j, c) in edges
               if (j, i, C - 1 - c) not in edges]
    assert not missing, missing


def test_radius_graph_pbc_degenerate_ties_stay_symmetric():
    """Exact distance ties spanning the K and 2K boundaries (symmetric
    crystals hit this constantly): the scatter-free threshold selection
    expands the tie class past K, and the stable-tie-break boundary-index
    rule must still never leave a one-directional edge."""
    # 2x2x2 simple-cubic grid in a cubic cell: every atom has 6 axis
    # neighbors at EXACTLY a/2, all distances degenerate
    grid = np.stack(np.meshgrid(*([np.array([0.25, 0.75])] * 3),
                                indexing="ij"), -1).reshape(-1, 3)
    lat = jnp.eye(3)[None] * 4.0
    mask = jnp.ones((1, 8), bool)
    for K in (2, 3, 6):
        nbr_j, nbr_img, nbr_mask, _ = radius_graph_pbc(
            jnp.asarray(grid[None], jnp.float32), lat, mask,
            cutoff=2.5, max_neighbors=K)
        C = 27
        edges = set()
        valid = np.asarray(nbr_mask)
        js, imgs = np.asarray(nbr_j), np.asarray(nbr_img)
        for i in range(8):
            for k in range(valid.shape[-1]):
                if valid[0, i, k]:
                    edges.add((i, int(js[0, i, k]), int(imgs[0, i, k])))
        assert edges, f"no edges at K={K}"
        missing = [(i, j, c) for (i, j, c) in edges
                   if (j, i, C - 1 - c) not in edges]
        assert not missing, (K, missing)
        # per-atom slot budget is respected
        assert valid.sum(-1).max() <= 2 * K
