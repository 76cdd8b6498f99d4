"""Chemistry core tests: lattice math, Niggli, CIF roundtrip, composition,
matcher, validity — including a roundtrip over real mp-40 test CIFs when the
reference dataset is present."""

import csv
import os
from pathlib import Path

import numpy as np
import pytest

from chemeleon_tpu.chem.cif import parse_cif, write_cif
from chemeleon_tpu.chem.composition import (
    parse_composition,
    reduced_formula_alphabetical,
)
from chemeleon_tpu.chem.lattice import (
    canonicalize_lattice,
    lattice_from_parameters,
    lattice_parameters,
    lattice_system,
    niggli_reduce,
    volume,
)
from chemeleon_tpu.chem.matcher import StructureMatcher
from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.chem.validity import smact_validity, structure_validity

MP40_TEST = str(Path(__file__).resolve().parent.parent
                / "data" / "mp-40" / "test.csv")


def test_lattice_from_parameters_zero_pattern():
    m = lattice_from_parameters(4.0, 5.0, 6.0, 80.0, 95.0, 103.0)
    assert m[0, 1] == 0 and m[2, 0] == 0 and m[2, 1] == 0
    a, b, c, al, be, ga = lattice_parameters(m)
    np.testing.assert_allclose([a, b, c, al, be, ga],
                               [4, 5, 6, 80, 95, 103], atol=1e-8)


def test_canonicalize_preserves_params():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((3, 3)) * 3 + np.eye(3) * 5
    m2 = canonicalize_lattice(m)
    np.testing.assert_allclose(lattice_parameters(m), lattice_parameters(m2),
                               atol=1e-6)
    np.testing.assert_allclose(volume(m), volume(m2), rtol=1e-8)


def test_niggli_reduce_known_case():
    # a skewed description of a simple cubic lattice reduces back to cubic
    cubic = np.eye(3) * 4.0
    skew = cubic.copy()
    skew[2] = skew[2] + 2 * skew[0] + skew[1]  # unimodular shear
    red = niggli_reduce(skew)
    np.testing.assert_allclose(volume(red), volume(cubic), rtol=1e-9)
    a, b, c, al, be, ga = lattice_parameters(red)
    np.testing.assert_allclose(sorted([a, b, c]), [4, 4, 4], atol=1e-6)
    np.testing.assert_allclose(sorted([al, be, ga]), [90, 90, 90], atol=1e-4)


def test_niggli_reduce_is_stable_on_reduced_cell():
    m = lattice_from_parameters(3.0, 4.0, 5.0, 90, 90, 90)
    red = niggli_reduce(m)
    red2 = niggli_reduce(red)
    np.testing.assert_allclose(np.abs(np.linalg.det(red2)),
                               np.abs(np.linalg.det(m)), rtol=1e-9)


def test_lattice_system_classification():
    cases = [
        ((4, 4, 4, 90, 90, 90), "cubic"),
        ((4, 4, 6, 90, 90, 90), "tetragonal"),
        ((4, 5, 6, 90, 90, 90), "orthorhombic"),
        ((4, 4, 6, 90, 90, 120), "hexagonal"),
        ((4, 4, 4, 70, 70, 70), "rhombohedral"),
        ((4, 5, 6, 90, 100, 90), "monoclinic"),
        ((4, 5, 6, 85, 95, 100), "triclinic"),
    ]
    for params, want in cases:
        m = lattice_from_parameters(*params)
        assert lattice_system(m) == want, (params, want, lattice_system(m))


def test_cif_roundtrip():
    c = Crystal(lattice_from_parameters(4, 5, 6, 90, 95, 90),
                [[0.1, 0.2, 0.3], [0.6, 0.7, 0.8]], [22, 8])
    text = write_cif(c)
    c2 = parse_cif(text)
    assert sorted(c2.atom_types.tolist()) == [8, 22]
    np.testing.assert_allclose(sorted(np.asarray(c2.lattice_params)),
                               sorted(np.asarray(c.lattice_params)), atol=1e-6)


@pytest.mark.skipif(not os.path.exists(MP40_TEST),
                    reason="mp-40 reference dataset not present")
def test_parse_real_mp40_cifs():
    csv.field_size_limit(10 ** 9)
    with open(MP40_TEST) as f:
        rows = [r for _, r in zip(range(20), csv.DictReader(f))]
    for row in rows:
        c = parse_cif(row["cif"])
        assert 0 < len(c) <= 40
        # composition column matches parsed structure
        want = reduced_formula_alphabetical(row["composition"])
        assert c.reduced_formula() == want, (want, c.reduced_formula())
        # volume column matches cell volume
        np.testing.assert_allclose(c.volume, float(row["volume"]), rtol=1e-3)


def test_parse_composition():
    assert parse_composition("LiMnO4") == {"Li": 1, "Mn": 1, "O": 4}
    assert parse_composition("Ca(OH)2") == {"Ca": 1, "O": 2, "H": 2}
    assert reduced_formula_alphabetical("Ba2Ti2O6") == "BaO3Ti"


def test_structure_matcher_identity_and_shift():
    lat = lattice_from_parameters(4, 5, 6, 90, 90, 90)
    coords = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.25, 0.5, 0.75]])
    types = [22, 8, 8]
    s1 = Crystal(lat, coords, types)
    # translated + permuted copy
    s2 = Crystal(lat, np.roll((coords + 0.31) % 1.0, 1, axis=0),
                 np.roll(types, 1))
    m = StructureMatcher()
    assert m.fit(s1, s2)
    # moderate distortion: after the pymatgen-style translation
    # optimization this sits at rms/norm ~= 0.26 < stol=0.3, so the
    # calibrated matcher accepts it (results/matcher_calibration.json)
    s3 = Crystal(lat, (coords + np.array([[0, 0, 0], [0.3, 0.2, 0.1],
                                          [0, 0.3, 0]])) % 1.0, types)
    assert m.fit(s1, s3)
    # genuinely different structures: rock-salt vs zinc-blende-like anion
    # sublattice (same lattice + composition, anion sublattice shifted by
    # (1/4,1/4,1/4) — no translation/basis can align them within stol)
    clat = lattice_from_parameters(4.1, 4.1, 4.1, 90, 90, 90)
    fcc = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    ts8 = [11] * 4 + [17] * 4
    rs = Crystal(clat, np.concatenate([fcc, (fcc + 0.5) % 1.0]), ts8)
    zb = Crystal(clat, np.concatenate([fcc, (fcc + 0.25) % 1.0]), ts8)
    assert not m.fit(rs, zb)
    # different composition
    s4 = Crystal(lat, coords, [22, 8, 16])
    assert not m.fit(s1, s4)


def test_structure_matcher_formula_units():
    """Conventional-vs-primitive matching: an MP ground truth folds to its
    primitive cell while a noisy generated conventional cell does not;
    HNF supercell (formula-unit) matching must still match them."""
    rng = np.random.default_rng(3)
    lat = lattice_from_parameters(4.1, 4.1, 4.1, 90, 90, 90)
    # rock-salt conventional cell: 4 Na + 4 Cl
    na = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cl = (na + 0.5) % 1.0
    coords = np.concatenate([na, cl])
    types = [11] * 4 + [17] * 4
    gt = Crystal(lat, coords, types)          # folds to 2-atom primitive
    noisy = Crystal(lat, (coords + rng.normal(0, 0.02, coords.shape)) % 1.0,
                    types)                    # does not fold exactly
    m = StructureMatcher()
    assert m.fit(gt, noisy)
    # and both python + native backends agree
    assert StructureMatcher(backend="python").fit(gt, noisy)


def test_structure_matcher_grouping():
    lat = lattice_from_parameters(4, 4, 4, 90, 90, 90)
    a = Crystal(lat, [[0, 0, 0], [0.5, 0.5, 0.5]], [11, 17])
    b = Crystal(lat, [[0.2, 0.2, 0.2], [0.7, 0.7, 0.7]], [11, 17])  # = a + shift
    c = Crystal(lat, [[0, 0, 0], [0.5, 0.0, 0.0]], [11, 17])
    groups = StructureMatcher().group_structures([a, b, c])
    sizes = sorted(len(g) for g in groups)
    assert sizes == [1, 2]


def test_smact_validity():
    assert smact_validity({"Na": 1, "Cl": 1})
    assert smact_validity({"Ti": 1, "O": 2})
    assert smact_validity({"Li": 1, "Mn": 1, "O": 4})  # Mn+7 exists
    assert not smact_validity({"Na": 1, "Cl": 3})
    assert smact_validity({"Fe": 1, "Ni": 1})  # alloy path


def test_structure_validity():
    lat = lattice_from_parameters(4, 4, 4, 90, 90, 90)
    good = Crystal(lat, [[0, 0, 0], [0.5, 0.5, 0.5]], [11, 17])
    assert structure_validity(good)
    tight = Crystal(lat, [[0, 0, 0], [0.05, 0, 0]], [11, 17])
    assert not structure_validity(tight)
    huge = Crystal(lattice_from_parameters(70, 4, 4, 90, 90, 90),
                   [[0, 0, 0]], [11])
    assert not structure_validity(huge)
    # single atom 0.4 A from its own periodic image is invalid too
    # (min_pair_distance covers self-images; no n>1 exemption)
    thin = Crystal(lattice_from_parameters(0.4, 10, 10, 90, 90, 90),
                   [[0, 0, 0]], [11])
    assert not structure_validity(thin)


def test_min_pair_distance_skewed_cell():
    """A +-1 image search is only exact on a reduced basis: this sheared
    cell's nearest image needs offset -2 in the raw basis (a' = a, b' with
    b'_x = 1.9 a), so distances must be computed in the Niggli frame."""
    a = 2.0
    lat = np.array([[a, 0.0, 0.0],
                    [1.9 * a, 3.0, 0.0],
                    [0.0, 0.0, 9.0]])
    st = Crystal(lat, [[0.0, 0.0, 0.0], [0.5, 0.5, 0.0]], [11, 17])
    # brute force over a wide image set as ground truth
    cart = st.cart_coords
    best = np.inf
    for i in range(-4, 5):
        for j in range(-4, 5):
            for k in range(-4, 5):
                img = np.array([i, j, k], float) @ lat
                d = np.linalg.norm(cart[1] + img - cart[0])
                best = min(best, d)
    assert st.min_pair_distance() == pytest.approx(best, abs=1e-6)


def test_parse_cif_with_symmetry_ops():
    """Non-P1 CIF: sites expand through the symmetry operations with
    deduplication of coincident positions."""
    cif = """
data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
 _symmetry_equiv_pos_site_id
 _symmetry_equiv_pos_as_xyz
  1  'x, y, z'
  2  '-x, -y, -z'
  3  'x+1/2, y+1/2, z'
  4  '-x+1/2, -y+1/2, -z'
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
  Na  Na0  0.1  0.2  0.3
"""
    c = parse_cif(cif)
    assert len(c) == 4  # orbit of a general position under 4 ops
    assert set(c.atom_types.tolist()) == {11}
    got = sorted(tuple(np.round(x, 4)) for x in c.frac_coords)
    want = sorted([(0.1, 0.2, 0.3), (0.9, 0.8, 0.7),
                   (0.6, 0.7, 0.3), (0.4, 0.3, 0.7)])
    assert got == want


def test_parse_cif_special_position_dedup():
    cif = """
data_t
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
 _symmetry_equiv_pos_site_id
 _symmetry_equiv_pos_as_xyz
  1  'x, y, z'
  2  '-x, -y, -z'
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
  Fe  Fe0  0.0  0.0  0.0
"""
    c = parse_cif(cif)
    assert len(c) == 1  # special position maps to itself


def test_structure_matcher_single_outlier_site():
    """pymatgen fit() semantics (use_rms=False): acceptance is on the MAX
    normalized per-site displacement, so ONE site beyond stol*norm fails
    the match even when the rms stays well under stol; a single site just
    inside stol*norm passes. get_rms_dist keeps the rms (use_rms=True), so
    rms <= stol does NOT imply fit() — both backends must agree."""
    rng = np.random.default_rng(0)
    lat = lattice_from_parameters(5, 5, 5, 90, 90, 90)
    n = 12
    coords = rng.uniform(size=(n, 3))
    types = [8] * 6 + [22] * 6
    gt = Crystal(lat, coords, types)
    m = StructureMatcher()
    norm = (gt.volume / n) ** (1 / 3)
    for f, expect in ((0.9, True), (1.2, False), (2.5, False)):
        d_frac = (np.array([f * m.stol * norm, 0, 0])
                  @ np.linalg.inv(lat))
        c2 = coords.copy()
        c2[5] = (c2[5] + d_frac) % 1.0     # a non-anchor site
        s2 = Crystal(lat, c2, types)
        assert StructureMatcher(backend="python").fit(gt, s2) == expect
        assert StructureMatcher(backend="native").fit(gt, s2) == expect
        # rms divergence: one outlier at 2.5*stol*norm keeps the rms under
        # stol at n=12 (rms = 2.5*stol/sqrt(12) ≈ 0.72*stol) yet fit()=False
        if f == 2.5:
            rms = m.get_rms_dist(gt, s2)
            assert rms <= m.stol and not m.fit(gt, s2)
