"""Space-group symmetry detection (chem/symmetry.py): known structures,
spglib-semantics invariants, and agreement with the mp-40 ground-truth
crystal_system labels (the reference's SpacegroupAnalyzer(symprec=0.1)
protocol, evaluate.py:231-249)."""

import csv
import os
from pathlib import Path

import numpy as np
import pytest

from chemeleon_tpu.chem.lattice import lattice_from_parameters
from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.chem.symmetry import (
    crystal_system,
    find_symmetry_operations,
    lattice_point_group,
    spacegroup_size,
)

MP40_TEST = str(Path(__file__).resolve().parent.parent
                / "data" / "mp-40" / "test.csv")


def _crystal(a, b, c, al, be, ga, frac, types):
    lat = lattice_from_parameters(a, b, c, al, be, ga)
    return Crystal(lat, np.asarray(frac, float), np.asarray(types, int))


def test_cubic_cscl():
    c = _crystal(4, 4, 4, 90, 90, 90,
                 [[0, 0, 0], [0.5, 0.5, 0.5]], [55, 17])
    assert crystal_system(c) == "cubic"
    # Pm-3m with 2 inequivalent sites: full 48-op point group survives
    assert spacegroup_size(c) == 48


def test_cubic_perovskite():
    c = _crystal(3.9, 3.9, 3.9, 90, 90, 90,
                 [[0, 0, 0], [0.5, 0.5, 0.5],
                  [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
                 [38, 22, 8, 8, 8])  # SrTiO3
    assert crystal_system(c) == "cubic"


def test_tetragonal():
    c = _crystal(4, 4, 6, 90, 90, 90, [[0, 0, 0]], [22])
    assert crystal_system(c) == "tetragonal"


def test_orthorhombic():
    c = _crystal(4, 5, 6, 90, 90, 90, [[0, 0, 0]], [22])
    assert crystal_system(c) == "orthorhombic"


def test_hexagonal_graphite_layer():
    c = _crystal(2.46, 2.46, 6.7, 90, 90, 120,
                 [[1 / 3, 2 / 3, 0.25], [2 / 3, 1 / 3, 0.75]], [6, 6])
    assert crystal_system(c) == "hexagonal"


def test_monoclinic():
    c = _crystal(4, 5, 6, 90, 101, 90,
                 [[0, 0, 0], [0.3, 0.5, 0.2], [0.7, 0.5, 0.8]],
                 [22, 8, 8])
    assert crystal_system(c) == "monoclinic"


def test_triclinic():
    c = _crystal(4.1, 5.3, 6.7, 77, 101, 93,
                 [[0, 0, 0], [0.13, 0.46, 0.27]], [22, 8])
    assert crystal_system(c) == "triclinic"


def test_broken_symmetry_is_detected():
    """Displacing one atom beyond symprec must drop the system from cubic."""
    base = [[0, 0, 0], [0.5, 0.5, 0.5]]
    c_ok = _crystal(4, 4, 4, 90, 90, 90, base, [55, 17])
    assert crystal_system(c_ok, symprec=0.1) == "cubic"
    bad = [[0, 0, 0], [0.55, 0.5, 0.5]]  # 0.2 A shift > symprec
    c_bad = _crystal(4, 4, 4, 90, 90, 90, bad, [55, 17])
    assert crystal_system(c_bad, symprec=0.01) != "cubic"


def test_symprec_tolerance_forgives_small_rattle():
    """Sub-symprec displacements keep the ideal classification — the point
    of symprec=0.1 on model-generated (imperfect) structures."""
    rng = np.random.default_rng(0)
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0.5]], float)
    frac = frac + rng.uniform(-0.004, 0.004, frac.shape)  # ~0.016 A @ a=4
    c = _crystal(4, 4, 4, 90, 90, 90, frac, [55, 17])
    assert crystal_system(c, symprec=0.1) == "cubic"


def test_ops_form_closed_set_identity_present():
    c = _crystal(4, 4, 4, 90, 90, 90,
                 [[0, 0, 0], [0.5, 0.5, 0.5]], [55, 17])
    ops = find_symmetry_operations(c)
    mats = {tuple(W.ravel()) for W, _ in ops}
    assert tuple(np.eye(3, dtype=np.int64).ravel()) in mats
    # closure under composition (rotation parts form a group)
    for Wa, _ in ops:
        for Wb, _ in ops:
            assert tuple((Wa @ Wb).ravel()) in mats


def test_near_coincident_atoms_do_not_fake_symmetry():
    """Two same-species atoms closer than symprec must not let a rotation
    validate via a many-to-one site mapping (the op must be a bijection)."""
    # one Ti at origin + an O pair almost on top of each other at a
    # low-symmetry position: any op mapping both O images onto the SAME
    # O atom would wrongly pass a min-distance-only check
    c = _crystal(4, 4, 4, 90, 90, 90,
                 [[0, 0, 0], [0.31, 0.17, 0.05], [0.325, 0.17, 0.05]],
                 [22, 8, 8])
    ops = find_symmetry_operations(c, symprec=0.1)
    for W, w in ops:
        img = (np.asarray(c.frac_coords) @ W.T + w) % 1.0
        d = img[:, None, :] - np.asarray(c.frac_coords)[None, :, :]
        d -= np.round(d)
        dist = np.linalg.norm(d @ c.lattice, axis=-1)
        nearest = dist.argmin(axis=1)
        # mapping restricted to same species must be injective
        assert len(set(nearest.tolist())) == len(nearest), (W, w)


def test_lattice_point_group_counts():
    cub = lattice_from_parameters(4, 4, 4, 90, 90, 90)
    assert len(lattice_point_group(cub, 0.01)) == 48
    tri = lattice_from_parameters(4.1, 5.3, 6.7, 77, 101, 93)
    assert len(lattice_point_group(tri, 0.01)) == 2  # identity + inversion


@pytest.mark.skipif(not os.path.exists(MP40_TEST),
                    reason="mp-40 dataset not present")
def test_mp40_ground_truth_agreement():
    """>= 97% agreement with the Materials Project crystal_system labels on
    the first 150 mp-40 rows (the geometric classifier gets ~63%)."""
    from chemeleon_tpu.chem.cif import parse_cif
    csv.field_size_limit(10 ** 9)
    with open(MP40_TEST) as f:
        rows = [r for _, r in zip(range(150), csv.DictReader(f))]
    ok = sum(crystal_system(parse_cif(r["cif"]), 0.1)
             == r["crystal_system"].lower() for r in rows)
    assert ok / len(rows) >= 0.97


# -- primitive-cell reduction -------------------------------------------------

def _supercell_2x(crystal, axis=0):
    """2x supercell of a Crystal along one lattice vector."""
    scale = np.ones(3)
    scale[axis] = 2.0
    new_lat = crystal.lattice * scale[:, None]
    f = crystal.frac_coords / scale[None, :]
    shift = np.zeros(3)
    shift[axis] = 0.5
    frac = np.concatenate([f, (f + shift) % 1.0], axis=0)
    types = np.concatenate([crystal.atom_types, crystal.atom_types])
    return Crystal(new_lat, frac, types)


def test_primitive_of_conventional_rocksalt():
    """Conventional NaCl (8 atoms, fcc centering) -> 2-atom primitive cell
    at 1/4 the volume (pymatgen get_primitive_structure semantics)."""
    from chemeleon_tpu.chem.symmetry import primitive_structure

    a = 5.64
    na = [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    cl = [[0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]]
    conv = Crystal(np.eye(3) * a, np.asarray(na + cl, float),
                   [11] * 4 + [17] * 4)
    prim = primitive_structure(conv)
    assert len(prim) == 2
    assert sorted(prim.atom_types.tolist()) == [11, 17]
    assert np.isclose(prim.volume, conv.volume / 4.0, rtol=1e-6)


def test_primitive_noop_when_already_primitive():
    from chemeleon_tpu.chem.symmetry import primitive_structure

    c = _crystal(4, 4, 4, 90, 90, 90,
                 [[0, 0, 0], [0.5, 0.5, 0.5]], [55, 17])
    assert primitive_structure(c) is c


def test_primitive_recovers_cell_from_supercell():
    """2x1x1 supercell of a generic 3-atom cell folds back to 3 atoms and
    matches the original under the StructureMatcher."""
    from chemeleon_tpu.chem.matcher import StructureMatcher
    from chemeleon_tpu.chem.symmetry import primitive_structure

    base = _crystal(4, 5, 6, 90, 90, 90,
                    [[0.1, 0.2, 0.3], [0.6, 0.4, 0.8], [0.9, 0.9, 0.1]],
                    [22, 8, 8])
    sup = _supercell_2x(base, axis=1)
    assert len(sup) == 6
    prim = primitive_structure(sup)
    assert len(prim) == 3
    assert np.isclose(prim.volume, base.volume, rtol=1e-6)
    assert StructureMatcher().fit(prim, base)


def test_matcher_matches_supercell_pairs_iff_primitive_cell():
    """primitive_cell=True (the upstream default) lets a cell match its own
    2x supercell; primitive_cell=False keeps them distinct."""
    from chemeleon_tpu.chem.matcher import StructureMatcher

    base = _crystal(4, 5, 6, 90, 90, 90,
                    [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.25, 0.5, 0.75]],
                    [22, 8, 8])
    sup = _supercell_2x(base, axis=2)
    assert StructureMatcher(primitive_cell=True).fit(base, sup)
    assert not StructureMatcher(primitive_cell=False).fit(base, sup)
    groups = StructureMatcher().group_structures([base, sup])
    assert len(groups) == 1
