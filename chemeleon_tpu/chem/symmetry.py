"""Space-group symmetry detection: crystal system with spglib semantics.

Standalone replacement for the pymatgen SpacegroupAnalyzer(symprec=0.1)
usage in the reference evaluation (reference evaluate.py:231-249 classifies
generated vs ground-truth structures by crystal system). The environment has
no spglib/pymatgen, so this implements the standard detection algorithm:

1. Niggli-reduce the cell (chem/lattice.py). For a reduced cell every
   lattice point-group rotation has an integer matrix with entries in
   {-1, 0, 1} in the lattice basis, so the candidate set is finite.
2. Lattice point group: all integer W with det ±1 preserving the metric
   tensor, ``W^T G W == G`` within tolerance (G = M M^T).
3. Space-group operations: for each lattice rotation W, search translations
   w = x_j - W x_i over same-species atom pairs and keep (W, w) iff every
   atom maps onto a same-species atom within ``symprec`` (Cartesian
   distance, periodic) — spglib's symprec semantics.
4. Crystal system from the surviving rotation types (det/trace table):
   cubic (four 3-fold axes = 8 order-3 rotations), hexagonal (6 or -6),
   trigonal (3 or -3), tetragonal (4 or -4), orthorhombic (>= 3 two-folds /
   mirrors), monoclinic (>= 1), else triclinic.

The lattice-parameter classifier in chem/lattice.py remains the cheap
fallback; this module is the metrically-faithful default for evaluation.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from chemeleon_tpu.chem.lattice import niggli_reduce

_CANDIDATE_ROTATIONS: np.ndarray | None = None


def _candidate_rotations() -> np.ndarray:
    """All 3x3 integer matrices with entries in {-1,0,1} and det = ±1,
    [K, 3, 3]. Computed once (3^9 = 19683 candidates -> 3480 unimodular)."""
    global _CANDIDATE_ROTATIONS
    if _CANDIDATE_ROTATIONS is None:
        vals = np.array([-1, 0, 1], dtype=np.int64)
        grids = np.meshgrid(*([vals] * 9), indexing="ij")
        flat = np.stack([g.ravel() for g in grids], axis=1)  # [19683, 9]
        mats = flat.reshape(-1, 3, 3)
        dets = np.linalg.det(mats.astype(np.float64))
        _CANDIDATE_ROTATIONS = mats[np.abs(np.abs(dets) - 1.0) < 0.5]
    return _CANDIDATE_ROTATIONS


def lattice_point_group(matrix: np.ndarray,
                        symprec: float = 0.1) -> np.ndarray:
    """Integer rotations (in the lattice basis of ``matrix``) preserving the
    metric tensor within the symprec-derived tolerance. [K, 3, 3]."""
    m = np.asarray(matrix, np.float64)
    G = m @ m.T
    cands = _candidate_rotations().astype(np.float64)
    # W^T G W for all candidates at once: [K,3,3] @ [3,3] @ [K,3,3]
    GW = np.swapaxes(cands, 1, 2) @ G @ cands
    # tolerance: a symprec displacement on a cell-length scale perturbs the
    # metric by ~ 2 * length * symprec
    lengths = np.linalg.norm(m, axis=1)
    tol = 2.0 * float(lengths.max()) * symprec
    keep = np.abs(GW - G).max(axis=(1, 2)) <= tol
    return _candidate_rotations()[keep]


def _to_niggli_frame(lattice: np.ndarray, frac: np.ndarray):
    """Niggli cell + fractional coords re-expressed in it."""
    red = niggli_reduce(np.asarray(lattice, np.float64))
    # cart = frac @ lattice = frac' @ red  =>  frac' = frac @ lattice @ inv(red)
    frac_red = np.asarray(frac, np.float64) @ np.asarray(lattice, np.float64) \
        @ np.linalg.inv(red)
    return red, frac_red % 1.0


def find_symmetry_operations(crystal, symprec: float = 0.1
                             ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Space-group operations [(W 3x3 int, w 3-vector frac)] of a Crystal,
    expressed in its Niggli-reduced basis."""
    lat, frac = _to_niggli_frame(crystal.lattice, crystal.frac_coords)
    types = np.asarray(crystal.atom_types)
    n = len(types)
    if n == 0:
        return []
    rotations = lattice_point_group(lat, symprec)

    # rarest species anchors the translation search
    uniq, counts = np.unique(types, return_counts=True)
    anchor_type = uniq[np.argmin(counts)]
    anchor_idx = np.where(types == anchor_type)[0]
    i0 = anchor_idx[0]

    ops: List[Tuple[np.ndarray, np.ndarray]] = []
    for W in rotations:
        Wf = W.astype(np.float64)
        rx = frac @ Wf.T  # [n, 3] rotated coords (rows)
        found = None
        for j in anchor_idx:
            w = (frac[j] - rx[i0]) % 1.0
            # image of every atom under (W, w)
            img = (rx + w) % 1.0
            # match each image to a same-species atom within symprec (Cart)
            d = img[:, None, :] - frac[None, :, :]
            d -= np.round(d)
            cart = d @ lat
            dist = np.linalg.norm(cart, axis=-1)  # [n, n]
            dist = np.where(types[None, :] == types[:, None], dist, np.inf)
            # fast reject, then require a true one-to-one site mapping —
            # min-distance alone would let near-coincident same-species
            # atoms (degenerate generated cells) validate fake symmetries
            if np.all(dist.min(axis=1) <= symprec) and \
                    _has_bijection(dist, symprec):
                found = w
                break
        if found is not None:
            ops.append((W.astype(np.int64), found))
    return ops


def _has_bijection(dist: np.ndarray, symprec: float) -> bool:
    """True iff a perfect one-to-one matching exists with all pair
    distances <= symprec."""
    nearest = dist.argmin(axis=1)
    if len(set(nearest.tolist())) == len(nearest):
        return True  # nearest-neighbor map is already a permutation
    # existence of a perfect matching in the boolean graph dist <= symprec:
    # augmenting-path bipartite matching (exact; greedy min-picking can
    # wrongly reject — it may lock a pair whose row has the only alternative)
    ok = dist <= symprec
    n = len(ok)
    match_col = [-1] * n  # column j -> matched row

    def _augment(i: int, seen: List[bool]) -> bool:
        for j in range(n):
            if ok[i, j] and not seen[j]:
                seen[j] = True
                if match_col[j] < 0 or _augment(match_col[j], seen):
                    match_col[j] = i
                    return True
        return False

    return all(_augment(i, [False] * n) for i in range(n))


_ROT_TYPE = {  # (det, trace) -> rotation type label
    (1, 3): "1", (1, -1): "2", (1, 0): "3", (1, 1): "4", (1, 2): "6",
    (-1, -3): "-1", (-1, 1): "m", (-1, 0): "-3", (-1, -1): "-4",
    (-1, -2): "-6",
}


def crystal_system(crystal, symprec: float = 0.1) -> str:
    """Crystal system with SpacegroupAnalyzer.get_crystal_system semantics
    (reference evaluate.py:231-249): derived from the detected space-group
    operations, not from cell parameters."""
    ops = find_symmetry_operations(crystal, symprec)
    kinds = []
    for W, _ in ops:
        det = int(round(np.linalg.det(W.astype(np.float64))))
        tr = int(np.trace(W))
        kinds.append(_ROT_TYPE.get((det, tr), "?"))
    n3 = sum(k in ("3", "-3") for k in kinds)
    n6 = sum(k in ("6", "-6") for k in kinds)
    n4 = sum(k in ("4", "-4") for k in kinds)
    n2 = sum(k in ("2", "m") for k in kinds)
    if n3 >= 8:  # four 3-fold axes (2 nontrivial rotations each)
        return "cubic"
    if n6 > 0:
        return "hexagonal"
    if n3 > 0:
        return "trigonal"
    if n4 > 0:
        return "tetragonal"
    if n2 >= 3:
        return "orthorhombic"
    if n2 >= 1:
        return "monoclinic"
    return "triclinic"


def spacegroup_size(crystal, symprec: float = 0.1) -> int:
    """Number of space-group operations (order of the factor group)."""
    return len(find_symmetry_operations(crystal, symprec))


def find_pure_translations(crystal, symprec: float = 0.1) -> np.ndarray:
    """Fractional translations t (including 0) that map the structure onto
    itself within ``symprec`` (Cartesian Å, periodic). [K, 3].

    These are the W = identity space-group operations; K > 1 means the cell
    is a K-fold supercell of a smaller primitive cell."""
    frac = np.asarray(crystal.frac_coords, np.float64) % 1.0
    lat = np.asarray(crystal.lattice, np.float64)
    types = np.asarray(crystal.atom_types)
    n = len(types)
    if n == 0:
        return np.zeros((1, 3))

    uniq, counts = np.unique(types, return_counts=True)
    anchor_type = uniq[np.argmin(counts)]
    anchor_idx = np.where(types == anchor_type)[0]
    i0 = anchor_idx[0]

    found = [np.zeros(3)]
    for j in anchor_idx:
        if j == i0:
            continue
        t = (frac[j] - frac[i0]) % 1.0
        img = (frac + t) % 1.0
        d = img[:, None, :] - frac[None, :, :]
        d -= np.round(d)
        dist = np.linalg.norm(d @ lat, axis=-1)
        dist = np.where(types[None, :] == types[:, None], dist, np.inf)
        if np.all(dist.min(axis=1) <= symprec) and \
                _has_bijection(dist, symprec):
            found.append(t)
    return np.asarray(found)


def primitive_structure(crystal, symprec: float = 0.1):
    """Smallest-cell description of the same crystal (pymatgen
    ``Structure.get_primitive_structure`` semantics, used implicitly by the
    reference's StructureMatcher(primitive_cell=True), evaluate.py:198-204).

    Finds the pure translations, builds the minimal-volume cell they span
    (together with the current basis vectors), re-expresses the sites in it
    and deduplicates. Returns the input unchanged when already primitive or
    when the detected translations are inconsistent (noisy near-symmetric
    cells)."""
    from chemeleon_tpu.chem.structure import Crystal

    trans = find_pure_translations(crystal, symprec)
    k = len(trans)
    if k <= 1:
        return crystal

    # candidate primitive basis vectors, in the current fractional basis
    import itertools as _it
    cands = np.concatenate([trans[1:], np.eye(3)], axis=0)
    target = 1.0 / k
    best = None
    for tri in _it.combinations(range(len(cands)), 3):
        det = abs(np.linalg.det(cands[list(tri)]))
        if abs(det - target) < 0.05 * target:
            best = cands[list(tri)]
            break
    if best is None:
        return crystal  # translations do not close into a k-fold sublattice

    lat = np.asarray(crystal.lattice, np.float64)
    new_lat = best @ lat
    frac = np.asarray(crystal.frac_coords, np.float64)
    new_frac = (frac @ lat @ np.linalg.inv(new_lat)) % 1.0
    types = np.asarray(crystal.atom_types)

    # deduplicate sites that fold onto each other in the small cell
    keep_idx: List[int] = []
    for i in range(len(types)):
        dup = False
        for j in keep_idx:
            if types[i] != types[j]:
                continue
            d = new_frac[i] - new_frac[j]
            d -= np.round(d)
            if np.linalg.norm(d @ new_lat) <= symprec:
                dup = True
                break
        if not dup:
            keep_idx.append(i)
    if len(keep_idx) * k != len(types):
        return crystal  # inconsistent folding — refuse to guess

    try:
        red_lat = niggli_reduce(new_lat)
    except ValueError:
        # non-convergent Niggli on a degenerate derived cell: keep the
        # unreduced primitive basis rather than crashing the caller (the
        # other niggli_reduce call sites guard the same way)
        red_lat = new_lat
    red_frac = (new_frac[keep_idx] @ new_lat @ np.linalg.inv(red_lat)) % 1.0
    return Crystal(lattice=red_lat.astype(np.float64),
                   frac_coords=red_frac,
                   atom_types=types[keep_idx].copy())
