"""International space-group identification (number + symbol).

Closes the symmetry-identification gap left by chem/symmetry.py, which stops
at the crystal system: the reference's data pipeline labels every row with
pymatgen's ``SpacegroupAnalyzer.get_space_group_symbol()/number()``
(reference data/mp-40/data_preparation.ipynb; the columns ship in
data/mp-40/test.csv), and prepare_dataset.py needs the same columns offline.

No spglib/pymatgen exists in this image, and hand-entering the 230 groups'
generator tables is silent-error-prone, so identification is split into two
verifiable halves:

1. **Invariant fingerprint (this module, analytic).** From the space-group
   operations detected by chem/symmetry.py on the *primitive* cell:

   - Cartesian rotation type of every op (1,2,3,4,6,-1,m,-3,-4,-6 from the
     det/trace table — basis-independent),
   - a deterministic right-handed *conventional basis* built from the
     symmetry axes (the same construction every crystallography code uses:
     c along the main rotation axis, a/b along secondary axes or shortest
     perpendicular lattice vectors),
   - the centering set (P/A/B/C/I/F/R) = primitive lattice points expressed
     in that conventional basis,
   - each operation's *intrinsic* (origin-independent) translation
     t = (1/k) sum_j W^j w mod 1 — zero for rotations/mirrors, 1/2, 1/3,
     2/3, 1/4, 3/4 ... for screws/glides — plus its axis direction in the
     conventional basis.

   The encoded multiset of (type, axis, intrinsic translation), minimised
   over the proper relabelings of the conventional axes, is an invariant of
   the space-group *type* (enantiomorphic pairs stay distinct because only
   det=+1 relabelings are allowed and the basis is always right-handed).

2. **Fingerprint -> (number, symbol) table (calibrated, measured).** The 708
   mp-40 rows carry pymatgen-computed labels spanning 102 space groups;
   scripts/calibrate_spacegroup.py computes the fingerprint of every row's
   ground-truth structure and commits the majority-label map
   (chem/spacegroup_table.json) together with its measured agreement and
   collision report. Groups never seen in the table return "" (documented:
   identification is exact *relative to the calibration labels*; the
   fingerprint machinery itself is analytic and golden-tested on textbook
   cells in tests/test_spacegroup.py).
"""

from __future__ import annotations

import itertools
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from chemeleon_tpu.chem.lattice import niggli_reduce
from chemeleon_tpu.chem.symmetry import (_ROT_TYPE, _to_niggli_frame,
                                         find_symmetry_operations,
                                         primitive_structure)

_TABLE_PATH = Path(__file__).with_name("spacegroup_table.json")

# order k of each operation type: smallest k with W^k = I
_OP_ORDER = {"1": 1, "2": 2, "3": 3, "4": 4, "6": 6,
             "-1": 2, "m": 2, "-3": 6, "-4": 4, "-6": 6}

# denominator grid for intrinsic translations (screws: 1/6..5/6, 1/4, 3/4;
# glides incl. d: quarters; centering shifts: thirds) — all live on 1/12
_DENOM = 12


def _rot_kind(W: np.ndarray) -> str:
    det = int(round(float(np.linalg.det(W.astype(np.float64)))))
    tr = int(round(float(np.trace(W.astype(np.float64)))))
    return _ROT_TYPE.get((det, tr), "?")


def _lattice_vectors_within(lat: np.ndarray, max_index: int = 4,
                            max_len: Optional[float] = None) -> np.ndarray:
    """All nonzero integer-combination lattice vectors with coefficients in
    [-max_index, max_index], sorted by length. [K, 3] Cartesian rows."""
    rng = range(-max_index, max_index + 1)
    combos = np.array([c for c in itertools.product(rng, rng, rng)
                       if c != (0, 0, 0)], dtype=np.float64)
    vecs = combos @ np.asarray(lat, np.float64)
    lens = np.linalg.norm(vecs, axis=1)
    if max_len is not None:
        keep = lens <= max_len
        vecs, lens = vecs[keep], lens[keep]
    order = np.argsort(lens, kind="stable")
    return vecs[order]


def _shortest_perpendicular(lat: np.ndarray, direction: np.ndarray,
                            tol: float = 1e-3) -> List[np.ndarray]:
    """Lattice vectors perpendicular to ``direction``, shortest first."""
    out = []
    for v in _lattice_vectors_within(lat):
        if abs(float(v @ direction)) < tol * np.linalg.norm(v):
            out.append(v)
    return out


def _axes_by_kind(ops, lat) -> Dict[str, List[np.ndarray]]:
    """Distinct (up to sign) symmetry axes of each rotation kind as
    gcd-reduced INTEGER lattice directions — exact even when the atom
    coordinates are noisy, because the integer rotation matrices are."""
    axes: Dict[str, List[Tuple[int, ...]]] = {}
    for W, _ in ops:
        kind = _rot_kind(W)
        if kind in ("1", "-1", "?"):
            continue
        d = _axis_int_direction(W.astype(np.int64))
        if d == (0, 0, 0):
            continue
        bucket = axes.setdefault(kind, [])
        dv = np.asarray(d, np.int64)
        if not any(np.all(np.cross(dv, np.asarray(b, np.int64)) == 0)
                   for b in bucket):
            bucket.append(d)
    return axes


def _system_from_ops(ops) -> str:
    kinds = [_rot_kind(W) for W, _ in ops]
    n3 = sum(k in ("3", "-3") for k in kinds)
    n6 = sum(k in ("6", "-6") for k in kinds)
    n4 = sum(k in ("4", "-4") for k in kinds)
    n2 = sum(k in ("2", "m") for k in kinds)
    if n3 >= 8:
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


_PG_TABLE: Dict[Tuple[Tuple[str, int], ...], str] = {}


def point_group(ops) -> str:
    """Hermann-Mauguin point group (one of the 32 crystal classes) from the
    multiset of rotation kinds — the multiset is a complete invariant."""
    if not _PG_TABLE:
        _PG_TABLE.update({
            (("1", 1),): "1",
            (("-1", 1), ("1", 1)): "-1",
            (("1", 1), ("2", 1)): "2",
            (("1", 1), ("m", 1)): "m",
            (("-1", 1), ("1", 1), ("2", 1), ("m", 1)): "2/m",
            (("1", 1), ("2", 3)): "222",
            (("1", 1), ("2", 1), ("m", 2)): "mm2",
            (("-1", 1), ("1", 1), ("2", 3), ("m", 3)): "mmm",
            (("1", 1), ("2", 1), ("4", 2)): "4",
            (("-4", 2), ("1", 1), ("2", 1)): "-4",
            (("-1", 1), ("-4", 2), ("1", 1), ("2", 1), ("4", 2),
             ("m", 1)): "4/m",
            (("1", 1), ("2", 5), ("4", 2)): "422",
            (("1", 1), ("2", 1), ("4", 2), ("m", 4)): "4mm",
            (("-4", 2), ("1", 1), ("2", 3), ("m", 2)): "-42m",
            (("-1", 1), ("-4", 2), ("1", 1), ("2", 5), ("4", 2),
             ("m", 5)): "4/mmm",
            (("1", 1), ("3", 2)): "3",
            (("-1", 1), ("-3", 2), ("1", 1), ("3", 2)): "-3",
            (("1", 1), ("2", 3), ("3", 2)): "32",
            (("1", 1), ("3", 2), ("m", 3)): "3m",
            (("-1", 1), ("-3", 2), ("1", 1), ("2", 3), ("3", 2),
             ("m", 3)): "-3m",
            (("1", 1), ("2", 1), ("3", 2), ("6", 2)): "6",
            (("-6", 2), ("1", 1), ("3", 2), ("m", 1)): "-6",
            (("-1", 1), ("-3", 2), ("-6", 2), ("1", 1), ("2", 1), ("3", 2),
             ("6", 2), ("m", 1)): "6/m",
            (("1", 1), ("2", 7), ("3", 2), ("6", 2)): "622",
            (("1", 1), ("2", 1), ("3", 2), ("6", 2), ("m", 6)): "6mm",
            (("-6", 2), ("1", 1), ("2", 3), ("3", 2), ("m", 4)): "-6m2",
            (("-1", 1), ("-3", 2), ("-6", 2), ("1", 1), ("2", 7), ("3", 2),
             ("6", 2), ("m", 7)): "6/mmm",
            (("1", 1), ("2", 3), ("3", 8)): "23",
            (("-1", 1), ("-3", 8), ("1", 1), ("2", 3), ("3", 8),
             ("m", 3)): "m-3",
            (("1", 1), ("2", 9), ("3", 8), ("4", 6)): "432",
            (("-4", 6), ("1", 1), ("2", 3), ("3", 8), ("m", 6)): "-43m",
            (("-1", 1), ("-3", 8), ("-4", 6), ("1", 1), ("2", 9), ("3", 8),
             ("4", 6), ("m", 9)): "m-3m",
        })
    from collections import Counter
    key = tuple(sorted(Counter(_rot_kind(W) for W, _ in ops).items()))
    return _PG_TABLE.get(key, "?")


def _right_handed(basis: np.ndarray) -> np.ndarray:
    if np.linalg.det(basis) < 0:
        basis = basis.copy()
        basis[2] = -basis[2]
    return basis


def conventional_basis(lat: np.ndarray, ops, symprec: float = 0.1
                       ) -> np.ndarray:
    """Deterministic conventional cell (rows, Cartesian) for the primitive
    lattice ``lat`` given its space-group operations. The construction is the
    textbook one (main axis -> c, etc.) on EXACT integer axis directions (a
    gcd-reduced integer direction d gives d @ lat as the shortest lattice
    vector along the axis); the exact a/b/c labeling convention does not
    need to match ITA because fingerprints are canonicalized over proper
    relabelings downstream."""
    lat = np.asarray(lat, np.float64)
    system = _system_from_ops(ops)
    axes = _axes_by_kind(ops, lat)

    def _vec(d) -> np.ndarray:
        return np.asarray(d, np.float64) @ lat

    def _main(kinds: Sequence[str]) -> Optional[Tuple[int, ...]]:
        for k in kinds:
            if axes.get(k):
                return axes[k][0]
        return None

    if system == "triclinic":
        return _right_handed(niggli_reduce(lat))

    if system == "monoclinic":
        b = _vec(_main(["2", "m"]))
        u = b / np.linalg.norm(b)
        perp = _shortest_perpendicular(lat, u, tol=0.01)
        a = perp[0]
        c = next((v for v in perp[1:]
                  if np.linalg.norm(np.cross(v, a))
                  > 1e-3 * np.linalg.norm(v) * np.linalg.norm(a)), None)
        if c is None:
            return _right_handed(niggli_reduce(lat))
        return _right_handed(np.stack([a, b, c]))

    if system == "orthorhombic":
        dirs = list(axes.get("2", [])) + list(axes.get("m", []))
        uniq: List[Tuple[int, ...]] = []
        for d in dirs:
            dv = np.asarray(d, np.int64)
            if not any(np.all(np.cross(dv, np.asarray(u, np.int64)) == 0)
                       for u in uniq):
                uniq.append(d)
        if len(uniq) < 3:
            return _right_handed(niggli_reduce(lat))
        vecs = [_vec(d) for d in uniq[:3]]
        vecs.sort(key=lambda v: float(np.linalg.norm(v)))
        return _right_handed(np.stack(vecs))

    if system in ("tetragonal", "hexagonal", "trigonal"):
        kinds = {"tetragonal": ["4", "-4"], "hexagonal": ["6", "-6"],
                 "trigonal": ["3", "-3"]}[system]
        c = _vec(_main(kinds))
        u = c / np.linalg.norm(c)
        perp = _shortest_perpendicular(lat, u, tol=0.01)
        if not perp:
            return _right_handed(niggli_reduce(lat))
        a = perp[0]
        rot = _rodrigues(u, 90.0 if system == "tetragonal" else 120.0)
        b = a @ rot.T
        return _right_handed(np.stack([a, b, c]))

    # cubic: three mutually perpendicular equivalent axes — 4-folds when
    # present (432, -43m, m-3m), else the 2-folds (23, m-3)
    dirs = axes.get("4", []) or axes.get("-4", []) or axes.get("2", [])
    uniq = []
    for d in dirs:
        dv = np.asarray(d, np.int64)
        if not any(np.all(np.cross(dv, np.asarray(u, np.int64)) == 0)
                   for u in uniq):
            uniq.append(d)
    vset = [_vec(d) for d in uniq]
    perp_triples = [
        t for t in itertools.combinations(range(len(vset)), 3)
        if all(abs(float(vset[x] @ vset[y]))
               < 0.01 * np.linalg.norm(vset[x]) * np.linalg.norm(vset[y])
               for x, y in itertools.combinations(t, 2))]
    if not perp_triples:
        return _right_handed(niggli_reduce(lat))
    return _right_handed(np.stack([vset[i] for i in perp_triples[0]]))


def _rodrigues(axis: np.ndarray, deg: float) -> np.ndarray:
    th = np.deg2rad(deg)
    k = axis / np.linalg.norm(axis)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _centering_set(prim: np.ndarray, conv: np.ndarray) -> List[np.ndarray]:
    """Lattice points of the primitive lattice inside the conventional cell,
    as fractional (conv-basis) vectors including the origin."""
    T = np.asarray(prim, np.float64) @ np.linalg.inv(conv)
    m = int(round(abs(np.linalg.det(conv)) / abs(np.linalg.det(prim))))
    pts = set()
    rng = range(-m, m + 1)
    for c in itertools.product(rng, rng, rng):
        f = (np.asarray(c, np.float64) @ T) % 1.0
        f = np.where(f > 1 - 1e-6, 0.0, f)
        pts.add(tuple(np.round(f * _DENOM).astype(int) % _DENOM))
    return [np.asarray(p, np.float64) / _DENOM for p in sorted(pts)]


def _intrinsic_translation(W: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Origin-independent part of the translation of (W, w): the average of
    w over the cyclic group of W. Fractional, NOT yet reduced mod 1."""
    k = _OP_ORDER.get(_rot_kind(W), 1)
    acc = np.zeros(3)
    Wj = np.eye(3)
    for _ in range(k):
        acc = acc + w @ Wj.T
        Wj = Wj @ W.astype(np.float64)
    return acc / k


_PROJ_SUBGROUP_CACHE: Dict[bytes, List[np.ndarray]] = {}


def _canonical_t(W: np.ndarray, t12: Sequence[int]) -> Tuple[int, ...]:
    """Intrinsic translations are only defined modulo the PROJECTION of the
    lattice translations onto the op's invariant subspace (a coset
    representative w shifted by an integer lattice vector L changes the
    intrinsic part by P_W L, where P_W = (1/k) sum_j W^j). Reduce ``t12``
    (twelfths) to the lexicographically smallest element of its orbit under
    the subgroup of (Z/12)^3 generated by P_W e_i — exact integer
    arithmetic since every op order divides 12."""
    key = W.astype(np.int64).tobytes()
    sub = _PROJ_SUBGROUP_CACHE.get(key)
    if sub is None:
        k = _OP_ORDER.get(_rot_kind(W), 1)
        M = np.zeros((3, 3), np.int64)
        Wj = np.eye(3, dtype=np.int64)
        for _ in range(k):
            M += Wj
            Wj = Wj @ W.astype(np.int64)
        # row convention: e_i @ P.T = i-th row of M.T scaled = column i of M
        gens = [tuple(int(v) for v in (M[:, i] * (_DENOM // k)) % _DENOM)
                for i in range(3)]
        group = {(0, 0, 0)}
        frontier = [(0, 0, 0)]
        while frontier:
            base = frontier.pop()
            for g in gens:
                nxt = tuple((b + x) % _DENOM for b, x in zip(base, g))
                if nxt not in group:
                    group.add(nxt)
                    frontier.append(nxt)
        sub = [np.asarray(g, np.int64) for g in sorted(group)]
        _PROJ_SUBGROUP_CACHE[key] = sub
    t = np.asarray(t12, np.int64) % _DENOM
    return min(tuple(int(v) for v in (t + s) % _DENOM) for s in sub)


def _snap_frac(x: np.ndarray) -> Tuple[int, ...]:
    """Reduce mod 1 and snap to the 1/12 grid; raises when the detector
    noise pushes a component off-grid (the caller then refuses to
    fingerprint rather than guessing)."""
    f = np.asarray(x, np.float64) % 1.0
    g = f * _DENOM
    # grid spacing is 1 twelfth, so snapping is unambiguous below 0.5; the
    # 0.35 bound absorbs symprec-scale noise in the detected translations
    # while still refusing genuinely off-grid (broken-symmetry) cells
    if np.max(np.abs(g - np.round(g))) > 0.35:
        raise ValueError("intrinsic translation off the 1/12 grid")
    return tuple(int(v) for v in np.round(g).astype(int) % _DENOM)


def _axis_int_direction(W: np.ndarray) -> Tuple[int, ...]:
    """Axis of the (conv-basis, integer) operation as a canonical-sign
    primitive integer direction; (0,0,0) for 1 and -1."""
    kind = _rot_kind(W)
    if kind in ("1", "-1", "?"):
        return (0, 0, 0)
    M = W.astype(np.int64) if kind in ("2", "3", "4", "6") \
        else -W.astype(np.int64)
    # integer nullspace of (M - I): accumulate M^j x for a probe set
    k = _OP_ORDER[kind] if kind in ("2", "3", "4", "6") else \
        {"m": 2, "-3": 3, "-4": 4, "-6": 6}[kind]
    best = None
    for probe in ((1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1),
                  (0, 1, 1), (1, 1, 1)):
        x = np.asarray(probe, np.int64)
        acc = np.zeros(3, np.int64)
        Mj = np.eye(3, dtype=np.int64)
        for _ in range(k):
            acc = acc + x @ Mj.T
            Mj = Mj @ M
        if not np.any(acc):
            continue
        g = np.gcd.reduce(np.abs(acc[acc != 0]))
        cand = tuple(int(v) for v in acc // g)
        if best is None or np.abs(cand).sum() < np.abs(best).sum():
            best = cand
    if best is None:
        return (0, 0, 0)
    if kind in ("3", "4", "6"):
        # orient the axis by the rotation SENSE (right-hand rule) so that
        # enantiomorphic screws stay distinct: a 4+ screw with t=+c/4 (P41)
        # and one with t=+3c/4 (P43) must not encode identically. Fractional
        # triple products share the Cartesian sign because the conventional
        # basis is right-handed and relabelings are proper.
        ax = np.asarray(best, np.float64)
        for probe in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
            v = np.asarray(probe, np.float64)
            d = float(np.linalg.det(np.stack([v, v @ W.astype(np.float64).T,
                                              ax])))
            if abs(d) > 1e-6:
                return best if d > 0 else tuple(-u for u in best)
        return best
    # order-2 / improper ops have no usable sense: first nonzero positive
    for v in best:
        if v != 0:
            return best if v > 0 else tuple(-u for u in best)
    return best


# proper relabelings of the conventional axes to canonicalize the
# arbitrary a/b/c choice: signed permutation matrices with det +1
_PROPER_RELABELINGS: Optional[np.ndarray] = None


def _proper_relabelings() -> np.ndarray:
    global _PROPER_RELABELINGS
    if _PROPER_RELABELINGS is None:
        mats = []
        for perm in itertools.permutations(range(3)):
            for signs in itertools.product((1, -1), repeat=3):
                P = np.zeros((3, 3), np.int64)
                for i, j in enumerate(perm):
                    P[i, j] = signs[i]
                if round(np.linalg.det(P.astype(np.float64))) == 1:
                    mats.append(P)
        _PROPER_RELABELINGS = np.stack(mats)  # [24, 3, 3]
    return _PROPER_RELABELINGS


def fingerprint(crystal, symprec: float = 0.1) -> Optional[str]:
    """Canonical space-group-type fingerprint of a Crystal, or None when the
    detection degenerates (no ops / inconsistent conventional cell)."""
    try:
        prim = primitive_structure(crystal, symprec)
        ops = find_symmetry_operations(prim, symprec)
        if not ops:
            return None
        # ops are integer matrices in the NIGGLI frame of the primitive cell
        # (symmetry.py::find_symmetry_operations) — interpret them there
        lat, _ = _to_niggli_frame(prim.lattice, prim.frac_coords)
        conv = conventional_basis(lat, ops, symprec)
        if conv is None:
            return None
        m = abs(np.linalg.det(conv)) / abs(np.linalg.det(lat))
        if not (0.9 < m < 4.2):
            return None
        cset = _centering_set(lat, conv)
        if len(cset) != int(round(m)):
            return None
        pg = point_group(ops)
        system = _system_from_ops(ops)

        # re-express ops in the conventional basis (row convention:
        # frac' = frac @ W.T + w; frac_conv = frac_prim @ B with
        # B = lat @ inv(conv), hence Wc = B.T W inv(B).T, wc = w @ B), and
        # expand every op over the centering translations so the centering
        # itself is encoded as identity-op entries — no setting-dependent
        # A/B/C letter ever enters the fingerprint.
        B = lat @ np.linalg.inv(conv)
        Binv_T = np.linalg.inv(B).T
        ops_conv = []
        for W, w in ops:
            Wc = B.T @ W.astype(np.float64) @ Binv_T
            Wi = np.round(Wc).astype(np.int64)
            if np.max(np.abs(Wc - Wi)) > 0.05:
                return None
            wc = w @ B
            for tc in cset:
                ops_conv.append((Wi, wc + tc))

        entries_base = []
        for Wi, wc in ops_conv:
            kind = _rot_kind(Wi)
            ti = _snap_frac(_intrinsic_translation(Wi, wc))
            entries_base.append((Wi, kind, ti))

        best_key = None
        for P in _proper_relabelings():
            Pi = P.astype(np.int64)
            entries = []
            for Wi, kind, ti in entries_base:
                W2 = Pi @ Wi @ Pi.T
                ax = _axis_int_direction(W2)
                t2 = _canonical_t(W2, (Pi @ np.asarray(ti, np.int64))
                                  % _DENOM)
                entries.append((kind, ax, t2))
            key = tuple(sorted(entries))
            if best_key is None or key < best_key:
                best_key = key
        enc = ";".join(f"{k}:{a[0]},{a[1]},{a[2]}:{t[0]},{t[1]},{t[2]}"
                       for k, a, t in best_key)
        return f"{system}|{pg}|{len(ops_conv)}|{enc}"
    except Exception:
        return None


_TABLE_CACHE: Optional[Dict[str, Dict[str, str]]] = None


def _load_table() -> Dict[str, Dict[str, str]]:
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        if _TABLE_PATH.exists():
            with open(_TABLE_PATH) as f:
                _TABLE_CACHE = json.load(f).get("map", {})
        else:
            _TABLE_CACHE = {}
    return _TABLE_CACHE


def identify(crystal, symprec: float = 0.1) -> Dict[str, str]:
    """(space_group_symbol, space_group_number) via the calibrated
    fingerprint table; empty strings when the fingerprint is unknown —
    callers treat that exactly like the old pymatgen-absent pass-through."""
    fp = fingerprint(crystal, symprec)
    hit = _load_table().get(fp or "", None)
    if hit is None:
        return {"space_group_symbol": "", "space_group_number": ""}
    return {"space_group_symbol": hit["symbol"],
            "space_group_number": hit["number"]}
