"""Structure matching and deduplication.

Standalone replacement for pymatgen's ``StructureMatcher`` as used by the
reference (evaluate.py:198-204 structure matching with default tolerances;
sample_target_composition.py:35,:66 dedupe with angle_tol=10). Algorithm
(calibrated against the published (ltol=0.2, stol=0.3, angle_tol=5)
criteria — see scripts/calibrate_matcher.py and
results/matcher_calibration.json):

  1. reduced compositions must match;
  2. both structures are primitive-reduced (pure-translation detection);
     if the primitive cells have different site counts that differ by an
     integer factor m, Hermite-normal-form supercells of the smaller are
     enumerated (formula-unit matching — MP ground truths are conventional
     cells that fold to primitive, generated noisy cells do not, so without
     this whole row classes could never match);
  3. Niggli-reduce both cells, volume-normalize (scale=True);
  4. candidate bases of the second cell = unimodular integer combinations
     of its Niggli vectors whose lengths/angles match the first cell within
     (ltol, angle_tol) — a superset of signed axis permutations, covering
     near-degenerate cells whose Niggli reductions land on different bases;
  5. for each candidate basis + anchor translation, per-species min-cost
     assignment (Hungarian) on periodic displacements, followed by
     mean-displacement translation refinement (pymatgen's _cart_dists
     optimizes the translation the same way); accept when the MAX
     normalized per-site displacement max_i |d_i| / (V/n)^(1/3) is within
     stol — pymatgen's fit() criterion (use_rms=False in _strict_match),
     under which a single site beyond stol*norm fails the match even when
     the rms is small. get_rms_dist() keeps the rms semantics (pymatgen's
     get_rms_dist uses use_rms=True).

This is a faithful re-derivation of the published matching criteria (not a
code port).
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from chemeleon_tpu.chem.lattice import lattice_parameters, niggli_reduce
from chemeleon_tpu.chem.structure import Crystal


def _niggli_frame(crystal: Crystal):
    """Return (reduced lattice, frac coords in the reduced basis)."""
    try:
        red = niggli_reduce(crystal.lattice)
    except ValueError:
        red = crystal.lattice
    # f_new = f_old @ L_old @ R^{-1}
    f = crystal.frac_coords @ crystal.lattice @ np.linalg.inv(red)
    return red, f % 1.0


# integer coefficient vectors for candidate-basis enumeration (step 4);
# range [-2, 2] covers every unimodular remapping reachable from a Niggli
# cell of a matching lattice
_COEFF_VECS = np.array([v for v in itertools.product((-2, -1, 0, 1, 2),
                                                     repeat=3)
                        if any(v)], dtype=np.float64)


def _hnf_matrices(m: int):
    """All 3x3 integer Hermite-normal-form matrices with determinant m
    (lower-triangular convention). Standard enumeration: diag (a, c, f),
    acf = m; below-diagonal entries reduced modulo the diagonal of their
    COLUMN: 0 <= b, d < a and 0 <= e < c."""
    out = []
    for a in range(1, m + 1):
        if m % a:
            continue
        for c in range(1, m // a + 1):
            if (m // a) % c:
                continue
            f = m // (a * c)
            for b in range(a):
                for d in range(a):
                    for e in range(c):
                        out.append(np.array([[a, 0, 0],
                                             [b, c, 0],
                                             [d, e, f]], dtype=np.float64))
    return out


def _supercell(st: Crystal, H: np.ndarray) -> Crystal:
    """Supercell with lattice H @ L (H an HNF integer matrix)."""
    lat = H @ st.lattice
    m = int(round(abs(np.linalg.det(H))))
    a, c, f = int(H[0, 0]), int(H[1, 1]), int(H[2, 2])
    reps = np.array([[i, j, k] for i in range(a) for j in range(c)
                     for k in range(f)], dtype=np.float64)
    # cart = x @ L = x' @ (H @ L)  =>  x' = x @ inv(H)
    inv = np.linalg.inv(H)
    fr = ((st.frac_coords[None, :, :] + reps[:, None, :]) @ inv
          ).reshape(-1, 3) % 1.0
    ty = np.tile(st.atom_types, m)
    return Crystal(lat, fr, ty)


class StructureMatcher:
    """fit() / group_structures() with pymatgen-compatible defaults
    (ltol=0.2, stol=0.3, angle_tol=5)."""

    #: cap on per-axis basis candidates (degenerate a~b~c cells can
    #: otherwise explode the triple loop)
    _MAX_AXIS_CANDS = 12
    #: cap on formula-unit ratio for supercell matching
    _MAX_FU = 16

    def __init__(self, ltol: float = 0.2, stol: float = 0.3,
                 angle_tol: float = 5.0, primitive_cell: bool = True,
                 scale: bool = True, backend: str = "auto"):
        self.ltol = ltol
        self.stol = stol
        self.angle_tol = angle_tol
        self.primitive_cell = primitive_cell
        self.scale = scale
        # id(crystal) -> (crystal, primitive); LRU-bounded so a long-lived
        # matcher (e.g. dedup across a sampling campaign) cannot retain every
        # crystal ever fitted
        from collections import OrderedDict
        self._prim_cache: "OrderedDict" = OrderedDict()
        self._prim_cache_max = 2048
        self._native = False
        if backend in ("auto", "native"):
            try:
                from chemeleon_tpu.native import available, structures_fit
                if available():
                    self._native_fit = structures_fit
                    self._native = True
                elif backend == "native":
                    raise RuntimeError("native matcher unavailable")
            except ImportError:
                if backend == "native":
                    raise

    # -- lattice comparison ---------------------------------------------------
    def _params_match(self, p1, p2) -> bool:
        for i in range(3):
            if abs(p1[i] - p2[i]) / max(p1[i], 1e-9) > self.ltol:
                return False
        for i in range(3, 6):
            if abs(p1[i] - p2[i]) > self.angle_tol:
                return False
        return True

    def _primitive(self, s: Crystal) -> Crystal:
        """Cached primitive reduction (group_structures re-fits the same
        group representatives many times). Keyed by id with the crystal kept
        alive in the value so ids cannot be recycled mid-lifetime."""
        hit = self._prim_cache.get(id(s))
        if hit is None or hit[0] is not s:
            from chemeleon_tpu.chem.symmetry import primitive_structure
            hit = (s, primitive_structure(s))
            self._prim_cache[id(s)] = hit
            while len(self._prim_cache) > self._prim_cache_max:
                self._prim_cache.popitem(last=False)
        else:
            self._prim_cache.move_to_end(id(s))
        return hit[1]

    def fit(self, s1: Crystal, s2: Crystal) -> bool:
        if self.primitive_cell:
            s1, s2 = self._primitive(s1), self._primitive(s2)
        if s1.reduced_composition() != s2.reduced_composition():
            return False

        if len(s1) == len(s2):
            return self._fit_same_size(s1, s2)
        if not self.primitive_cell:
            # without primitive reduction there is no fold asymmetry to
            # heal; different site counts are genuinely different cells
            return False

        # formula-unit (supercell) matching: HNF supercells of the smaller
        # (a noise-free MP ground truth folds to its primitive cell while a
        # noisy generated conventional cell does not — without this, whole
        # row classes could never structure-match)
        small, big = (s1, s2) if len(s1) < len(s2) else (s2, s1)
        if len(big) % len(small):
            return False
        m = len(big) // len(small)
        if m > self._MAX_FU:
            return False
        for H in _hnf_matrices(m):
            if self._fit_same_size(_supercell(small, H), big):
                return True
        return False

    def get_rms_dist(self, s1: Crystal, s2: Crystal,
                     max_rms: float = 4.0) -> Optional[float]:
        """Best normalized RMS displacement over all candidate bases /
        translations (pymatgen's ``get_rms_dist`` analog; diagnostics API).

        Searches with the acceptance threshold relaxed to ``max_rms`` (in
        units of (V/n)^(1/3)) and returns the smallest normalized rms found,
        or None when no lattice mapping exists within (ltol, angle_tol) or
        compositions/sizes are incompatible. NOTE: like pymatgen, this is
        the rms (use_rms=True) while ``fit()`` accepts on the MAX per-site
        displacement (use_rms=False), so ``get_rms_dist() <= stol`` does NOT
        imply ``fit()`` — a single outlier site can fail fit() while the rms
        stays under stol. Always uses the python backend (the native kernel
        returns only the boolean)."""
        if self.primitive_cell:
            s1, s2 = self._primitive(s1), self._primitive(s2)
        if s1.reduced_composition() != s2.reduced_composition():
            return None
        probe = StructureMatcher(ltol=self.ltol, stol=max_rms,
                                 angle_tol=self.angle_tol,
                                 primitive_cell=False, scale=self.scale,
                                 backend="python")
        probe._best_rms = None          # collected by _sites_match
        cands = [(s1, s2)] if len(s1) == len(s2) else []
        if not cands and self.primitive_cell:
            small, big = (s1, s2) if len(s1) < len(s2) else (s2, s1)
            if len(big) % len(small) == 0 and \
                    len(big) // len(small) <= self._MAX_FU:
                cands = [(_supercell(small, H), big)
                         for H in _hnf_matrices(len(big) // len(small))]
        for a, b in cands:
            probe._fit_same_size(a, b)
        return probe._best_rms

    def _fit_same_size(self, s1: Crystal, s2: Crystal) -> bool:
        if sorted(s1.atom_types.tolist()) != sorted(s2.atom_types.tolist()):
            return False

        if self._native:
            return self._native_fit(
                s1.lattice, s1.frac_coords, s1.atom_types,
                s2.lattice, s2.frac_coords, s2.atom_types,
                ltol=self.ltol, stol=self.stol, angle_tol=self.angle_tol,
                scale=self.scale)

        lat1, f1 = _niggli_frame(s1)
        lat2, f2 = _niggli_frame(s2)
        if self.scale:
            ratio = (abs(np.linalg.det(lat1)) / max(abs(np.linalg.det(lat2)),
                                                    1e-12)) ** (1.0 / 3.0)
            lat2 = lat2 * ratio
        p1 = lattice_parameters(lat1)

        n = len(s1)
        norm = (abs(np.linalg.det(lat1)) / n) ** (1.0 / 3.0)
        types1 = s1.atom_types
        types2 = s2.atom_types
        species = np.unique(types1)
        sp_idx1 = {int(sp): np.where(types1 == sp)[0] for sp in species}
        sp_idx2 = {int(sp): np.where(types2 == sp)[0] for sp in species}
        # anchor species: the rarest one (fewest anchor translations to try)
        counts = [(len(sp_idx1[int(sp)]), int(sp)) for sp in species]
        anchor_sp = min(counts)[1]
        idx1_anchor = sp_idx1[anchor_sp][0]
        idx2_anchors = sp_idx2[anchor_sp]

        for M in self._candidate_bases(p1, lat2):
            # basis rows B = M @ lat2 => f2' = f2 @ inv(M) (integer inverse)
            f2p = (f2 @ np.linalg.inv(M)) % 1.0
            basis_lat = M @ lat2
            for j in idx2_anchors:
                shift = (f2p[j] - f1[idx1_anchor]) % 1.0
                if self._sites_match(f1, f2p, shift, sp_idx1, sp_idx2,
                                     basis_lat, norm, n):
                    return True
        return False

    def _candidate_bases(self, p1, lat2):
        """Unimodular integer matrices M such that M @ lat2 has cell
        parameters matching p1 within (ltol, angle_tol). Signed axis
        permutations are a subset."""
        vec_lens = np.linalg.norm(_COEFF_VECS @ lat2, axis=1)
        axis_cands = []
        for i in range(3):
            rel = np.abs(vec_lens - p1[i]) / max(p1[i], 1e-9)
            order = np.argsort(rel)
            keep = order[rel[order] <= self.ltol][: self._MAX_AXIS_CANDS]
            if len(keep) == 0:
                return
            axis_cands.append(keep)
        for i0 in axis_cands[0]:
            for i1 in axis_cands[1]:
                for i2 in axis_cands[2]:
                    M = np.stack([_COEFF_VECS[i0], _COEFF_VECS[i1],
                                  _COEFF_VECS[i2]])
                    det = np.linalg.det(M)
                    if abs(abs(det) - 1.0) > 1e-9:
                        continue
                    pb = lattice_parameters(M @ lat2)
                    if self._params_match(p1, pb):
                        yield M

    def _sites_match(self, f1, f2p, shift, sp_idx1, sp_idx2, lat, norm,
                     n) -> bool:
        """Per-species assignment + translation refinement; accept on the
        MAX normalized per-site displacement <= stol (pymatgen's fit()
        criterion, use_rms=False — a single site beyond stol*norm fails
        even when the rms is small). rms-collection mode (get_rms_dist)
        records the rms instead, matching pymatgen's use_rms=True, and
        never accepts — it reports minima ABOVE the bound too."""
        collecting = hasattr(self, "_best_rms")
        for _ in range(2):  # one refinement pass
            total_sq = 0.0
            max_d = 0.0
            disp_sum = np.zeros(3)
            for sp, i1 in sp_idx1.items():
                i2 = sp_idx2[sp]
                if len(i1) != len(i2):
                    return False
                d = f1[i1][:, None, :] - (f2p[i2][None, :, :] - shift)
                d -= np.round(d)                       # min-image, frac
                cart = d @ lat
                cost = np.linalg.norm(cart, axis=-1)   # [n_sp, n_sp]
                try:
                    ri, ci = linear_sum_assignment(cost)
                except ValueError:
                    return False
                dists = cost[ri, ci]
                total_sq += float((dists ** 2).sum())
                max_d = max(max_d, float(dists.max()))
                disp_sum += cart[ri, ci].sum(axis=0)
            rms = (total_sq / n) ** 0.5 / norm
            if collecting:
                # rms-collection mode (get_rms_dist): record the minimum and
                # keep searching instead of accepting
                if self._best_rms is None or rms < self._best_rms:
                    self._best_rms = rms
            elif max_d / norm <= self.stol:
                return True
            # refine: shift so the mean displacement vanishes
            # (disp = f1 - (f2p - shift); zeroing the mean moves shift by
            # -mean_frac)
            mean_cart = disp_sum / n
            shift = (shift - mean_cart @ np.linalg.inv(lat)) % 1.0
        return False

    # -- grouping -------------------------------------------------------------
    def group_structures(self, structures: Sequence[Crystal]) -> List[List[Crystal]]:
        """Greedy grouping (same contract as pymatgen's group_structures)."""
        groups: List[List[Crystal]] = []
        for s in structures:
            for g in groups:
                if self.fit(g[0], s):
                    g.append(s)
                    break
            else:
                groups.append([s])
        return groups
