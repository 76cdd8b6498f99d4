"""StructureMatcher acceptance calibration (pure CPU, no jax).

VERDICT r3 weak-#1: the full-protocol `structure_matching == 0.000` with
`unique_samples == 1.000` is unactionable until we know where the in-repo
matcher's acceptance boundary sits relative to the published criteria
(reference evaluate.py:198-204 uses pymatgen StructureMatcher defaults:
ltol=0.2, stol=0.3, angle_tol=5).

This script measures, on real mp-40 ground-truth cells:

  coord curve   acceptance vs coordinate noise, parameterized by the
                *normalized rms displacement* rms/(V/n)^(1/3) — the exact
                quantity stol thresholds. A calibrated matcher accepts
                ~100% below 0.3 and ~0% well above it.
  lattice curve acceptance vs relative lattice-parameter noise (ltol
                thresholds |da|/a at 0.2) and vs pure angle noise
                (angle_tol thresholds at 5 deg).
  composites    supercell x permutation x origin-shift x small noise —
                invariances pymatgen guarantees (primitive_cell=True,
                periodic assignment); each must accept.
  negatives     cross-pairs of distinct test rows with the same reduced
                composition — false-positive rate should be ~0.
  self-dedupe   pairs of *generated* cells from the round-3 full-protocol
                cache (the cells behind unique_samples==1.000), perturbed
                copies of themselves — a positive control on
                generated-quality (often skewed/low-symmetry) cells.

Writes results/matcher_calibration.json.
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import numpy as np

from chemeleon_tpu.chem.cif import parse_cif
from chemeleon_tpu.chem.matcher import StructureMatcher
from chemeleon_tpu.chem.structure import Crystal


def _norm_len(st: Crystal) -> float:
    return (st.volume / len(st)) ** (1.0 / 3.0)


def perturb_coords(st: Crystal, rms_norm: float, rng) -> Crystal:
    """Gaussian cartesian displacement with E[rms]/norm == rms_norm."""
    norm = _norm_len(st)
    # 3D gaussian with per-axis sigma s has rms displacement s*sqrt(3)
    s = rms_norm * norm / np.sqrt(3.0)
    cart_noise = rng.normal(0.0, s, size=st.frac_coords.shape)
    frac_noise = cart_noise @ np.linalg.inv(st.lattice)
    return Crystal(st.lattice.copy(), (st.frac_coords + frac_noise) % 1.0,
                   st.atom_types.copy())


def perturb_lattice(st: Crystal, rel: float, rng) -> Crystal:
    """Symmetric relative strain of magnitude ~rel on the cell."""
    e = rng.normal(0.0, rel / np.sqrt(2.0), size=(3, 3))
    strain = np.eye(3) + (e + e.T) / 2.0
    return Crystal(st.lattice @ strain, st.frac_coords.copy(),
                   st.atom_types.copy())


def rotate_angles(st: Crystal, deg: float, rng) -> Crystal:
    """Shear the cell so lattice angles move by ~deg without changing
    lengths much (tests angle_tol in isolation)."""
    from chemeleon_tpu.chem.lattice import lattice_from_parameters, \
        lattice_parameters
    a, b, c, al, be, ga = lattice_parameters(st.lattice)
    d = rng.choice([-1.0, 1.0], size=3) * deg
    new = lattice_from_parameters(a, b, c, al + d[0], be + d[1], ga + d[2])
    # keep fracs: same fractional coords in the new cell
    return Crystal(new, st.frac_coords.copy(), st.atom_types.copy())


def permute_shift(st: Crystal, rng) -> Crystal:
    perm = rng.permutation(len(st))
    shift = rng.random(3)
    return Crystal(st.lattice.copy(), (st.frac_coords[perm] + shift) % 1.0,
                   st.atom_types[perm].copy())


def supercell(st: Crystal, rep=(2, 1, 1)) -> Crystal:
    rep = np.asarray(rep)
    lat = st.lattice * rep[:, None]
    fr, ty = [], []
    for i in range(rep[0]):
        for j in range(rep[1]):
            for k in range(rep[2]):
                fr.append((st.frac_coords + np.array([i, j, k])) / rep)
                ty.append(st.atom_types)
    return Crystal(lat, np.concatenate(fr) % 1.0, np.concatenate(ty))


def load_rows(test_csv: Path, n_rows: int, max_atoms: int = 20):
    csv.field_size_limit(10 ** 9)
    with open(test_csv) as f:
        rows = list(csv.DictReader(f))
    out = []
    for r in rows:
        try:
            st = parse_cif(r["cif"])
        except Exception:
            continue
        if len(st) <= max_atoms:
            out.append(st)
        if len(out) >= n_rows:
            break
    return out


def load_generated(cache_dir: Path, n: int, max_atoms: int = 20):
    """Generated cells from the round-3 full-protocol cache."""
    from chemeleon_tpu.eval.evaluate import _load_gen_chunk
    out = []
    for p in sorted(cache_dir.glob("gen_b*.npz")):
        for st in _load_gen_chunk(p):
            if len(st) <= max_atoms and st.min_pair_distance() > 0.5:
                out.append(st)
            if len(out) >= n:
                return out
    return out


def acceptance(matcher, structures, make_other, rng):
    hits = 0
    for st in structures:
        try:
            if matcher.fit(st, make_other(st, rng)):
                hits += 1
        except Exception:
            pass
    return hits / max(1, len(structures))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-data", default="data/mp-40/test.csv")
    ap.add_argument("--gen-cache", default="results/full_protocol/gen_cache")
    ap.add_argument("--n-rows", type=int, default=80)
    ap.add_argument("--out", default="results/matcher_calibration.json")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "python", "native"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    sm = StructureMatcher(backend=args.backend)
    rows = load_rows(Path(args.test_data), args.n_rows)
    print(f"{len(rows)} ground-truth cells (backend native={sm._native})")
    report = {"backend_native": sm._native, "n_rows": len(rows),
              "criteria": {"ltol": 0.2, "stol": 0.3, "angle_tol": 5.0}}

    # 1. coordinate-noise curve (the stol axis)
    curve = {}
    for rms_norm in [0.0, 0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.40, 0.60]:
        curve[f"{rms_norm:.2f}"] = acceptance(
            sm, rows, lambda s, r, v=rms_norm: perturb_coords(s, v, r), rng)
        print(f"coord rms/norm={rms_norm:.2f}: {curve[f'{rms_norm:.2f}']:.3f}")
    report["coord_noise_acceptance"] = curve

    # 2. lattice strain curve (the ltol axis)
    lcurve = {}
    for rel in [0.0, 0.02, 0.05, 0.10, 0.15, 0.20, 0.30]:
        lcurve[f"{rel:.2f}"] = acceptance(
            sm, rows, lambda s, r, v=rel: perturb_lattice(s, v, r), rng)
        print(f"lattice rel={rel:.2f}: {lcurve[f'{rel:.2f}']:.3f}")
    report["lattice_strain_acceptance"] = lcurve

    # 3. pure angle perturbation (the angle_tol axis)
    acurve = {}
    for deg in [0.0, 1.0, 2.0, 4.0, 6.0, 10.0]:
        acurve[f"{deg:.0f}"] = acceptance(
            sm, rows, lambda s, r, v=deg: rotate_angles(s, v, r), rng)
        print(f"angle deg={deg:.0f}: {acurve[f'{deg:.0f}']:.3f}")
    report["angle_acceptance"] = acurve

    # 4. invariance composites (must all be ~1.0)
    comp = {
        "perm_shift": acceptance(sm, rows, lambda s, r: permute_shift(s, r),
                                 rng),
        "supercell_211": acceptance(
            sm, [s for s in rows if 2 * len(s) <= 40],
            lambda s, r: supercell(s), rng),
        "supercell_perm_shift_noise05": acceptance(
            sm, [s for s in rows if 2 * len(s) <= 40],
            lambda s, r: permute_shift(perturb_coords(supercell(s), 0.05, r),
                                       r), rng),
    }
    for k, v in comp.items():
        print(f"composite {k}: {v:.3f}")
    report["composites"] = comp

    # 5. negative pairs: distinct rows, same reduced composition
    by_comp = {}
    for st in rows:
        by_comp.setdefault(st.reduced_formula(), []).append(st)
    neg_pairs = []
    for group in by_comp.values():
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                neg_pairs.append((group[i], group[j]))
    fp = sum(1 for a, b in neg_pairs if sm.fit(a, b))
    report["negative_pairs"] = {"n": len(neg_pairs), "false_pos": fp}
    print(f"negatives: {fp}/{len(neg_pairs)} matched")

    # 6. generated-cell self-match under noise (positive control on the
    #    skewed cells behind unique_samples==1.000)
    gen = []
    gc = Path(args.gen_cache)
    if gc.exists():
        gen = load_generated(gc, 60)
    if gen:
        gcurve = {}
        for rms_norm in [0.0, 0.05, 0.15, 0.25]:
            gcurve[f"{rms_norm:.2f}"] = acceptance(
                sm, gen, lambda s, r, v=rms_norm: permute_shift(
                    perturb_coords(s, v, r), r), rng)
            print(f"gen-cell rms/norm={rms_norm:.2f}: "
                  f"{gcurve[f'{rms_norm:.2f}']:.3f}")
        report["generated_cell_acceptance"] = gcurve
        # how self-similar are different samples of the same row, really?
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
