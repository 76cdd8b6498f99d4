"""Calibrate the in-repo energy surrogate (chem/energy.py) on mp-40.

The surrogate replaces MACE in the meta_stable metric (reference
evaluate.py:207-220: (E_gen - E_gt)/n < 0.1 eV/atom) when MACE is not
installed. This script quantifies, on real mp-40 ground-truth cells, the
properties the metric relies on:

  gt_is_minimum    E(gt) < E(perturbed gt): fraction of rows where the
                   ground truth scores below coordinate/lattice-perturbed
                   copies of itself (a stability metric is useless if the
                   true structure does not sit in a basin).
  threshold_scale  distribution of (E(perturbed) - E(gt))/n at small noise:
                   how the published 0.1 eV/atom threshold maps onto the
                   surrogate's energy scale.
  hull_ranking     within groups of test rows sharing a reduced
                   composition, Kendall-tau agreement between surrogate
                   E/atom and the MP energy_above_hull column (polymorph
                   ranking — the same-composition comparison the metric
                   actually makes).
  charge_coverage  fraction of rows with a non-trivial ionic charge
                   assignment (q=0 rows fall back to packing terms only).

Writes results/energy_calibration.json.
"""

from __future__ import annotations

import argparse
import csv
import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from chemeleon_tpu.chem.cif import parse_cif
from chemeleon_tpu.chem.energy import IonicPotentialCalculator, assign_charges


def perturb(st, rms_norm, rng, lattice_rel=0.0):
    norm = (st.volume / len(st)) ** (1.0 / 3.0)
    s = rms_norm * norm / np.sqrt(3.0)
    cart_noise = rng.normal(0.0, s, size=st.frac_coords.shape)
    frac = (st.frac_coords + cart_noise @ np.linalg.inv(st.lattice)) % 1.0
    lat = st.lattice
    if lattice_rel:
        e = rng.normal(0.0, lattice_rel / np.sqrt(2.0), size=(3, 3))
        lat = lat @ (np.eye(3) + (e + e.T) / 2.0)
    from chemeleon_tpu.chem.structure import Crystal
    return Crystal(lat, frac, st.atom_types.copy())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-data", default="data/mp-40/test.csv")
    ap.add_argument("--n-rows", type=int, default=120)
    ap.add_argument("--out", default="results/energy_calibration.json")
    args = ap.parse_args()

    csv.field_size_limit(10 ** 9)
    with open(args.test_data) as f:
        rows = list(csv.DictReader(f))
    rng = np.random.default_rng(0)
    calc = IonicPotentialCalculator()

    parsed = []
    for r in rows:
        try:
            st = parse_cif(r["cif"])
        except Exception:
            continue
        if len(st) <= 24:   # keep the Ewald cost bounded
            parsed.append((st, float(r["energy_above_hull"]),
                           st.reduced_formula()))
        if len(parsed) >= args.n_rows:
            break
    print(f"{len(parsed)} rows")

    report = {"params": {"a_rep": calc.a_rep, "rho": calc.rho,
                         "eps_disp": calc.eps_disp},
              "n_rows": len(parsed)}

    # charge coverage
    charged = sum(1 for st, _, _ in parsed if np.any(assign_charges(st)))
    report["charge_coverage"] = charged / max(1, len(parsed))
    print(f"charge coverage: {report['charge_coverage']:.3f}")

    # gt-is-minimum + threshold scale
    lower, diffs = defaultdict(int), defaultdict(list)
    levels = [(0.05, 0.0), (0.10, 0.02), (0.20, 0.05)]
    e_gt = {}
    for i, (st, _, _) in enumerate(parsed):
        e_gt[i] = calc(st) / len(st)
        for lv, (rn, lr) in enumerate(levels):
            ep = calc(perturb(st, rn, rng, lr)) / len(st)
            d = ep - e_gt[i]
            lower[lv] += d > 0
            diffs[lv].append(d)
    report["gt_is_minimum"] = {
        f"coord{rn}_lat{lr}": {
            "frac_gt_lower": lower[lv] / len(parsed),
            "median_dE_per_atom": float(np.median(diffs[lv])),
            "frac_within_0.1eV": float(np.mean(np.array(diffs[lv]) < 0.1)),
        } for lv, (rn, lr) in enumerate(levels)}
    for k, v in report["gt_is_minimum"].items():
        print(k, v)

    # polymorph ranking vs energy_above_hull within same reduced formula —
    # scan the FULL test set for polymorph groups (they are rare: 14 groups
    # in 708 rows), not just the first n_rows
    groups = defaultdict(list)
    by_rf = defaultdict(list)
    for r in rows:
        try:
            st = parse_cif(r["cif"])
        except Exception:
            continue
        by_rf[st.reduced_formula()].append(
            (st, float(r["energy_above_hull"])))
    for rf, members in by_rf.items():
        if len(members) < 2:
            continue
        for st, ehull in members:
            groups[rf].append((calc(st) / len(st), ehull))
    pairs_total = pairs_agree = 0
    for g in groups.values():
        for a in range(len(g)):
            for b in range(a + 1, len(g)):
                if abs(g[a][1] - g[b][1]) < 1e-6:
                    continue
                pairs_total += 1
                pairs_agree += (g[a][0] - g[b][0]) * (g[a][1] - g[b][1]) > 0
    report["hull_ranking"] = {"pairs": int(pairs_total),
                              "agree": int(pairs_agree),
                              "kendall_like": (float(pairs_agree)
                                               / pairs_total
                                               if pairs_total else None)}
    print("hull ranking:", report["hull_ranking"])

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
