"""Calibrate the space-group fingerprint table against mp-40's labels.

The 708 mp-40 rows carry pymatgen-computed ``space_group_symbol`` /
``space_group_number`` columns spanning 102 space groups (the reference's
data_preparation.ipynb wrote them with SpacegroupAnalyzer). This script:

1. parses every row's ground-truth CIF and computes the analytic
   chem/spacegroup.py fingerprint (symprec 0.1 — pymatgen's default in the
   reference pipeline),
2. builds the fingerprint -> majority-(number, symbol) map and commits it to
   chemeleon_tpu/chem/spacegroup_table.json,
3. reports the three numbers that make the table trustworthy:
   - coverage: rows whose fingerprint resolved at all,
   - collision rate: fingerprints carrying >1 distinct MP label (the
     dangerous direction — the invariant would be too coarse),
   - leave-one-out agreement: for each row, does the majority label of the
     OTHER rows with the same fingerprint reproduce its own label (honest
     accuracy — a row never votes for itself),
   written to results/spacegroup_calibration.json.

CPU-only; safe to run while a TPU job owns the chip.

Usage: python -m chemeleon_tpu.scripts.calibrate_spacegroup
"""

from __future__ import annotations

import argparse
import csv
import json
from collections import Counter, defaultdict
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/mp-40/test.csv")
    ap.add_argument("--symprec", type=float, default=0.1)
    ap.add_argument("--table-out",
                    default="chemeleon_tpu/chem/spacegroup_table.json")
    ap.add_argument("--report-out",
                    default="results/spacegroup_calibration.json")
    ap.add_argument("--max-rows", type=int, default=None)
    args = ap.parse_args()

    from chemeleon_tpu.chem.cif import parse_cif
    from chemeleon_tpu.chem.spacegroup import fingerprint

    csv.field_size_limit(10 ** 9)
    with open(args.data) as f:
        rows = list(csv.DictReader(f))
    if args.max_rows:
        rows = rows[:args.max_rows]

    per_fp: dict = defaultdict(list)   # fp -> [(number, symbol)]
    labeled = []                       # (fp or None, number, symbol)
    n_none = 0
    for i, row in enumerate(rows):
        num = row.get("space_group_number", "").strip()
        sym = row.get("space_group_symbol", "").strip()
        if not num:
            continue
        try:
            st = parse_cif(row["cif"])
            fp = fingerprint(st, symprec=args.symprec)
        except Exception:
            fp = None
        if fp is None:
            n_none += 1
        else:
            per_fp[fp].append((num, sym))
        labeled.append((fp, num, sym))
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{len(rows)} rows "
                  f"({n_none} unresolved)", flush=True)

    # majority map + collision audit
    table = {}
    collisions = []
    for fp, labels in per_fp.items():
        c = Counter(labels)
        (num, sym), _ = c.most_common(1)[0]
        table[fp] = {"number": num, "symbol": sym}
        if len(c) > 1:
            collisions.append({
                "fingerprint_prefix": fp[:80],
                "labels": {f"{n}:{s}": k for (n, s), k in c.items()}})

    # leave-one-out agreement
    loo_hit = loo_miss = loo_unknown = 0
    for fp, num, sym in labeled:
        if fp is None:
            loo_unknown += 1
            continue
        others = Counter(l for l in per_fp[fp]) - Counter([(num, sym)])
        # remove exactly one copy of this row's own label
        pool = Counter(per_fp[fp])
        pool[(num, sym)] -= 1
        pool = +pool
        if not pool:
            loo_unknown += 1  # singleton fingerprint: no independent vote
            continue
        (pn, ps), _ = pool.most_common(1)[0]
        if pn == num:
            loo_hit += 1
        else:
            loo_miss += 1

    n = len(labeled)
    report = {
        "rows": n,
        "distinct_labels": len({(num, sym) for _, num, sym in labeled}),
        "coverage": 1.0 - n_none / max(n, 1),
        "unresolved_rows": n_none,
        "fingerprints": len(per_fp),
        "collision_fingerprints": len(collisions),
        "collision_rows": sum(sum(c["labels"].values()) for c in collisions),
        "loo_agree": loo_hit / max(loo_hit + loo_miss, 1),
        "loo_hit": loo_hit,
        "loo_miss": loo_miss,
        "loo_no_independent_vote": loo_unknown,
        "symprec": args.symprec,
        "collisions": collisions,
    }
    Path(args.report_out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.report_out, "w") as f:
        json.dump(report, f, indent=2)
    with open(args.table_out, "w") as f:
        json.dump({"map": table,
                   "meta": {k: report[k] for k in
                            ("rows", "coverage", "collision_fingerprints",
                             "loo_agree", "symprec")}}, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "collisions"},
                     indent=2))


if __name__ == "__main__":
    main()
