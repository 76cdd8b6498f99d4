"""Subset a protocol results.csv by split membership and recompute means.

The full 706x20 reference protocol (reference evaluate.py:26-28) runs over
data/mp-40/test.csv, which under the derived split (smoke_train.split_csv,
seed 0) contains the 596 train rows AND the 112 held-out (val+test) rows.
Because eval/evaluate.py saves per-row metrics keyed by material_id, the
held-out headline (first-nonzero structure_matching, composition_matching
targets — VERDICT r4 items 1-2) is a pure CPU subset of the full run: no
second generation pass is needed.

Usage:
  python -m chemeleon_tpu.scripts.subset_means \
      --results results/full_protocol_geo2/results.csv \
      --splits .data_cache/mp40-smoke/test.csv .data_cache/mp40-smoke/val.csv \
      --out results/full_protocol_geo2/means_heldout.json
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import numpy as np


def subset_means(results_csv: str, split_csvs, out: str | None = None,
                 invert: bool = False) -> dict:
    csv.field_size_limit(10 ** 9)
    ids = set()
    for path in split_csvs:
        with open(path) as f:
            for row in csv.DictReader(f):
                ids.add(row["material_id"])

    with open(results_csv) as f:
        rows = list(csv.DictReader(f))
    picked = [r for r in rows
              if (r["material_id"] in ids) != invert]

    means: dict = {"rows_total": len(rows), "rows_subset": len(picked)}
    if not picked:
        return means
    for k in picked[0]:
        if k == "material_id":
            continue
        vals = []
        for r in picked:
            v = r[k]
            if v == "True":
                vals.append(1.0)
            elif v == "False":
                vals.append(0.0)
            else:
                try:
                    vals.append(float(v))
                except ValueError:
                    break
        else:
            arr = np.asarray(vals, np.float64)
            finite = arr[np.isfinite(arr)]
            means[f"mean_{k}"] = (float(finite.mean()) if len(finite)
                                  else float("nan"))
            means[f"stderr_{k}"] = (
                float(finite.std(ddof=1) / np.sqrt(len(finite)))
                if len(finite) > 1 else float("nan"))
            means[f"n_{k}"] = int(len(finite))
    if out:
        Path(out).parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as f:
            json.dump(means, f, indent=2)
    return means


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--splits", nargs="+", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--invert", action="store_true",
                    help="keep rows NOT in the splits (train-side subset)")
    args = ap.parse_args()
    means = subset_means(args.results, args.splits, args.out, args.invert)
    print(json.dumps(means, indent=2))


if __name__ == "__main__":
    main()
