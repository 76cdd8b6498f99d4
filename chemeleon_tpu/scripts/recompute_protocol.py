"""Recompute full-protocol metrics from a cached generation (CPU-only).

The generation cache written by ``chemeleon evaluate --cache-generation``
(eval/evaluate.py::_packed_generate) is keyed by row position, so metric
definitions can be iterated without re-sampling 14k structures on the chip.
Pins jax to CPU before any model import so it can run while a TPU job owns
the chip (two concurrent TPU clients contend — CLAUDE.md).

Usage:
  python -m chemeleon_tpu.scripts.recompute_protocol \
      --model logs/mp40_comp/checkpoints/best --save-path results/full_protocol
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--save-path", required=True)
    ap.add_argument("--test-data", default="data/mp-40/test.csv")
    ap.add_argument("--n-samples", type=int, default=20)
    ap.add_argument("--csp", action="store_true")
    ap.add_argument("--fixed-cell", action="store_true")
    ap.add_argument("--comp-prior-scale", type=float, default=0.0)
    ap.add_argument("--sample-steps", type=int, default=0)
    ap.add_argument("--max-rows", type=int, default=None)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--rescore", action="store_true",
                    help="drop the incremental scoring checkpoint "
                         "(scores.jsonl) so changed metric definitions "
                         "re-score every row instead of resuming")
    ap.add_argument("--allow-generate", action="store_true",
                    help="permit generating chunks missing from the cache "
                         "on this (CPU) host; by default missing chunks are "
                         "skipped — scoring must never silently re-sample "
                         "thousands of structures at CPU speed")
    ap.add_argument("--only-split", nargs="+", default=None,
                    help="CSV path(s); score only rows whose material_id "
                         "appears in them (e.g. the held-out val/test "
                         "splits) — a later unfiltered run resumes from "
                         "scores.jsonl and fills in the rest")
    args = ap.parse_args()

    score_ids = None
    if args.only_split:
        import csv
        csv.field_size_limit(10 ** 9)
        score_ids = set()
        for path in args.only_split:
            with open(path) as f:
                for row in csv.DictReader(f):
                    score_ids.add(row["material_id"])
        print(f"--only-split: scoring {len(score_ids)} material_ids first")

    if args.rescore:
        from pathlib import Path
        sp = Path(args.save_path) / "scores.jsonl"
        if sp.exists():
            sp.unlink()
            print(f"--rescore: removed {sp}")

    import jax
    jax.config.update("jax_platforms", "cpu")

    from chemeleon_tpu.eval.evaluate import test_evaluate
    from chemeleon_tpu.models.chemeleon import Chemeleon

    model = Chemeleon.load_from_checkpoint(args.model, use_ema=args.use_ema)
    test_evaluate(model, test_data=args.test_data, n_samples=args.n_samples,
                  save_path=args.save_path, csp=args.csp,
                  comp_prior_scale=args.comp_prior_scale,
                  sample_steps=args.sample_steps, max_rows=args.max_rows,
                  cache_generation=True, fixed_cell=args.fixed_cell,
                  score_ids=score_ids,
                  cache_only=not args.allow_generate)


if __name__ == "__main__":
    main()
