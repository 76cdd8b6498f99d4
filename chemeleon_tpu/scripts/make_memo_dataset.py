"""Build a bucket-aligned memorization dataset from mp-40 rows.

The structure_matching investigation (BENCH.md round 4) needs training sets
where the model CAN memorize: small, deduplicated by composition, and — the
part that bit us live — aligned to the bucketed loader's static-shape
batching. ``train_dataloader`` drops ragged per-bucket chunks (drop_last
keeps compile shapes static), so a tiny dataset must hold a multiple of
``batch_size`` rows in EVERY pad bucket or part of it silently never
trains (the all-buckets-empty case now raises, train/trainer.py).

This script picks the ``n`` smallest-natoms rows (unique composition),
then TRIMS each bucket's row count down to a multiple of ``batch_size``,
and writes identical train/val/test CSVs (memorization probes evaluate on
the training rows by design).

    python -m chemeleon_tpu.scripts.make_memo_dataset \
        --n 64 --batch 8 --out .data_cache/memo64
"""

from __future__ import annotations

import argparse
import csv
import random
from pathlib import Path

# the finer pad-bucket grid used by every training preset (config.py)
DEFAULT_BUCKETS = (8, 12, 16, 20, 24, 32, 36, 40)


def cif_natoms(cif: str) -> int:
    """Count atom-site rows of a CIF (label x y z occupancy ... lines)."""
    n = 0
    for line in cif.splitlines():
        parts = line.split()
        if len(parts) >= 7 and parts[0][:1].isalpha():
            try:
                float(parts[3]), float(parts[4]), float(parts[5])
            except (ValueError, IndexError):
                continue
            n += 1
    return n


def pick_bucket(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def build(source: str, out_dir: str, n: int, batch_size: int,
          seed: int = 7, max_natoms: int = 16) -> dict:
    csv.field_size_limit(10 ** 9)
    with open(source) as f:
        rows = list(csv.DictReader(f))

    candidates, seen = [], set()
    for r in rows:
        na = cif_natoms(r["cif"])
        if 2 <= na <= max_natoms and r["composition"] not in seen:
            candidates.append((na, r))
            seen.add(r["composition"])
    rng = random.Random(seed)
    rng.shuffle(candidates)
    candidates = candidates[: 4 * n]  # head-room for bucket trimming
    candidates.sort(key=lambda t: t[0])
    chosen = candidates[:n]

    by_bucket: dict = {}
    for na, r in chosen:
        by_bucket.setdefault(pick_bucket(na), []).append(r)
    kept, dropped = [], 0
    for b, rr in sorted(by_bucket.items()):
        keep = (len(rr) // batch_size) * batch_size
        kept.extend(rr[:keep])
        dropped += len(rr) - keep
    if not kept:
        raise SystemExit(
            f"no bucket reached batch_size={batch_size} rows; lower the "
            f"batch or raise --n")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for stale in out.glob(".cache_*"):
        stale.unlink()  # npz preprocess caches keyed by split name
    for split in ("train", "val", "test"):
        with open(out / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(kept)
    stats = {
        "rows": len(kept), "dropped_for_alignment": dropped,
        "buckets": {b: len(rr) - (len(rr) % batch_size)
                    for b, rr in sorted(by_bucket.items())
                    if len(rr) >= batch_size},
        "batch_size": batch_size, "out": str(out),
    }
    print(stats)
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="data/mp-40/test.csv")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8,
                    help="must match the training run's batch_size")
    ap.add_argument("--max-natoms", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    build(args.source, args.out, args.n, args.batch, args.seed,
          args.max_natoms)


if __name__ == "__main__":
    main()
