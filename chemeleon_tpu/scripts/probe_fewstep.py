"""Measure the few-step (strided) sampling frontier on-chip.

The strided sampler (models/chemeleon.py `strided_sample_ts`: D3PM jump
posterior + DDIM lattice jump) trades reverse steps for wall time at ~T/K.
The reference protocol is the full 1000-step ancestral chain
(chemeleon.py:305-467); this probe answers the deployment question the
reference never asks: how much validity does each rung of the K ladder
cost, and what does that buy in structures/s?

Per K it samples real mp-40 composition prompts at their true atom counts
from the best composition-conditioned checkpoint (the same guided protocol
as bench.py's validity pass), reporting raw validity, post-FIRE-relax
validity, exact reduced-composition match, and measured structures/s.

Usage (on-chip, one TPU process at a time):
    python -m chemeleon_tpu.scripts.probe_fewstep \
        --model logs/mp40_comp_aug/checkpoints/best \
        --out results/fewstep.json
"""

from __future__ import annotations

import argparse
import csv
import json
import random
import time
from pathlib import Path

import jax

REPO = Path(__file__).resolve().parents[2]

# chunk sizes follow bench.py BUCKET_BATCH where the shape exists; bucket 16
# uses 64 so that 128 samples = 2 chunks (1 compile + 1 timed)
CHUNK = {16: 64, 32: 32}


def _fitting_rows(rows, lo: int, hi: int, limit: int):
    """Real test-set compositions whose CIF cell size fits (lo, hi]."""
    from chemeleon_tpu.chem.cif import parse_cif

    out = []
    for r in rows:
        n = len(parse_cif(r["cif"]))
        if lo < n <= hi:
            out.append((r["composition"], n))
            if len(out) >= limit:
                break
    return out


def probe(model, steps_ladder, per_bucket: int, seed: int = 0):
    from chemeleon_tpu.chem.composition import (
        parse_composition, reduced_composition, reduced_formula_alphabetical)
    from chemeleon_tpu.chem.validity import structure_validity
    from chemeleon_tpu.eval.optimize import SoftSphereCalculator, fire_relax

    csv.field_size_limit(10 ** 9)
    with open(REPO / "data" / "mp-40" / "test.csv") as f:
        raw_rows = list(csv.DictReader(f))
    random.Random(0).shuffle(raw_rows)
    fit = {b: _fitting_rows(raw_rows, b - 8, b, per_bucket) for b in CHUNK}
    # trim to whole chunks: a ragged tail is a new (B, N, K) compile per K
    # (~40 s each through the tunnel) for 3 rows of signal
    fit = {b: rows[: len(rows) - len(rows) % CHUNK[b]]
           for b, rows in fit.items()}
    canon = {c: reduced_formula_alphabetical(
        reduced_composition(parse_composition(c)))
        for b in fit for c, _ in fit[b]}

    calc = SoftSphereCalculator(radius_scale=0.6)
    out = {}
    for K in steps_ladder:
        k_detail = {}
        tot = {"n": 0, "valid": 0, "relaxed": 0, "match": 0}
        for bucket, chunk in CHUNK.items():
            if not fit[bucket]:
                # whole-chunk trimming can empty a sparse bucket; skip it
                # rather than dividing by zero at the summary
                print(f"K={K or 'full'} N<={bucket}: no fitting rows, skip")
                continue
            n_valid = n_relax = n_match = n_tot = 0
            timed_s, timed_n = 0.0, 0
            for i in range(0, len(fit[bucket]), chunk):
                part = fit[bucket][i: i + chunk]
                texts = [c for c, _ in part]
                natoms = [n for _, n in part]
                key = jax.random.PRNGKey(seed + 7919 * K + 31 * bucket + i)
                t0 = time.perf_counter()
                crystals = model.sample_batch(natoms, texts, key=key,
                                              sample_steps=K or None)
                elapsed = time.perf_counter() - t0
                # first chunk pays the compile; a ragged final chunk is a
                # NEW (B, N, K) shape that would pay another compile inside
                # the timed window (measured: it polluted bucket-32 sps 6x
                # low, /tmp/diag_mixed.log exonerated steady-state calls at
                # 6.2s) — time only full-size steady-state chunks
                if i > 0 and len(part) == chunk:
                    timed_s += elapsed
                    timed_n += len(part)
                for c, text in zip(crystals, texts):
                    n_tot += 1
                    n_match += c.reduced_formula() == canon[text]
                    if structure_validity(c):
                        n_valid += 1
                        n_relax += 1
                    else:
                        relaxed, _ = fire_relax(c, calc, steps=60)
                        n_relax += structure_validity(relaxed)
            k_detail[str(bucket)] = {
                "n": n_tot,
                "valid": round(n_valid / n_tot, 4),
                "valid_relaxed": round(n_relax / n_tot, 4),
                "comp_match": round(n_match / n_tot, 4),
                "structures_per_sec": (round(timed_n / timed_s, 3)
                                       if timed_s else None),
            }
            tot["n"] += n_tot
            tot["valid"] += n_valid
            tot["relaxed"] += n_relax
            tot["match"] += n_match
            print(f"K={K or 'full'} N<={bucket}: valid "
                  f"{n_valid / n_tot:.3f} relaxed {n_relax / n_tot:.3f} "
                  f"match {n_match / n_tot:.3f} "
                  f"sps {k_detail[str(bucket)]['structures_per_sec']}",
                  flush=True)
        out[str(K or "full")] = {
            "buckets": k_detail,
            "valid": round(tot["valid"] / tot["n"], 4),
            "valid_relaxed": round(tot["relaxed"] / tot["n"], 4),
            "comp_match": round(tot["match"] / tot["n"], 4),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", default="results/fewstep.json")
    ap.add_argument("--per-bucket", type=int, default=128)
    ap.add_argument("--steps", type=int, nargs="+",
                    default=[0, 250, 100, 50, 20])  # 0 = full chain
    ap.add_argument("--buckets", type=int, nargs="+",
                    default=sorted(CHUNK),
                    help="restrict to a subset of the atom-count buckets")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    for b in list(CHUNK):
        if b not in args.buckets:
            del CHUNK[b]

    from chemeleon_tpu.models.chemeleon import Chemeleon
    model = Chemeleon.load_from_checkpoint(args.model)
    results = {
        "model": args.model,
        "per_bucket": args.per_bucket,
        "timesteps": model.cfg.timesteps,
        "by_steps": probe(model, args.steps, args.per_bucket, args.seed),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
