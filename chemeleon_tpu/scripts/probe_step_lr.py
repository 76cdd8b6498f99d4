"""Sweep the corrector strength (step_lr, corrector noise) for raw validity.

VERDICT r3 weak-#2: raw validity on the full 1000-step chain is ~0.5-0.6
while the few-step mode (which skips most corrector steps) measures HIGHER
raw validity — i.e. the reference-inherited Langevin corrector settings
(step_lr=1e-5, reference chemeleon.py:452-462, never tuned upstream) may
actively hurt. This probe sweeps, on the full reference-parity chain:

    step_lr          in {0, 1e-7, 1e-6, 1e-5, 1e-4}   (0 = corrector off)
    corrector_noise  in {1.0, 0.0}                     (0 = drift only)

Both are traced jit arguments, so the whole grid reuses ONE compiled
sampler per (B, N) shape. Measures raw validity, soft-sphere-relaxed
validity, and exact-composition match on guided sampling of real test-row
(composition, natoms) pairs — the same protocol as the bench validity cell.

    python -m chemeleon_tpu.scripts.probe_step_lr \
        --model logs/mp40_comp_aug/checkpoints/best \
        --out results/step_lr_sweep.json
"""

from __future__ import annotations

import argparse
import csv
import json
import random
from pathlib import Path

import jax

REPO = Path(__file__).resolve().parents[2]

STEP_LRS = [0.0, 1e-7, 1e-6, 1e-5, 1e-4]
NOISES = [1.0, 0.0]
# (bucket, batch): bucket-16 rows at B=128 and bucket-32 rows at B=64 keep
# the dual-replica edge tensor inside the measured memory budget
CELLS = [(16, 128), (32, 64)]


def _fitting_rows(rows, lo, hi, want):
    out = []
    for r in rows:
        try:
            n = int(r["natoms"]) if "natoms" in r else None
        except (KeyError, ValueError):
            n = None
        if n is None:
            from chemeleon_tpu.chem.cif import parse_cif
            try:
                n = len(parse_cif(r["cif"]))
            except Exception:
                continue
        if lo < n <= hi:
            out.append((r["composition"], n))
        if len(out) >= want:
            break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/step_lr_sweep.json")
    args = ap.parse_args()

    from chemeleon_tpu.chem.composition import (
        parse_composition, reduced_composition,
        reduced_formula_alphabetical)
    from chemeleon_tpu.chem.validity import structure_validity
    from chemeleon_tpu.eval.optimize import SoftSphereCalculator, fire_relax
    from chemeleon_tpu.models.chemeleon import Chemeleon

    model = Chemeleon.load_from_checkpoint(args.model)
    calc = SoftSphereCalculator(radius_scale=0.6)

    csv.field_size_limit(10 ** 9)
    with open(REPO / "data" / "mp-40" / "test.csv") as f:
        raw_rows = list(csv.DictReader(f))
    random.Random(0).shuffle(raw_rows)

    report = {}
    for bucket, B in CELLS:
        fit = _fitting_rows(raw_rows, bucket - 8, bucket, B)
        texts = [c for c, _ in fit]
        natoms = [n for _, n in fit]
        canon = {c: reduced_formula_alphabetical(
            reduced_composition(parse_composition(c))) for c in texts}
        cell = {}
        for step_lr in STEP_LRS:
            for noise in NOISES:
                if step_lr == 0.0 and noise == 0.0:
                    continue  # identical to (0, 1.0): std2 is already 0
                key = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed),
                    hash((step_lr, noise)) % (2 ** 31))
                crystals = model.sample_batch(
                    natoms, texts, key=key, n_max=bucket,
                    step_lr=step_lr, corrector_noise=noise)
                n_valid = n_relax = n_match = 0
                for c, text in zip(crystals, texts):
                    n_match += c.reduced_formula() == canon[text]
                    if structure_validity(c):
                        n_valid += 1
                        n_relax += 1
                    else:
                        relaxed, _ = fire_relax(c, calc, steps=60)
                        n_relax += structure_validity(relaxed)
                tag = f"lr{step_lr:g}_noise{noise:g}"
                cell[tag] = {"valid": round(n_valid / len(fit), 4),
                             "valid_relaxed": round(n_relax / len(fit), 4),
                             "comp_match": round(n_match / len(fit), 4)}
                print(f"N<={bucket} {tag}: {cell[tag]}", flush=True)
        report[str(bucket)] = {"n": len(fit), **cell}

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
