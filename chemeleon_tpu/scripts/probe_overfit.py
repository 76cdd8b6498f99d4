"""Overfit positive control for structure_matching (CPU-only).

The full-protocol structure_matching is 0.000 in every mode and the rms
diagnostic (results/structure_gap.json) says the 596-row flagship's
geometry is simply diffuse. This control closes the loop on the PIPELINE:
train a small model on a handful of mp-40 rows until it memorizes them,
CSP-sample those same rows, and run the same matcher. A nonzero match rate
here proves train -> sample -> StructureMatcher can reproduce known
structures end to end, pinning the full-protocol zero on data scale / model
capacity rather than any pipeline defect.

Runs entirely on CPU (tiny model) so it can execute beside a TPU job.

    python -m chemeleon_tpu.scripts.probe_overfit
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parents[2]


def build_split(src: Path, out_dir: Path, n_rows: int, max_atoms: int):
    from chemeleon_tpu.chem.cif import parse_cif
    csv.field_size_limit(10 ** 9)
    with open(src) as f:
        rows = list(csv.DictReader(f))
    picked = []
    for r in rows:
        try:
            st = parse_cif(r["cif"])
        except Exception:
            continue
        if len(st) <= max_atoms:
            picked.append((r, st))
        if len(picked) >= n_rows:
            break
    out_dir.mkdir(parents=True, exist_ok=True)
    for split in ("train", "val", "test"):
        with open(out_dir / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(picked[0][0].keys()))
            w.writeheader()
            w.writerows([r for r, _ in picked])
    return picked


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rows", type=int, default=12)
    ap.add_argument("--max-atoms", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--n-samples", type=int, default=20)
    ap.add_argument("--data-dir", default=".data_cache/mp40-overfit")
    ap.add_argument("--out", default="results/overfit_control.json")
    args = ap.parse_args()

    from chemeleon_tpu.chem.matcher import StructureMatcher
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.trainer import Trainer

    picked = build_split(REPO / "data/mp-40/test.csv",
                         Path(args.data_dir), args.n_rows, args.max_atoms)
    print(f"{len(picked)} rows to memorize "
          f"(natoms {[len(st) for _, st in picked]})")

    cfg = get_config(
        "chemeleon_composition", exp_name="mp40_overfit",
        data_dir=args.data_dir, log_dir="logs",
        hidden_dim=256, num_layers=4, num_freqs=64, time_dim=64,
        text_dim=128, text_embed_dim=128,
        batch_size=max(4, args.n_rows), lr=1e-3, scheduler="cosine",
        max_epochs=args.epochs, early_stopping=10 ** 6,
        checkpoint_every_n_epochs=200, cond_drop_prob=0.1)
    trainer = Trainer(cfg, text_backend="hash")
    result = trainer.fit()
    losses = [h["val/loss"] for h in result["history"]]
    print(f"val/loss first {losses[0]:.3f} last {losses[-1]:.3f}")

    model = trainer.model
    sm = StructureMatcher()
    report_rows = []
    n_hit = 0
    for ridx, (row, gt) in enumerate(picked):
        comp_counts = gt.atom_types
        natoms = [len(gt)] * args.n_samples
        texts = [row["composition"]] * args.n_samples
        crystals = model.sample_batch(
            natoms, texts, fixed_types=[np.asarray(comp_counts)]
            * args.n_samples, key=jax.random.PRNGKey(100 + ridx))
        dists = []
        hits = 0
        for c in crystals:
            try:
                hits += sm.fit(gt, c)
                d = sm.get_rms_dist(gt, c)
            except Exception:
                d = None
            if d is not None:
                dists.append(float(d))
        n_hit += hits > 0
        report_rows.append({
            "material_id": row.get("material_id", str(ridx)),
            "natoms": len(gt), "matches": int(hits),
            "best_rms_norm": min(dists) if dists else None})
        print(report_rows[-1], flush=True)

    summary = {
        "rows": len(picked),
        "rows_with_match": n_hit,
        "structure_matching": n_hit / len(picked),
        "val_loss_final": losses[-1],
        "epochs": len(losses),
    }
    print(json.dumps(summary, indent=2))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump({"summary": summary, "rows": report_rows}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
