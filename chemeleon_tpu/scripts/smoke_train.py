"""Real-data training smoke: train a compact model on real mp-40 rows.

The upstream train/val CSVs are LFS-missing (SURVEY §2.4); this script splits
the available 708-row test.csv into train/val/test, trains a compact
Chemeleon for a few epochs on the TPU, and reports the val-loss trajectory +
a small evaluation — end-to-end evidence that the pipeline learns on real
chemistry.

Usage: python -m chemeleon_tpu.scripts.smoke_train \
           --source data/mp-40/test.csv --epochs 30
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path


def split_csv(source: str, out_dir: str, val_frac: float = 0.08,
              test_frac: float = 0.08, seed: int = 0) -> None:
    import random
    csv.field_size_limit(10 ** 9)
    with open(source) as f:
        rows = list(csv.DictReader(f))
    rng = random.Random(seed)
    rng.shuffle(rows)
    n = len(rows)
    n_val = max(1, int(n * val_frac))
    n_test = max(1, int(n * test_frac))
    splits = {"val": rows[:n_val], "test": rows[n_val:n_val + n_test],
              "train": rows[n_val + n_test:]}
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for split, rr in splits.items():
        with open(out / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rr)
    print({k: len(v) for k, v in splits.items()})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="data/mp-40/test.csv")
    ap.add_argument("--data-dir", default=".data_cache/mp40-smoke")
    ap.add_argument("--log-dir", default="logs")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--exp-name", default="mp40_smoke")
    ap.add_argument("--preset", default="chemeleon_bert_composition",
                    help="named config; e.g. chemeleon_composition for the "
                         "offline element-fraction conditioner")
    ap.add_argument("--text-backend", default="hash")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--scheduler", default="constant",
                    choices=["constant", "cosine", "linear_decay",
                             "reduce_on_plateau"])
    ap.add_argument("--ckpt-every", type=int, default=1,
                    help="rolling-last checkpoint cadence in epochs (the "
                         "save is a blocking ~4s device pull; raise for "
                         "short-epoch runs)")
    ap.add_argument("--eval-rows", type=int, default=8)
    ap.add_argument("--eval-samples", type=int, default=8)
    ap.add_argument("--aug-sub", type=float, default=0.0,
                    help="isovalent element-substitution augmentation "
                         "probability per species (data/augment.py)")
    ap.add_argument("--aug-supercell", action="store_true",
                    help="deterministic 2x-supercell (Z-factor) expansion "
                         "of rows that fit the atom cap")
    ap.add_argument("--aug-supercell-z", type=int, default=2,
                    help="largest supercell factor (2 = round-4 behavior; "
                         "3 adds a triple-cell copy of every row with "
                         "<=max_atoms/3 atoms)")
    ap.add_argument("--aug-lat", type=float, default=0.0,
                    help="per-epoch lattice-strain jitter amplitude "
                         "(relative; 0 = off)")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="> 0 maintains EMA params (saved as params_ema in "
                         "every checkpoint; val/loss_ema logged)")
    ap.add_argument("--resume-from", default=None,
                    help="checkpoint dir to resume from")
    ap.add_argument("--watchdog", type=float, default=0.0,
                    help="hang-watchdog timeout in seconds (0 = off); pair "
                         "with train_resilient --resume-flag --resume-from=")
    args = ap.parse_args()

    if not (Path(args.data_dir) / "train.csv").exists():
        split_csv(args.source, args.data_dir)

    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.trainer import Trainer

    cfg = get_config(
        args.preset,
        exp_name=args.exp_name, data_dir=args.data_dir, log_dir=args.log_dir,
        hidden_dim=args.hidden, num_layers=args.layers, num_freqs=64,
        time_dim=64, text_dim=128, text_embed_dim=128, batch_size=args.batch,
        lr=args.lr, scheduler=args.scheduler, early_stopping=10 ** 6,
        checkpoint_every_n_epochs=args.ckpt_every, max_epochs=args.epochs,
        ema_decay=args.ema_decay, watchdog_timeout_s=args.watchdog,
        aug_substitution_prob=args.aug_sub, aug_supercell=args.aug_supercell,
        aug_supercell_max_z=args.aug_supercell_z,
        aug_lattice_noise=args.aug_lat)
    trainer = Trainer(cfg, text_backend=args.text_backend)
    result = trainer.fit(resume_from=args.resume_from)
    losses = [h["val/loss"] for h in result["history"]]
    print(json.dumps({"val_loss_first": losses[0], "val_loss_last": losses[-1],
                      "val_loss_best": min(losses), "epochs": len(losses)}))

    if args.eval_rows <= 0 or args.eval_samples <= 0:
        return
    # quick evaluation on a few held-out rows
    from chemeleon_tpu.eval.evaluate import test_evaluate
    means = test_evaluate(trainer.model,
                          test_data=Path(args.data_dir) / "test.csv",
                          n_samples=args.eval_samples,
                          max_rows=args.eval_rows,
                          save_path=Path(args.log_dir) / f"{args.exp_name}_eval",
                          progress=False)
    print(json.dumps(means))


if __name__ == "__main__":
    main()
