"""Hyperparameter sweep (reference: sweep.py:18-33 — a wandb Bayes sweep over
batch/hidden/layers/lr/wd/optimizer, count=100, minimizing val/loss).

The reference delegates the Bayesian optimization to wandb's sweep backend;
this environment has no wandb/egress, so the default here is an in-repo TPE
Bayesian optimizer (chemeleon_tpu/utils/bayesopt.py) over the same space.
``--method random`` falls back to random search; with wandb installed and
``--wandb``, the original behavior is reproduced.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from chemeleon_tpu.utils.bayesopt import TPEOptimizer

# The reference sweep space (sweep.py:20-31).
SWEEP_SPACE = {
    "batch_size": [64, 128, 256],
    "hidden_dim": [256, 512, 1024],
    "num_layers": [4, 6, 8],
    "lr": ("log", 1e-4, 1e-2),
    "weight_decay": (0.0, 1e-4),
    "optimizer": ["adam", "adamw"],
}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=100)
    ap.add_argument("--max-epochs", type=int, default=5)
    ap.add_argument("--named-config", default="chemeleon_bert_composition")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--method", choices=["bayes", "random"], default="bayes")
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--space-json", default=None,
                    help="JSON dict overriding the sweep space: lists are "
                         "categorical, [lo, hi] pairs via "
                         '{"_range": [lo, hi]} / {"_logrange": [lo, hi]}')
    ap.add_argument("--out", default="sweep_results.json")
    ap.add_argument("fixed", nargs="*", metavar="key=value",
                    help="fixed config overrides applied to every trial "
                         "(same syntax as run.py), e.g. data_dir=... "
                         "hidden_dim=512")
    args = ap.parse_args(argv)

    from run import _coerce
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.trainer import Trainer

    fixed = {}
    for kv in args.fixed:
        k, _, v = kv.partition("=")
        fixed[k] = _coerce(v)

    space = SWEEP_SPACE
    if args.space_json:
        space = {}
        for k, v in json.loads(args.space_json).items():
            if isinstance(v, dict) and "_range" in v:
                space[k] = tuple(v["_range"])
            elif isinstance(v, dict) and "_logrange" in v:
                space[k] = ("log", *v["_logrange"])
            else:
                space[k] = v

    if args.wandb:
        return _wandb_sweep(args)

    opt = TPEOptimizer(space, seed=args.seed,
                       n_startup=(args.count if args.method == "random"
                                  else min(10, max(3, args.count // 5))))
    results = []
    # Failure penalty must rank BELOW every legitimate loss, including ones
    # observed later: a fixed "worst*10" seeded at 1.0 could rank an early
    # crash as the best observation and pull TPE toward the crashing region.
    FAIL_PENALTY = 1e9
    for trial in range(args.count):
        overrides = opt.suggest()
        cfg = get_config(args.named_config, **fixed,
                         exp_name=f"sweep_{trial}", **overrides)
        try:
            tr = Trainer(cfg)
            out = tr.fit(max_epochs=args.max_epochs)
            loss = out["best_val_loss"]
            if not np.isfinite(loss):  # diverged without raising
                raise FloatingPointError(f"non-finite val loss: {loss}")
            opt.observe(overrides, loss)
            results.append({"trial": trial, **overrides,
                            "best_val_loss": loss})
        except Exception as e:
            # teach the optimizer that this region crashes/diverges —
            # otherwise TPE keeps re-proposing NaN-loss configs
            opt.observe(overrides, FAIL_PENALTY)
            results.append({"trial": trial, **overrides, "error": str(e)})
        Path(args.out).write_text(json.dumps(results, indent=2))
    best = min((r for r in results if "best_val_loss" in r),
               key=lambda r: r["best_val_loss"], default=None)
    print("best:", json.dumps(best, indent=2))


def _wandb_sweep(args) -> None:
    """The reference behavior verbatim (reference sweep.py:18-33): delegate
    Bayesian optimization to the wandb sweep backend. Requires wandb +
    network access; the in-repo TPE path above is the offline default."""
    try:
        import wandb
    except ImportError as e:
        raise SystemExit(
            "--wandb requires the wandb package (not available offline); "
            "drop the flag to use the in-repo TPE sweep") from e

    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.trainer import Trainer

    sweep_config = {  # reference sweep.py:20-31
        "method": "bayes",
        "metric": {"name": "val/loss", "goal": "minimize"},
        "parameters": {
            "batch_size": {"values": SWEEP_SPACE["batch_size"]},
            "hidden_dim": {"values": SWEEP_SPACE["hidden_dim"]},
            "num_layers": {"values": SWEEP_SPACE["num_layers"]},
            "lr": {"distribution": "log_uniform_values",
                   "min": SWEEP_SPACE["lr"][1], "max": SWEEP_SPACE["lr"][2]},
            "weight_decay": {"min": SWEEP_SPACE["weight_decay"][0],
                             "max": SWEEP_SPACE["weight_decay"][1]},
            "optimizer": {"values": SWEEP_SPACE["optimizer"]},
        },
    }
    sweep_id = wandb.sweep(sweep_config, project="chemeleon-tpu")

    def run_trial():
        with wandb.init() as run:
            cfg = get_config(args.named_config, offline=False,
                             **dict(run.config))
            out = Trainer(cfg).fit(max_epochs=args.max_epochs)
            run.log({"val/loss": out["best_val_loss"]})

    wandb.agent(sweep_id, function=run_trial, count=args.count)


if __name__ == "__main__":
    main()
