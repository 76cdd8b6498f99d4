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
    # a fixed override pins that dimension: drop it from the search space
    # (e.g. `hidden_dim=512` with the default space would otherwise collide)
    space = {k: v for k, v in space.items() if k not in fixed}
    if not space:
        raise SystemExit("every sweep dimension is pinned by a fixed "
                         "override — nothing to search")

    if args.wandb:
        return _wandb_sweep(args, space, fixed)

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
        # dict-merge, later keys win: suggestions override nothing fixed
        # (disjoint by construction above) and the exp name is always ours
        cfg = get_config(args.named_config,
                         **{**fixed, **overrides,
                            "exp_name": f"sweep_{trial}"})
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


def _wandb_sweep(args, space, fixed) -> None:
    """The reference behavior (reference sweep.py:18-33): delegate Bayesian
    optimization to the wandb sweep backend, honoring the same --space-json
    and fixed key=value overrides as the TPE path. Requires wandb + network
    access; the in-repo TPE path above is the offline default."""
    try:
        import wandb
    except ImportError as e:
        raise SystemExit(
            "--wandb requires the wandb package (not available offline); "
            "drop the flag to use the in-repo TPE sweep") from e

    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.trainer import Trainer

    def to_wandb(v):
        if isinstance(v, list):
            return {"values": v}
        if isinstance(v, tuple) and v and v[0] == "log":
            return {"distribution": "log_uniform_values",
                    "min": v[1], "max": v[2]}
        if isinstance(v, tuple) and len(v) == 2:
            return {"min": v[0], "max": v[1]}
        raise ValueError(f"cannot express sweep dimension {v!r} for wandb")

    sweep_config = {  # reference sweep.py:20-31
        "method": "bayes" if args.method == "bayes" else "random",
        "metric": {"name": "val/loss", "goal": "minimize"},
        "parameters": {k: to_wandb(v) for k, v in space.items()},
    }
    sweep_id = wandb.sweep(sweep_config, project="chemeleon-tpu")

    def run_trial():
        with wandb.init() as run:
            cfg = get_config(args.named_config,
                             **{**fixed, **dict(run.config),
                                "offline": False})
            # per-trial exp_name: without it every trial writes checkpoints/
            # logs into the same logs/<exp_name> dir and overwrites the rest
            cfg = cfg.replace(exp_name=f"{cfg.exp_name}_sweep_{run.id}")
            out = Trainer(cfg).fit(max_epochs=args.max_epochs)
            run.log({"val/loss": out["best_val_loss"]})

    wandb.agent(sweep_id, function=run_trial, count=args.count)


if __name__ == "__main__":
    main()
