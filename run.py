"""Diffusion training entrypoint (reference: run.py:20-92).

The reference uses sacred: ``python run.py with chemeleon_clip_prompt
key=value``. Same surface here (the ``with`` token is optional):

    python run.py chemeleon_clip_prompt batch_size=64 max_epochs=10
"""

from __future__ import annotations

import sys
from typing import Any, Dict


def parse_cli(argv) -> tuple:
    name = None
    overrides: Dict[str, Any] = {}
    args = [a for a in argv if a != "with"]
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = _coerce(v)
        elif name is None:
            name = a
        else:
            raise SystemExit(f"unexpected argument {a!r}")
    return name, overrides


def _coerce(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v.lower() in ("none", "null"):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if v.startswith("[") or v.startswith("("):
        import ast
        return tuple(ast.literal_eval(v))
    return v


def main(argv=None) -> None:
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.trainer import Trainer

    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = get_config(name, **overrides)
    print(f"exp_name: {cfg.exp_name}\ngroup_name: {cfg.group_name}")

    import numpy as np
    np.random.seed(cfg.seed)

    trainer = Trainer(cfg)
    result = trainer.fit(resume_from=cfg.resume_from)
    print(f"best val/loss: {result['best_val_loss']:.5f} "
          f"after {result['epochs']} epochs")


if __name__ == "__main__":
    main()
