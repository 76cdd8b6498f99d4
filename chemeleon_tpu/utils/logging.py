"""Metric logging: local JSONL + console, wandb-compatible metric names.

The reference logs everything to wandb (reference run.py:68-75,
base_module.py:43-92 with names like ``train/loss``, ``val/mae_lattice``).
wandb is not available in this environment, so the default sink is a JSONL
file under log_dir; when wandb IS importable and not offline, it is used
transparently with the same names.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, exp_name: str, project_name: str = "",
                 offline: bool = True, config: Optional[Dict] = None):
        self.log_dir = Path(log_dir) / exp_name
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / "metrics.jsonl"
        self._fh = open(self.path, "a")
        self._wandb = None
        if not offline:
            try:
                import wandb
                # bounded init: on a wandb-installed host with no network
                # the default init can block through long retries at
                # constructor time; fail fast to the JSONL sink instead
                try:
                    settings = wandb.Settings(init_timeout=30)
                except TypeError:  # very old wandb
                    settings = None
                self._wandb = wandb.init(project=project_name, name=exp_name,
                                         config=config or {},
                                         settings=settings)
            except Exception:
                self._wandb = None
        if config is not None:
            with open(self.log_dir / "config.json", "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
