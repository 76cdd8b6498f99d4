"""Crystal-CLIP training loop (reference run_crystal_clip.py:19-93).

Per-parameter-group learning rates match the reference
(crystal_clip.py:172-191): text tower 1e-5, graph tower 1e-4, projection
heads cfg.lr — implemented with optax.multi_transform over param labels.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from chemeleon_tpu.config import ChemeleonConfig
from chemeleon_tpu.data.datamodule import DataModule
from chemeleon_tpu.models.clip import CrystalClip
from chemeleon_tpu.train.optim import EarlyStopping, LRScheduler
from chemeleon_tpu.utils.logging import MetricLogger


def build_clip_optimizer(cfg: ChemeleonConfig) -> optax.GradientTransformation:
    def label_fn(params):
        return {
            k: ("text_tower" if k == "text_tower"
                else "graph" if k == "graph" else "proj")
            for k in params
        }

    tx = optax.multi_transform(
        {
            "text_tower": optax.adam(cfg.text_encoder_lr),
            "graph": optax.adam(cfg.graph_encoder_lr),
            "proj": optax.adam(cfg.lr),
        },
        label_fn)
    if cfg.gradient_clip_val and cfg.gradient_clip_val > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip_val), tx)
    return tx


class ClipTrainer:
    def __init__(self, cfg: ChemeleonConfig, clip: Optional[CrystalClip] = None,
                 datamodule: Optional[DataModule] = None,
                 text_backend: str = "auto", max_rows: Optional[int] = None):
        self.cfg = cfg
        self.clip = clip or CrystalClip(cfg, text_backend=text_backend)
        self.dm = datamodule or DataModule(cfg, max_rows=max_rows)
        self.tx = build_clip_optimizer(cfg)
        self.early = EarlyStopping(cfg.early_stopping)
        self.logger = MetricLogger(cfg.log_dir, cfg.exp_name,
                                   cfg.project_name, offline=True,
                                   config=cfg.to_dict())

        def step(params, opt_state, batch, text_input):
            def loss_fn(p):
                # text_input is tokens when the tower is trainable: the tower
                # forward runs inside loss, so grads reach params["text_tower"]
                return self.clip.loss(p, batch, text_input)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))
        self._eval = jax.jit(lambda p, b, t: self.clip.loss(p, b, t))

    def _text(self, texts):
        return self.clip.text_inputs(texts)

    def evaluate(self, params, loader) -> float:
        total, count = 0.0, 0
        for batch, texts in loader:
            loss = self._eval(params, batch, self._text(texts))
            total += float(loss) * batch.batch_size
            count += batch.batch_size
        return total / max(count, 1)

    def fit(self, max_epochs: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        max_epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        self.dm.setup(None)
        params = self.clip.init_params(jax.random.PRNGKey(cfg.seed))
        opt_state = self.tx.init(params)
        best = float("inf")
        best_params = params
        gs = 0
        for epoch in range(max_epochs):
            for batch, texts in self.dm.train_dataloader(epoch):
                params, opt_state, loss = self._step(
                    params, opt_state, batch, self._text(texts))
                if gs % 50 == 0:
                    self.logger.log({"train/loss": float(loss)}, gs)
                gs += 1
            val = self.evaluate(params, self.dm.val_dataloader())
            self.logger.log({"val/loss": val, "epoch": epoch}, gs)
            if val < best:
                best = val
                best_params = params
            if self.early.update(val):
                break
        test = self.evaluate(best_params, self.dm.test_dataloader())
        self.logger.log({"test/loss": test}, gs)
        return {"best_val_loss": best, "test_loss": test,
                "params": best_params}
