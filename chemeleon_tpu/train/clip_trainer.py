"""Crystal-CLIP training loop (reference run_crystal_clip.py:19-93).

Per-parameter-group learning rates match the reference
(crystal_clip.py:172-191): text tower 1e-5, graph tower 1e-4, projection
heads cfg.lr — implemented with optax.multi_transform over param labels.
The text tower's forward runs INSIDE the jitted, differentiated loss (tokens
cross the host/device boundary, not embeddings), so its LR group is live.

Parity with the reference driver (run_crystal_clip.py:74-93):
  * orbax best/last checkpoints including optimizer state (ModelCheckpoint
    monitor="val_loss" + save_last),
  * exact resume,
  * final test pass on the BEST checkpoint (trainer.test(ckpt_path="best")),
  * mesh-sharded train step (the DDP replacement): batch split on the data
    axis, GSPMD inserts the gradient all-reduce.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import optax
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding, PartitionSpec as P

from chemeleon_tpu.config import ChemeleonConfig
from chemeleon_tpu.data.datamodule import DataModule
from chemeleon_tpu.models.clip import CrystalClip
from chemeleon_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicate
from chemeleon_tpu.train.optim import EarlyStopping
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
        self.mesh = None
        if cfg.mesh_shape != (1, 1):
            self.mesh = make_mesh(cfg.mesh_shape)
        self.logger = MetricLogger(cfg.log_dir, cfg.exp_name,
                                   cfg.project_name, offline=True,
                                   config=cfg.to_dict())
        ckpt_dir = Path(cfg.log_dir) / cfg.exp_name / "clip_checkpoints"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.ckpt_dir = ckpt_dir

        def step(params, opt_state, batch, text_input):
            if self.mesh is not None:
                shard = lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh,
                                     P(DATA_AXIS, *([None] * (x.ndim - 1)))))
                batch = jax.tree.map(shard, batch)
                text_input = jax.tree.map(shard, text_input)

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

    # -- checkpointing (orbax; reference ModelCheckpoint run_crystal_clip.py:74-81)
    def save_checkpoint(self, tag: str, params, opt_state, epoch: int,
                        global_step: int, val_loss: float) -> None:
        path = (self.ckpt_dir / tag).absolute()
        if path.exists():
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path / "params", params)
        ckptr.wait_until_finished()
        if opt_state is not None:
            ckptr.save(path / "opt_state", opt_state)
            ckptr.wait_until_finished()
        meta = {"epoch": epoch, "global_step": global_step,
                "val_loss": float(val_loss), "config": self.cfg.to_dict()}
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f, default=str)

    def load_checkpoint(self, path: str, params_like, opt_state_like=None):
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(Path(path).absolute() / "params", params_like)
        with open(Path(path) / "meta.json") as f:
            meta = json.load(f)
        opt_state = None
        if opt_state_like is not None and (Path(path) / "opt_state").exists():
            opt_state = ckptr.restore(Path(path).absolute() / "opt_state",
                                      opt_state_like)
        return params, meta, opt_state

    # -- loops -----------------------------------------------------------------
    def _text(self, texts):
        return self.clip.text_inputs(texts)

    def _shard_data(self, tree):
        if self.mesh is None:
            return tree
        dp = self.mesh.shape[DATA_AXIS]
        leaves = jax.tree.leaves(tree)
        if leaves and leaves[0].shape[0] % dp != 0:
            # ragged final val/test batch: keep on host; the step/eval jit
            # recompiles once for the replicated layout
            return tree
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                self.mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))), tree)

    def evaluate(self, params, loader) -> float:
        total, count = 0.0, 0
        for batch, texts in loader:
            loss = self._eval(params, self._shard_data(batch),
                              self._shard_data(self._text(texts)))
            total += float(loss) * batch.batch_size
            count += batch.batch_size
        return total / max(count, 1)

    def fit(self, max_epochs: Optional[int] = None,
            resume_from: Optional[str] = None) -> Dict[str, Any]:
        cfg = self.cfg
        max_epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        self.dm.setup(None)
        params = self.clip.init_params(jax.random.PRNGKey(cfg.seed))
        start_epoch = 0
        restored_opt = None
        if resume_from:
            params, meta, restored_opt = self.load_checkpoint(
                resume_from, params, opt_state_like=self.tx.init(params))
            start_epoch = meta["epoch"] + 1
        if self.mesh is not None:
            params = replicate(self.mesh, params)
            if restored_opt is not None:
                # orbax restores onto a single device; the jitted step needs
                # params and opt_state on the same device set
                restored_opt = replicate(self.mesh, restored_opt)
        opt_state = restored_opt if restored_opt is not None \
            else self.tx.init(params)

        # resume must not clobber a better pre-resume "best" checkpoint
        best = float("inf")
        best_meta = Path(self.ckpt_dir) / "best" / "meta.json"
        if resume_from and best_meta.exists():
            with open(best_meta) as f:
                best = float(json.load(f)["val_loss"])
        gs = 0
        epoch = start_epoch - 1
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            for batch, texts in self.dm.train_dataloader(epoch):
                params, opt_state, loss = self._step(
                    params, opt_state, self._shard_data(batch),
                    self._shard_data(self._text(texts)))
                if gs % 50 == 0:
                    loss_val = float(loss)
                    if not np.isfinite(loss_val):
                        self.logger.log({"train/loss": loss_val,
                                         "fatal": "non-finite loss"}, gs)
                        raise FloatingPointError(
                            f"non-finite CLIP loss at step {gs} "
                            f"(epoch {epoch})")
                    self.logger.log({"train/loss": loss_val}, gs)
                gs += 1
            val = self.evaluate(params, self.dm.val_dataloader())
            self.logger.log({"val/loss": val, "epoch": epoch,
                             "epoch_time": time.time() - t0}, gs)
            self.save_checkpoint("last", params, opt_state, epoch, gs, val)
            if val < best:
                best = val
                self.save_checkpoint("best", params, opt_state, epoch, gs, val)
            if self.early.update(val):
                break

        # reference: trainer.test(ckpt_path="best") — reload BEST from disk
        best_params = params
        if (self.ckpt_dir / "best").exists():
            best_params, _, _ = self.load_checkpoint(
                str(self.ckpt_dir / "best"), params)
        test = self.evaluate(best_params, self.dm.test_dataloader())
        self.logger.log({"test/loss": test}, gs)
        return {"best_val_loss": best, "test_loss": test,
                "params": best_params}
