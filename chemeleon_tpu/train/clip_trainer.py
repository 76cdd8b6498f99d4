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
from chemeleon_tpu.train.optim import (
    EarlyStopping,
    PlateauScale,
    set_group_learning_rates,
)
from chemeleon_tpu.utils.logging import MetricLogger
from chemeleon_tpu.utils.watchdog import HangWatchdog


def clip_param_labels(params):
    """Per-leaf LR-group labels matching the reference param groups
    (crystal_clip.py:172-181): text tower / graph encoder / BOTH projection
    heads. graph_proj lives inside the GraphTower module tree, so labels
    must descend into the "graph" subtree to give it the proj LR."""
    from collections.abc import Mapping

    def fill(tree, label, proj_under=None):
        if isinstance(tree, Mapping):
            return {k: fill(v, "proj" if k == proj_under else label,
                            proj_under)
                    for k, v in tree.items()}
        return label

    out = {}
    for k, v in params.items():
        if k == "text_tower":
            out[k] = fill(v, "text_tower")
        elif k == "graph":
            out[k] = fill(v, "graph", proj_under="graph_proj")
        else:  # text_proj head
            out[k] = fill(v, "proj")
    return out


def build_clip_optimizer(cfg: ChemeleonConfig) -> optax.GradientTransformation:
    """Reference optimizer (crystal_clip.py:172-191): Adam with per-group
    LRs (see clip_param_labels), weight_decay (L2 on the gradient, torch
    Adam semantics), and per-group inject_hyperparams so the plateau
    scheduler can scale LRs without recompiling."""
    label_fn = clip_param_labels
    adam = lambda lr: optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    tx = optax.multi_transform(
        {
            "text_tower": adam(cfg.text_encoder_lr),
            "graph": adam(cfg.graph_encoder_lr),
            "proj": adam(cfg.lr),
        },
        label_fn)
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
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
        # ReduceLROnPlateau on val/loss scaling all three LR groups
        # (reference crystal_clip.py:182-191, min_lr=1e-6)
        self.plateau = PlateauScale(cfg.patience)
        self._min_lr = 1e-6
        self.mesh = None
        if cfg.mesh_shape != (1, 1):
            self.mesh = make_mesh(cfg.mesh_shape)
        self.logger = MetricLogger(cfg.log_dir, cfg.exp_name,
                                   cfg.project_name, offline=cfg.offline,
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
                "val_loss": float(val_loss), "config": self.cfg.to_dict(),
                "plateau": self.plateau.state_dict(),
                "early": self.early.state_dict()}
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
        gs = 0
        if resume_from:
            params, meta, restored_opt = self.load_checkpoint(
                resume_from, params, opt_state_like=self.tx.init(params))
            start_epoch = meta["epoch"] + 1
            gs = int(meta.get("global_step", 0))
            if "plateau" in meta:
                self.plateau.load_state_dict(meta["plateau"])
            if "early" in meta:
                self.early.load_state_dict(meta["early"])
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
        epoch = start_epoch - 1

        def _apply_plateau(opt_state, scale):
            return set_group_learning_rates(opt_state, {
                "text_tower": max(cfg.text_encoder_lr * scale, self._min_lr),
                "graph": max(cfg.graph_encoder_lr * scale, self._min_lr),
                "proj": max(cfg.lr * scale, self._min_lr)})

        if self.plateau.scale != 1.0:  # resumed mid-decay
            opt_state = _apply_plateau(opt_state, self.plateau.scale)
        # wedged-device recovery: see utils/watchdog.py + Trainer.fit
        watchdog = (HangWatchdog(cfg.watchdog_timeout_s,
                                 where=f"ClipTrainer.fit({cfg.exp_name})")
                    if cfg.watchdog_timeout_s > 0 else None)
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            for batch, texts in self.dm.train_dataloader(epoch):
                if watchdog is not None:
                    watchdog.beat()
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
            scale = self.plateau.update(val)
            opt_state = _apply_plateau(opt_state, scale)
            self.logger.log({"val/loss": val, "epoch": epoch,
                             "lr_scale": scale,
                             "epoch_time": time.time() - t0}, gs)
            self.save_checkpoint("last", params, opt_state, epoch, gs, val)
            if val < best:
                best = val
                self.save_checkpoint("best", params, opt_state, epoch, gs, val)
            if self.early.update(val):
                break
        if watchdog is not None:
            watchdog.stop()

        # reference: trainer.test(ckpt_path="best") — reload BEST from disk
        best_params = params
        if (self.ckpt_dir / "best").exists():
            best_params, _, _ = self.load_checkpoint(
                str(self.ckpt_dir / "best"), params)
        test = self.evaluate(best_params, self.dm.test_dataloader())
        self.logger.log({"test/loss": test}, gs)
        return {"best_val_loss": best, "test_loss": test,
                "params": best_params}
