"""Training loop for the diffusion model.

TPU-native replacement for the reference's Lightning Trainer stack
(reference run.py:20-92): jitted mesh-sharded train step, epoch loop with
validation, best/last orbax checkpoints monitored on val/loss
(run.py:47-53), LR monitoring, reduce-on-plateau scheduling, early stopping
(run.py:55-60), and resume (run.py:92).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from chemeleon_tpu.config import ChemeleonConfig
from chemeleon_tpu.data.datamodule import DataModule
from chemeleon_tpu.models.chemeleon import Chemeleon
from chemeleon_tpu.parallel.mesh import make_mesh, shard_params
from chemeleon_tpu.train.optim import (
    EarlyStopping,
    LRScheduler,
    build_optimizer,
    set_learning_rate,
)
from chemeleon_tpu.train.step import make_eval_step, make_train_step
from chemeleon_tpu.utils.logging import MetricLogger
from chemeleon_tpu.utils.watchdog import HangWatchdog


class Trainer:
    def __init__(self, cfg: ChemeleonConfig, model: Optional[Chemeleon] = None,
                 datamodule: Optional[DataModule] = None,
                 text_backend: str = "auto", max_rows: Optional[int] = None):
        self.cfg = cfg
        self.model = model or Chemeleon(cfg, text_backend=text_backend)
        self.dm = datamodule or DataModule(cfg, max_rows=max_rows)
        self.tx = build_optimizer(cfg)
        self.lr_sched = LRScheduler(cfg)
        self.early = EarlyStopping(cfg.early_stopping)
        self.mesh = None
        if cfg.mesh_shape != (1, 1):
            self.mesh = make_mesh(cfg.mesh_shape)
        self.logger = MetricLogger(cfg.log_dir, cfg.exp_name,
                                   cfg.project_name, offline=cfg.offline,
                                   config=cfg.to_dict())
        ckpt_dir = Path(cfg.log_dir) / cfg.exp_name / "checkpoints"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.ckpt_dir = ckpt_dir
        self._train_step = make_train_step(self.model, self.tx, mesh=self.mesh)
        self._eval_step = make_eval_step(self.model)

    # -- checkpointing (orbax; reference ModelCheckpoint run.py:47-53) -------
    def save_checkpoint(self, tag: str, params, opt_state, epoch: int,
                        global_step: int, val_loss: float,
                        extra_meta: Optional[Dict[str, Any]] = None,
                        ema_params=None) -> None:
        """Save params AND optimizer state (exact-resume parity with
        Lightning's full training-state checkpoints, run.py:47-53)."""
        path = (self.ckpt_dir / tag).absolute()
        if path.exists():
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path / "params", params)
        ckptr.wait_until_finished()
        if opt_state is not None:
            ckptr.save(path / "opt_state", opt_state)
            ckptr.wait_until_finished()
        if ema_params is not None:
            ckptr.save(path / "params_ema", ema_params)
            ckptr.wait_until_finished()
        meta = {"epoch": epoch, "global_step": global_step,
                "val_loss": float(val_loss), "config": self.cfg.to_dict(),
                # host-side schedule state (Lightning checkpoints carry the
                # scheduler/early-stop state; without it a resumed
                # reduce_on_plateau run would restart at base lr)
                "lr_sched": self.lr_sched.state_dict(),
                "early": self.early.state_dict()}
        if extra_meta:
            meta.update(extra_meta)
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
    def _raw_text(self, texts):
        if not self.cfg.text_guide:
            return None
        # tokens when trainable_text_encoder (tower runs inside the jitted
        # loss, under grad); frozen backend embeddings otherwise
        return self.model.text_encoder.text_inputs(texts)

    def validate(self, params, epoch: int) -> Dict[str, float]:
        agg: Dict[str, float] = {}
        count = 0
        for i, (batch, texts) in enumerate(self.dm.val_dataloader()):
            # fresh key per batch: one shared key would evaluate every batch
            # at identical sampled timesteps/noise, biasing val/loss (which
            # drives best-checkpoint choice, plateau LR and early stopping)
            metrics = self._eval_step(
                params, batch, self._raw_text(texts),
                jax.random.fold_in(jax.random.PRNGKey(epoch), i))
            B = batch.batch_size
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v) * B
            count += B
        return {f"val/{k}": v / max(count, 1) for k, v in agg.items()}

    def _sampled_validity(self, params, epoch: int) -> float:
        """Fraction of freshly sampled structures passing the reference
        validity criterion (evaluate.py:177-189). Drives the
        'best_validity' checkpoint — at small-data scale val/loss and
        sample geometry decouple (BENCH.md), so selecting on loss alone
        keeps a worse generator."""
        from chemeleon_tpu.chem.validity import structure_validity

        cfg = self.cfg
        n = cfg.validity_check_samples
        # the model must sample from the CURRENT live params (its own
        # .params reference is stale mid-fit because train steps donate)
        self.model.params = params
        texts = None
        if cfg.text_guide:
            texts = ["validity probe"] * n
        crystals = self.model.sample_batch(
            [cfg.validity_check_natoms] * n, texts,
            key=jax.random.fold_in(jax.random.PRNGKey(cfg.seed ^ 0x5A), epoch))
        return sum(structure_validity(c) for c in crystals) / max(n, 1)

    def fit(self, max_epochs: Optional[int] = None,
            resume_from: Optional[str] = None) -> Dict[str, Any]:
        cfg = self.cfg
        max_epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        self.dm.setup("fit")

        key = jax.random.PRNGKey(cfg.seed)
        params = self.model.init_params(key)
        start_epoch = 0
        global_step = 0
        restored_opt = None
        if cfg.load_path and not (resume_from or cfg.resume_from):
            # warm start: params only — fresh optimizer state and epoch
            # counter (upstream declares this key but never reads it,
            # reference config.py:85; here it works)
            params, _, _ = self.load_checkpoint(cfg.load_path, params)
        ema_params = None
        if resume_from or cfg.resume_from:
            src = resume_from or cfg.resume_from
            params, meta, restored_opt = self.load_checkpoint(
                src, params,
                # abstract template: orbax only needs shapes/dtypes, and a
                # real tx.init here would transiently double opt-state memory
                opt_state_like=jax.eval_shape(self.tx.init, params))
            if cfg.ema_decay > 0 and (Path(src) / "params_ema").exists():
                ema_params = ocp.StandardCheckpointer().restore(
                    Path(src).absolute() / "params_ema", params)
            start_epoch = meta["epoch"] + 1
            # continue the step counter: fold_in(key, global_step) RNG and
            # logger x-axis must not replay the original run's prefix
            global_step = int(meta.get("global_step", 0))
            if "lr_sched" in meta:
                self.lr_sched.load_state_dict(meta["lr_sched"])
            if "early" in meta:
                self.early.load_state_dict(meta["early"])
        if self.mesh is not None:
            params = shard_params(self.mesh, params)
            if ema_params is not None:
                ema_params = shard_params(self.mesh, ema_params)
            if restored_opt is not None:
                # orbax restored (committed) onto a single device; move every
                # leaf to the mesh or the jitted step sees incompatible
                # device sets. mu/nu leaves take the sharding a fresh init
                # has (mirrors the TP-sharded params); leaves whose fresh
                # counterpart is not mesh-placed (e.g. scalar step counts,
                # eagerly created on the default device) are replicated.
                from jax.sharding import NamedSharding, PartitionSpec as P

                # target shardings WITHOUT materializing a throwaway opt
                # state (tx.init would allocate real moment buffers): lower
                # tx.init over the sharded params and read the compiled
                # output shardings — XLA propagates the param shardings
                # into the zeros_like moment buffers.
                shardings = (jax.jit(self.tx.init).lower(params).compile()
                             .output_shardings)
                repl = NamedSharding(self.mesh, P())

                def _place(x, sh):
                    if not (isinstance(sh, NamedSharding)
                            and sh.mesh == self.mesh):
                        sh = repl
                    return jax.device_put(x, sh)

                restored_opt = jax.tree.map(_place, restored_opt, shardings)
        opt_state = restored_opt if restored_opt is not None \
            else self.tx.init(params)

        ema_update = None
        if cfg.ema_decay > 0:
            if ema_params is None:  # fresh run (or pre-EMA resume source)
                ema_params = jax.tree.map(jnp.array, params)

            @jax.jit
            def ema_update(ema, p, step):
                # warmup cap: early on the EMA tracks the fast-moving params
                # instead of the random init (the usual (1+t)/(10+t) rule)
                d = jnp.minimum(cfg.ema_decay, (1.0 + step) / (10.0 + step))
                return jax.tree.map(lambda e, x: d * e + (1.0 - d) * x,
                                    ema, p)

        # resume must not clobber a better pre-resume "best" checkpoint
        best_val = float("inf")
        best_meta = self.ckpt_dir / "best" / "meta.json"
        if (resume_from or cfg.resume_from) and best_meta.exists():
            with open(best_meta) as f:
                best_val = float(json.load(f)["val_loss"])
        history = []
        # resume must not let a worse post-resume probe clobber the
        # best_validity checkpoint (same rule as best_val above)
        best_validity = -1.0
        bv_meta = self.ckpt_dir / "best_validity" / "meta.json"
        if (resume_from or cfg.resume_from) and bv_meta.exists():
            with open(bv_meta) as f:
                best_validity = float(json.load(f).get("validity", -1.0))
        # a wedged device blocks forever inside a device call; the watchdog
        # turns that into exit code 17 so a supervisor can restart + resume
        # (utils/watchdog.py; scripts/train_resilient.py)
        watchdog = (HangWatchdog(cfg.watchdog_timeout_s,
                                 where=f"Trainer.fit({cfg.exp_name})")
                    if cfg.watchdog_timeout_s > 0 else None)
        epoch = start_epoch - 1  # resume from a completed run: loop may not run
        try:
            for epoch in range(start_epoch, max_epochs):
                lr = self.lr_sched.on_epoch(epoch)
                opt_state = set_learning_rate(opt_state, lr)
                t0 = time.time()
                epoch_batches = 0
                for batch, texts in self.dm.train_dataloader(epoch):
                    epoch_batches += 1
                    if watchdog is not None:
                        watchdog.beat()
                    step_key = jax.random.fold_in(key, global_step)
                    params, opt_state, metrics = self._train_step(
                        params, opt_state, batch, self._raw_text(texts),
                        step_key)
                    if ema_update is not None:
                        ema_params = ema_update(ema_params, params,
                                                global_step)
                    if global_step % 50 == 0:
                        loss_val = float(metrics["loss"])
                        # failure detection: a non-finite loss means the run
                        # is poisoned — stop with a clear record instead of
                        # training on garbage (the reference has no such
                        # guard, SURVEY §5)
                        if not np.isfinite(loss_val):
                            self.logger.log({"train/loss": loss_val,
                                             "fatal": "non-finite loss"},
                                            global_step)
                            raise FloatingPointError(
                                f"non-finite training loss at step "
                                f"{global_step} (epoch {epoch}); last "
                                f"checkpoint: {self.ckpt_dir / 'last'}")
                        self.logger.log(
                            {f"train/{k}": v for k, v in metrics.items()}
                            | {"lr": self.lr_sched.lr}, global_step)
                    global_step += 1

                if epoch_batches == 0:
                    # failure detection: the bucketed loader drops ragged
                    # per-bucket chunks to keep shapes static (drop_last),
                    # so a dataset whose every bucket holds < batch_size
                    # rows yields NOTHING — the run would "train" for
                    # max_epochs without a single gradient step. Fail loud
                    # with the fix instead (found by a real silent no-op
                    # run: 8 rows / batch 8 split across two atom buckets).
                    raise ValueError(
                        f"train_dataloader yielded 0 batches at epoch "
                        f"{epoch}: every pad-bucket holds fewer than "
                        f"batch_size={cfg.batch_size} rows (drop_last "
                        f"keeps shapes static). Lower batch_size below "
                        f"the largest per-bucket row count or coarsen "
                        f"pad_buckets={cfg.pad_buckets}.")
                val_metrics = self.validate(params, epoch)
                if ema_update is not None:
                    val_metrics.update({
                        f"{k}_ema": v for k, v in
                        self.validate(ema_params, epoch).items()})
                val_loss = val_metrics.get("val/loss", float("inf"))
                lr = self.lr_sched.on_validation(val_loss)
                opt_state = set_learning_rate(opt_state, lr)
                k_val = cfg.validity_check_every_n_epochs
                if k_val > 0 and epoch % k_val == 0:
                    frac = self._sampled_validity(params, epoch)
                    val_metrics["val/validity"] = frac
                    if frac > best_validity:
                        best_validity = frac
                        self.save_checkpoint("best_validity", params,
                                             opt_state, epoch, global_step,
                                             val_loss,
                                             extra_meta={"validity": frac},
                                             ema_params=ema_params)
                val_metrics["epoch"] = epoch
                val_metrics["epoch_time"] = time.time() - t0
                self.logger.log(val_metrics, global_step)
                history.append(val_metrics)

                stop = self.early.update(val_loss)
                last_epoch = epoch == max_epochs - 1 or stop
                k_ckpt = cfg.checkpoint_every_n_epochs
                if last_epoch or (k_ckpt > 0 and epoch % k_ckpt == 0):
                    self.save_checkpoint("last", params, opt_state, epoch,
                                         global_step, val_loss,
                                         ema_params=ema_params)
                if val_loss < best_val:
                    best_val = val_loss
                    self.save_checkpoint("best", params, opt_state, epoch,
                                         global_step, val_loss,
                                         ema_params=ema_params)
                if stop:
                    break
        finally:
            if watchdog is not None:
                watchdog.stop()
            # always leave the model holding LIVE params: the train step
            # donates its inputs, so anything assigned before the loop would
            # reference deleted buffers if fit aborts (e.g. the non-finite
            # loss guard) and the user then samples or saves
            self.model.params = params

        return {"best_val_loss": best_val, "epochs": epoch + 1,
                "global_step": global_step, "history": history}
