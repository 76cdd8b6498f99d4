"""Optimizer + LR-scheduler factory.

Mirrors the reference's configure_optimizers (reference:
chemeleon/modules/base_module.py:94-135): {adam, sgd, adamw} x {constant,
cosine, reduce_on_plateau, linear_decay}, plus gradient clipping
(run.py:85, gradient_clip_val) and accumulation (config.py:68).

Schedulers that react to validation metrics (reduce_on_plateau) are host-side
objects that produce an LR *scale*; the optimizer is built with
``optax.inject_hyperparams`` so the trainer can update the learning rate
between jitted steps without recompiling.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax

from chemeleon_tpu.config import ChemeleonConfig


def build_optimizer(cfg: ChemeleonConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        base = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
        if cfg.weight_decay:
            base = optax.chain(optax.add_decayed_weights(cfg.weight_decay), base)
    elif cfg.optimizer == "sgd":
        base = optax.inject_hyperparams(optax.sgd)(learning_rate=cfg.lr)
        if cfg.weight_decay:
            base = optax.chain(optax.add_decayed_weights(cfg.weight_decay), base)
    elif cfg.optimizer == "adamw":
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"Invalid optimizer: {cfg.optimizer}")

    tx = base
    if cfg.gradient_clip_val and cfg.gradient_clip_val > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip_val), tx)
    if cfg.accumulate_grad_batches and cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Return a COPY of the optax state with the injected learning rate set.

    Functional on purpose: in-place mutation of a (possibly donated) state
    pytree is fragile, and a silent no-op when the state layout changes is
    worse. Raises if no ``inject_hyperparams`` learning_rate is found."""
    found = [False]

    def rebuild(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp and hasattr(
                s, "_replace"):
            new_hp = dict(hp)
            old = new_hp["learning_rate"]
            new_hp["learning_rate"] = (
                type(old)(lr) if isinstance(old, float)
                else jnp.asarray(lr, getattr(old, "dtype", jnp.float32)))
            found[0] = True
            return s._replace(hyperparams=new_hp)
        if isinstance(s, tuple):
            items = [rebuild(x) for x in s]
            # namedtuple (optax wrapper states) vs plain tuple (chain)
            return type(s)(*items) if hasattr(s, "_fields") else tuple(items)
        return s

    new_state = rebuild(opt_state)
    if not found[0]:
        raise ValueError(
            "set_learning_rate: no injected learning_rate in optimizer state "
            "(optimizer not built with optax.inject_hyperparams?)")
    return new_state


def set_group_learning_rates(opt_state, lrs: dict):
    """Per-label LR update for ``optax.multi_transform`` states (returns a
    copy). ``lrs`` maps group label -> new learning rate; every label must
    resolve to an inject_hyperparams learning_rate inside its group."""
    done = [False]

    def rebuild(s):
        inner = getattr(s, "inner_states", None)
        if isinstance(inner, dict) and hasattr(s, "_replace"):
            done[0] = True
            new_inner = {
                label: (set_learning_rate(sub, lrs[label])
                        if label in lrs else sub)
                for label, sub in inner.items()
            }
            return s._replace(inner_states=new_inner)
        if isinstance(s, tuple):
            items = [rebuild(x) for x in s]
            return type(s)(*items) if hasattr(s, "_fields") else tuple(items)
        return s

    new_state = rebuild(opt_state)
    if not done[0]:
        raise ValueError("set_group_learning_rates: no multi_transform state "
                         "found in optimizer state")
    return new_state


class LRScheduler:
    """Host-side LR schedule controller (per-epoch / per-validation)."""

    def __init__(self, cfg: ChemeleonConfig):
        self.mode = cfg.scheduler
        self.base_lr = cfg.lr
        self.patience = cfg.patience
        self.min_lr = 1e-6           # base_module.py:123
        self.factor = 0.8            # base_module.py:123
        self.t_max = 10              # CosineAnnealingLR(T_max=10), :120
        self.max_steps: Optional[int] = None
        self._lr = cfg.lr
        self._best = math.inf
        self._bad = 0
        self._epoch = 0
        if self.mode not in ("constant", "cosine", "reduce_on_plateau",
                             "linear_decay", "constant_with_warmup"):
            raise ValueError(f"Invalid scheduler: {self.mode}")

    @property
    def lr(self) -> float:
        return self._lr

    def on_epoch(self, epoch: int) -> float:
        """Epoch-driven schedules."""
        self._epoch = epoch
        if self.mode == "cosine":
            self._lr = self.min_lr + (self.base_lr - self.min_lr) * (
                1 + math.cos(math.pi * (epoch % (2 * self.t_max)) / self.t_max)) / 2
        elif self.mode == "linear_decay":
            # the reference's LinearLR call is broken upstream
            # (base_module.py:126 passes max_steps as start_factor);
            # we implement a sane linear decay to 0 over max_steps epochs.
            total = self.max_steps or 1000
            self._lr = self.base_lr * max(0.0, 1.0 - epoch / total)
        elif self.mode == "constant_with_warmup":
            warm = 10
            self._lr = self.base_lr * min(1.0, (epoch + 1) / warm)
        return self._lr

    def on_validation(self, val_loss: float) -> float:
        """Metric-driven schedules (reduce_on_plateau, min mode). "Improved"
        uses torch ReduceLROnPlateau's default relative threshold 1e-4
        (best * (1 - 1e-4)), not strict <, so decay timing matches."""
        if self.mode != "reduce_on_plateau":
            return self._lr
        if val_loss < self._best * (1.0 - 1e-4):
            self._best = val_loss
            self._bad = 0
        else:
            self._bad += 1
            if self._bad > self.patience:
                self._lr = max(self._lr * self.factor, self.min_lr)
                self._bad = 0
        return self._lr

    def state_dict(self) -> dict:
        """Resume parity: without this, a resumed reduce_on_plateau run
        restarts at base lr (possibly 100x above the decayed value)."""
        return {"lr": self._lr, "best": self._best, "bad": self._bad,
                "epoch": self._epoch}

    def load_state_dict(self, d: dict) -> None:
        self._lr = float(d["lr"])
        self._best = float(d["best"])
        self._bad = int(d["bad"])
        self._epoch = int(d["epoch"])


class PlateauScale:
    """ReduceLROnPlateau as a multiplicative scale on per-group base LRs
    (the CLIP trainer's scheduler, reference crystal_clip.py:182-185:
    mode=min, factor=0.8, min_lr applied per group at the call site)."""

    def __init__(self, patience: int, factor: float = 0.8):
        self.patience = patience
        self.factor = factor
        self.scale = 1.0
        self.best = math.inf
        self.bad = 0

    def update(self, val_loss: float) -> float:
        # torch ReduceLROnPlateau default relative threshold (1e-4)
        if val_loss < self.best * (1.0 - 1e-4):
            self.best = val_loss
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale *= self.factor
                self.bad = 0
        return self.scale

    def state_dict(self) -> dict:
        return {"scale": self.scale, "best": self.best, "bad": self.bad}

    def load_state_dict(self, d: dict) -> None:
        self.scale = float(d["scale"])
        self.best = float(d["best"])
        self.bad = int(d["bad"])


class EarlyStopping:
    """val/loss early stopping (reference run.py:55-60, patience=300)."""

    def __init__(self, patience: int, mode: str = "min"):
        self.patience = patience
        self.best = math.inf
        self.bad = 0

    def update(self, val_loss: float) -> bool:
        """Returns True when training should stop."""
        if val_loss < self.best:
            self.best = val_loss
            self.bad = 0
            return False
        self.bad += 1
        return self.bad > self.patience

    def state_dict(self) -> dict:
        return {"best": self.best, "bad": self.bad}

    def load_state_dict(self, d: dict) -> None:
        self.best = float(d["best"])
        self.bad = int(d["bad"])
