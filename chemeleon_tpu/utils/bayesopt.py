"""Tree-structured Parzen Estimator (TPE) Bayesian optimization.

Local replacement for the wandb Bayes sweep backend the reference drives
(reference sweep.py:18-33, ``method: bayes`` over batch/hidden/layers/lr/
wd/optimizer, count=100) — this environment has no wandb and zero egress,
so sweep.py needs an in-repo optimizer.

TPE (Bergstra et al. 2011): keep all (config, loss) observations; split
into the best gamma-quantile ("good") and the rest ("bad"); model each
hyperparameter density under both sets (Parzen/Gaussian mixtures for
continuous dims, smoothed category counts for categorical); draw candidates
from the good density and keep the one maximizing l(x)/g(x) — the expected
improvement surrogate. Pure numpy, no hard deps.

Space grammar (same shapes sweep.py already uses):
  {"name": [a, b, c]}           categorical
  {"name": (lo, hi)}            uniform float
  {"name": ("log", lo, hi)}     log-uniform float
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple, Union

import numpy as np

SpaceSpec = Dict[str, Union[Sequence[Any], Tuple[float, float],
                            Tuple[str, float, float]]]


class _Dim:
    def __init__(self, name: str, spec):
        self.name = name
        if isinstance(spec, (list,)):
            self.kind = "cat"
            self.choices = list(spec)
        elif len(spec) == 3 and spec[0] == "log":
            self.kind = "float"
            self.log = True
            self.orig_lo, self.orig_hi = float(spec[1]), float(spec[2])
            self.lo, self.hi = math.log(spec[1]), math.log(spec[2])
        else:
            self.kind = "float"
            self.log = False
            self.orig_lo, self.orig_hi = float(spec[0]), float(spec[1])
            self.lo, self.hi = self.orig_lo, self.orig_hi

    # -- encode/decode to the internal numeric space ------------------------
    def sample_prior(self, rng: np.random.Generator):
        if self.kind == "cat":
            return rng.integers(len(self.choices))
        return rng.uniform(self.lo, self.hi)

    def decode(self, z):
        if self.kind == "cat":
            return self.choices[int(z)]
        v = math.exp(float(z)) if self.log else float(z)
        # exp(log(hi)) can tick past hi in float64 — clip to the user's box
        return min(max(v, self.orig_lo), self.orig_hi)

    def encode(self, value):
        if self.kind == "cat":
            return self.choices.index(value)
        return math.log(value) if self.log else float(value)


class TPEOptimizer:
    """suggest() -> config dict; observe(config, loss) records the result.
    Minimizes ``loss``."""

    def __init__(self, space: SpaceSpec, seed: int = 0,
                 n_startup: int = 10, gamma: float = 0.25,
                 n_candidates: int = 24, explore_prob: float = 0.1):
        self.dims = [_Dim(k, v) for k, v in space.items()]
        self.rng = np.random.default_rng(seed)
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.explore_prob = explore_prob
        self._obs: List[Tuple[Dict[str, Any], float]] = []

    # -- public API -----------------------------------------------------------
    def suggest(self) -> Dict[str, Any]:
        # epsilon-greedy prior draws guard against categorical basin lock-in
        # (a good set that never contains a category can't propose it)
        if (len(self._obs) < self.n_startup
                or self.rng.uniform() < self.explore_prob):
            z = [d.sample_prior(self.rng) for d in self.dims]
            return {d.name: d.decode(v) for d, v in zip(self.dims, z)}
        good, bad = self._split()
        # encode the observation history once per dim, not per candidate
        enc = {d.name: (np.array([d.encode(o[d.name]) for o in good]),
                        np.array([d.encode(o[d.name]) for o in bad]))
               for d in self.dims}
        best_cfg, best_score = None, -math.inf
        for _ in range(self.n_candidates):
            cfg = {}
            score = 0.0
            for d in self.dims:
                gvals, bvals = enc[d.name]
                z = self._draw(d, gvals)
                score += (self._logpdf(d, z, gvals)
                          - self._logpdf(d, z, bvals))
                cfg[d.name] = d.decode(z)
            if score > best_score:
                best_cfg, best_score = cfg, score
        return best_cfg

    def observe(self, config: Dict[str, Any], loss: float) -> None:
        if math.isfinite(loss):
            self._obs.append((dict(config), float(loss)))

    @property
    def best(self):
        return min(self._obs, key=lambda o: o[1], default=None)

    # -- internals ---------------------------------------------------------------
    def _split(self):
        obs = sorted(self._obs, key=lambda o: o[1])
        n_good = max(1, int(math.ceil(self.gamma * len(obs))))
        good = [o[0] for o in obs[:n_good]]
        bad = [o[0] for o in obs[n_good:]] or good
        return good, bad

    def _bandwidth(self, d: _Dim, vals: np.ndarray) -> float:
        # floor at span/10: a hard floor keeps refinement moving and stops
        # the positive-feedback mode collapse of a shrinking good-cluster std
        span = d.hi - d.lo
        if len(vals) < 2:
            return max(span / 6.0, 1e-12)
        return min(max(float(np.std(vals)) * (len(vals) ** -0.2),
                       span / 10.0), span)

    def _draw(self, d: _Dim, gvals: np.ndarray):
        """Sample from the good density SMOOTHED WITH THE PRIOR (hyperopt
        semantics): one uniform-prior mixture component keeps exploration
        alive after the startup phase."""
        if d.kind == "cat":
            k = len(d.choices)
            counts = np.bincount(gvals.astype(int), minlength=k) + 1.0
            return self.rng.choice(k, p=counts / counts.sum())
        n = len(gvals)
        if self.rng.uniform() < 1.0 / (n + 1):
            return float(self.rng.uniform(d.lo, d.hi))  # prior component
        center = gvals[self.rng.integers(n)]
        z = self.rng.normal(center, self._bandwidth(d, gvals))
        return float(np.clip(z, d.lo, d.hi))

    def _logpdf(self, d: _Dim, z, vals: np.ndarray) -> float:
        if d.kind == "cat":
            k = len(d.choices)
            counts = np.bincount(vals.astype(int), minlength=k) + 1.0
            return math.log(counts[int(z)] / counts.sum())
        n = len(vals)
        bw = self._bandwidth(d, vals)
        comp = np.exp(-0.5 * ((z - vals) / bw) ** 2) / (
            bw * math.sqrt(2.0 * math.pi))
        span = d.hi - d.lo
        dens = (n * float(comp.mean()) + 1.0 / max(span, 1e-12)) / (n + 1)
        return math.log(max(dens, 1e-300))
