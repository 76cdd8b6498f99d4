"""Diffusion noise schedules and the wrapped-normal torus score.

TPU-native rebuild of the reference's diffusion math
(reference: chemeleon/utils/diff_utils.py:10-148). All schedules are
precomputed once as f32 tables of length ``timesteps + 1`` with a prepended
t=0 row (reference diff_utils.py:72, :124), so a jitted ``lax.scan`` sampler
can index them with a traced timestep with no host round-trips.

Everything here is pure ``jnp``; tables are plain arrays (pytree leaves), so
they shard/replicate transparently under ``pjit``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Beta schedules (reference diff_utils.py:10-32)
# ---------------------------------------------------------------------------

def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule from Nichol & Dhariwal (2102.09672); diff_utils.py:10-19."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def linear_beta_schedule(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    return np.linspace(beta_start, beta_end, timesteps)


def quadratic_beta_schedule(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, timesteps) ** 2


def sigmoid_beta_schedule(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    betas = np.linspace(-6, 6, timesteps)
    return 1.0 / (1.0 + np.exp(-betas)) * (beta_end - beta_start) + beta_start


_BETA_SCHEDULES = {
    "cosine": lambda t, b0, b1: cosine_beta_schedule(t),
    "linear": linear_beta_schedule,
    "quadratic": quadratic_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


# ---------------------------------------------------------------------------
# Wrapped-normal score on the torus (reference diff_utils.py:35-54)
# ---------------------------------------------------------------------------

def p_wrapped_normal(x: jnp.ndarray, sigma: jnp.ndarray, N: int = 10,
                     T: float = 1.0) -> jnp.ndarray:
    """Unnormalized wrapped-normal density: sum over 2N+1 periodic images."""
    offsets = jnp.arange(-N, N + 1, dtype=x.dtype) * T          # [2N+1]
    xs = x[..., None] + offsets                                  # [..., 2N+1]
    return jnp.exp(-(xs ** 2) / 2.0 / sigma[..., None] ** 2).sum(-1)


def d_log_p_wrapped_normal(x: jnp.ndarray, sigma: jnp.ndarray, N: int = 10,
                           T: float = 1.0) -> jnp.ndarray:
    """Score d/dx log p_wn(x; sigma) — the coords regression target
    (diff_utils.py:42-46)."""
    offsets = jnp.arange(-N, N + 1, dtype=x.dtype) * T
    xs = x[..., None] + offsets
    exp_term = jnp.exp(-(xs ** 2) / 2.0 / sigma[..., None] ** 2)
    num = (xs / sigma[..., None] ** 2 * exp_term).sum(-1)
    den = exp_term.sum(-1)
    return num / den


def sigma_norm(sigmas: jnp.ndarray, T: float = 1.0, sn: int = 10000,
               seed: int = 0) -> jnp.ndarray:
    """Monte-Carlo estimate of E[(d log p_wn)^2] per sigma (diff_utils.py:49-54).

    The reference draws torch.randn at module init; we use a fixed JAX key so the
    table is deterministic across processes/restarts.
    """
    key = jax.random.PRNGKey(seed)
    sig = jnp.broadcast_to(sigmas[None, :], (sn, sigmas.shape[0]))
    x_sample = sigmas * jax.random.normal(key, sig.shape, dtype=sig.dtype)
    x_sample = x_sample % T
    normal_ = d_log_p_wrapped_normal(x_sample, sig, T=T)
    return (normal_ ** 2).mean(axis=0)


# ---------------------------------------------------------------------------
# Schedulers (precomputed tables; reference diff_utils.py:57-131)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BetaScheduler:
    """Variance-preserving DDPM tables, all length ``timesteps + 1`` with a
    zero/identity t=0 row (reference diff_utils.py:57-102)."""

    timesteps: int
    betas: jnp.ndarray               # [T+1]
    alphas: jnp.ndarray              # [T+1]
    alphas_cumprod: jnp.ndarray      # [T+1]
    posterior_mean_coeff1: jnp.ndarray
    posterior_mean_coeff2: jnp.ndarray
    sigmas: jnp.ndarray              # [T+1] posterior std

    @classmethod
    def create(cls, timesteps: int, scheduler_mode: str = "cosine",
               beta_start: float = 0.0001, beta_end: float = 0.02) -> "BetaScheduler":
        if scheduler_mode not in _BETA_SCHEDULES:
            raise ValueError(f"Invalid scheduler mode: {scheduler_mode}")
        betas = _BETA_SCHEDULES[scheduler_mode](timesteps, beta_start, beta_end)
        betas = np.concatenate([np.zeros(1), betas]).astype(np.float64)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)

        pm1 = np.ones_like(betas)
        pm1[1:] = betas[1:] * np.sqrt(alphas_cumprod[:-1]) / (1.0 - alphas_cumprod[1:])
        pm2 = np.zeros_like(betas)
        pm2[1:] = ((1.0 - alphas_cumprod[:-1]) * np.sqrt(alphas[1:])
                   / (1.0 - alphas_cumprod[1:]))
        sig = np.zeros_like(betas)
        sig[1:] = betas[1:] * (1.0 - alphas_cumprod[:-1]) / (1.0 - alphas_cumprod[1:])
        sig = np.sqrt(sig)

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(timesteps=timesteps, betas=f32(betas), alphas=f32(alphas),
                   alphas_cumprod=f32(alphas_cumprod),
                   posterior_mean_coeff1=f32(pm1), posterior_mean_coeff2=f32(pm2),
                   sigmas=f32(sig))

    def uniform_sample_t(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """t ~ U{1..T} per graph (diff_utils.py:104-106)."""
        return jax.random.randint(key, (batch_size,), 1, self.timesteps + 1)

    def tree_flatten(self):
        leaves = (self.betas, self.alphas, self.alphas_cumprod,
                  self.posterior_mean_coeff1, self.posterior_mean_coeff2, self.sigmas)
        return leaves, self.timesteps

    @classmethod
    def tree_unflatten(cls, timesteps, leaves):
        return cls(timesteps, *leaves)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SigmaScheduler:
    """Variance-exploding geometric sigma ladder + MC sigma_norm table
    (reference diff_utils.py:109-131). sigmas/sigmas_norm are [T+1] with
    prepended 0 / 1 rows."""

    timesteps: int
    sigma_begin: float
    sigma_end: float
    sigmas: jnp.ndarray        # [T+1]
    sigmas_norm: jnp.ndarray   # [T+1]

    @classmethod
    def create(cls, timesteps: int, sigma_begin: float = 0.01,
               sigma_end: float = 1.0, mc_seed: int = 0) -> "SigmaScheduler":
        sigmas = np.exp(np.linspace(np.log(sigma_begin), np.log(sigma_end),
                                    timesteps)).astype(np.float32)
        norm = sigma_norm(jnp.asarray(sigmas), seed=mc_seed)
        sigmas_full = jnp.concatenate([jnp.zeros(1, jnp.float32),
                                       jnp.asarray(sigmas)])
        norm_full = jnp.concatenate([jnp.ones(1, jnp.float32), norm.astype(jnp.float32)])
        return cls(timesteps=timesteps, sigma_begin=sigma_begin, sigma_end=sigma_end,
                   sigmas=sigmas_full, sigmas_norm=norm_full)

    def uniform_sample_t(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        return jax.random.randint(key, (batch_size,), 1, self.timesteps + 1)

    def tree_flatten(self):
        return (self.sigmas, self.sigmas_norm), (self.timesteps, self.sigma_begin,
                                                 self.sigma_end)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        timesteps, sb, se = aux
        return cls(timesteps, sb, se, *leaves)


# ---------------------------------------------------------------------------
# Classifier-free-guidance mask (reference diff_utils.py:134-148)
# ---------------------------------------------------------------------------

def prob_mask_like(key: jax.Array, shape, prob: float) -> jnp.ndarray:
    """Boolean keep-mask with P(True) = prob. ``prob`` must be a Python float
    (static under jit), matching the reference's eager special-casing."""
    if prob == 1:
        return jnp.ones(shape, dtype=bool)
    if prob == 0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.uniform(key, shape) < prob
