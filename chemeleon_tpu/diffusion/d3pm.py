"""D3PM absorbing-state discrete diffusion over atom types.

TPU-native rebuild of the reference D3PM (reference: chemeleon/utils/diff_utils.py:152-329).
Works on dense padded atom-type tensors ``[..., ]`` (any leading shape; typically
``[B, N]`` with a node mask) instead of flattened PyG node lists, so every op is a
static-shape gather/einsum that XLA fuses cleanly.

Semantics notes (kept bit-faithful to the reference, including its off-by-one
time indexing, for checkpoint parity):
  * ``at(a, t, x)`` indexes ``a[t - 1, x]`` (diff_utils.py:216-234): q_sample at
    timestep t uses the cumulative product Q̄_{t-1}, and the posterior at t uses
    one-step Q_{t-1} and cumulative Q̄_{t-2}. With betas[0] = 0 these are
    self-consistent.
  * ``q_mats[t-2]`` at t=1 would index -1; the reference relies on torch negative
    wrapping and then discards the value via the t==1 branch
    (diff_utils.py:280-286). We clamp the index instead — the value is equally
    discarded.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from chemeleon_tpu.diffusion.schedules import BetaScheduler


def _build_absorbing_mats(betas: np.ndarray, num_classes: int) -> np.ndarray:
    """Q_t[i, j] = (1 - beta_t) * 1[i==j] + beta_t * 1[j==0]
    (reference get_absorbing_transition_mat, diff_utils.py:195-213)."""
    T1 = betas.shape[0]
    eye = np.eye(num_classes, dtype=np.float64)
    e0 = np.zeros((num_classes, num_classes), dtype=np.float64)
    e0[:, 0] = 1.0
    b = betas.astype(np.float64)[:, None, None]
    return (1.0 - b) * eye[None] + b * e0[None]  # [T+1, C, C]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class D3PM:
    """Absorbing-state discrete diffusion (class 0 = dummy/absorbing)."""

    num_timesteps: int
    max_atoms: int           # number of classes (103 elements + dummy = 104)
    hybrid_coeff: float
    eps: float
    q_one_step_mats: jnp.ndarray         # [T+1, C, C]
    q_one_step_transposed: jnp.ndarray   # [T+1, C, C]
    q_mats: jnp.ndarray                  # [T+1, C, C] cumulative products

    @classmethod
    def create(cls, beta_scheduler: BetaScheduler, num_timesteps: int,
               max_atoms: int, d3pm_hybrid_coeff: float) -> "D3PM":
        betas = np.asarray(beta_scheduler.betas)  # [T+1], betas[0] = 0
        q_one = _build_absorbing_mats(betas, max_atoms)
        # Q̄_t = Q_0 @ Q_1 @ ... @ Q_t (diff_utils.py:177-185)
        q_mats = np.empty_like(q_one)
        acc = q_one[0]
        q_mats[0] = acc
        for t in range(1, num_timesteps + 1):
            acc = acc @ q_one[t]
            q_mats[t] = acc
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            num_timesteps=num_timesteps, max_atoms=max_atoms,
            hybrid_coeff=d3pm_hybrid_coeff, eps=1.0e-6,
            q_one_step_mats=f32(q_one),
            q_one_step_transposed=f32(np.swapaxes(q_one, 1, 2)),
            q_mats=f32(q_mats))

    # -- indexing helper (diff_utils.py:216-234) ---------------------------
    def at(self, a: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """a[t - 1, x, :] with t broadcast against x. Returns [..., C]."""
        t = jnp.broadcast_to(t, x.shape)
        return a[t - 1, x, :]

    # -- q(x_t | x_0) sampling (diff_utils.py:236-256) ---------------------
    def q_sample(self, x_0: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        """Gumbel-max sample from q(x_t|x_0). ``noise`` ~ U(0,1), shape
        x_0.shape + (C,)."""
        logits = jnp.log(self.at(self.q_mats, t, x_0) + self.eps)
        noise = jnp.clip(noise, self.eps, 1.0)
        gumbel_noise = -jnp.log(-jnp.log(noise))
        return jnp.argmax(logits + gumbel_noise, axis=-1)

    def q_sample_key(self, key: jax.Array, x_0: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
        noise = jax.random.uniform(key, x_0.shape + (self.max_atoms,))
        return self.q_sample(x_0, t, noise)

    # -- posterior logits q(x_{t-1} | x_t, x_0) (diff_utils.py:258-286) ----
    def q_posterior_logits(self, x_0: jnp.ndarray, x_t: jnp.ndarray,
                           t: jnp.ndarray,
                           is_x_0_one_hot: bool = False) -> jnp.ndarray:
        if is_x_0_one_hot:
            x_0_logits = x_0  # already [..., C] logits
        else:
            x_0_logits = jnp.log(
                jax.nn.one_hot(x_0, self.max_atoms, dtype=jnp.float32) + self.eps)

        t = jnp.broadcast_to(t, x_t.shape)
        fact1 = self.at(self.q_one_step_transposed, t, x_t)       # [..., C]
        softmaxed = jax.nn.softmax(x_0_logits, axis=-1)
        # index t-2, clamped at 0 for t==1 (value discarded by the where below)
        qmats2 = self.q_mats[jnp.maximum(t - 2, 0)]                # [..., C, C]
        fact2 = jnp.einsum("...c,...cd->...d", softmaxed, qmats2)
        out = jnp.log(fact1 + self.eps) + jnp.log(fact2 + self.eps)
        return jnp.where((t == 1)[..., None], x_0_logits, out)

    # -- jump posterior q(x_s | x_t, x_0), s < t (few-step sampling) --------
    def q_posterior_logits_jump(self, x_0: jnp.ndarray, x_t: jnp.ndarray,
                                t: jnp.ndarray, s: jnp.ndarray,
                                is_x_0_one_hot: bool = False) -> jnp.ndarray:
        """Posterior logits for an arbitrary jump t -> s (0 <= s < t).

        The absorbing chain composes in closed form: a product of one-step
        matrices (1-b)I + b*e0 is gamma*I + (1-gamma)*e0 with gamma the
        product of the survival probabilities, so the s->t transition needs
        only the survival ratio abar(t)/abar(s) read off the cumulative
        q_mats diagonal — no matrix products inside the sampler. At
        s == t-1 this reduces to ``q_posterior_logits`` (unit-tested); at
        s == 0 it returns the x_0 logits (the reference's t == 1 branch).
        The reference has no few-step path (diff_utils.py:258-286 is strictly
        one-step); this powers the sample_steps inference knob."""
        if is_x_0_one_hot:
            x_0_logits = x_0
        else:
            x_0_logits = jnp.log(
                jax.nn.one_hot(x_0, self.max_atoms, dtype=jnp.float32) + self.eps)

        t = jnp.broadcast_to(t, x_t.shape)
        s = jnp.broadcast_to(s, x_t.shape)
        # survival prob of any non-absorbing class through Q_0..Q_m is the
        # [1, 1] entry of the cumulative product; pad with 1 for "m = -1"
        # so the at()-convention indices t-1 / s-1 become t / s directly.
        abar = jnp.concatenate([jnp.ones((1,), self.q_mats.dtype),
                                self.q_mats[:, 1, 1]])
        gamma = (abar[t] / jnp.maximum(abar[s], self.eps))[..., None]
        # fact1[..., j] = Q_{s->t}[j, x_t] = gamma*1[j==x_t] + (1-gamma)*1[x_t==0]
        one_hot_xt = jax.nn.one_hot(x_t, self.max_atoms, dtype=jnp.float32)
        absorbed = (x_t == 0).astype(jnp.float32)[..., None]
        fact1 = gamma * one_hot_xt + (1.0 - gamma) * absorbed
        softmaxed = jax.nn.softmax(x_0_logits, axis=-1)
        # q(x_s | x_0) uses cumulative Q̄ at index s-1 (at()-convention),
        # clamped at 0 for s == 0 (value discarded by the where below)
        qmats2 = self.q_mats[jnp.maximum(s - 1, 0)]
        fact2 = jnp.einsum("...c,...cd->...d", softmaxed, qmats2)
        out = jnp.log(fact1 + self.eps) + jnp.log(fact2 + self.eps)
        return jnp.where((s == 0)[..., None], x_0_logits, out)

    def p_logits_jump(self, pred_x_start_logits: jnp.ndarray,
                      x_t: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray,
                      noise: jnp.ndarray) -> jnp.ndarray:
        """Sample x_s ~ p(x_s | x_t) via Gumbel-argmax for an arbitrary jump
        t -> s; at s == 0 the gumbel noise is zeroed (deterministic argmax of
        the x_0 logits), mirroring ``p_logits`` at t == 1."""
        logits = self.q_posterior_logits_jump(
            pred_x_start_logits, x_t, t, s, is_x_0_one_hot=True)
        noise = jnp.clip(noise, self.eps, 1.0)
        s = jnp.broadcast_to(s, x_t.shape)
        nonzero_mask = (s != 0).astype(logits.dtype)[..., None]
        gumbel_noise = -jnp.log(-jnp.log(noise))
        return jnp.argmax(logits + gumbel_noise * nonzero_mask, axis=-1)

    # -- losses (diff_utils.py:288-305) -------------------------------------
    def categorical_kl_logits(self, logits1: jnp.ndarray, logits2: jnp.ndarray,
                              mask: jnp.ndarray | None = None,
                              eps: float = 1.0e-6) -> jnp.ndarray:
        """KL(C(logits1) || C(logits2)), mean over (masked) positions."""
        kl = (jax.nn.softmax(logits1 + eps, axis=-1)
              * (jax.nn.log_softmax(logits1 + eps, axis=-1)
                 - jax.nn.log_softmax(logits2 + eps, axis=-1))).sum(-1)
        if mask is None:
            return kl.mean()
        mask = mask.astype(kl.dtype)
        return (kl * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    # -- ancestral sampling step (diff_utils.py:307-329) --------------------
    def p_logits(self, pred_x_start_logits: jnp.ndarray, x_t: jnp.ndarray,
                 t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Sample x_{t-1} ~ p(x_{t-1}|x_t) via Gumbel-argmax; at t==1 the
        gumbel noise is zeroed (deterministic argmax of x_0 logits)."""
        pred_q_posterior_logits = self.q_posterior_logits(
            pred_x_start_logits, x_t, t, is_x_0_one_hot=True)
        noise = jnp.clip(noise, self.eps, 1.0)
        t = jnp.broadcast_to(t, x_t.shape)
        nonzero_mask = (t != 1).astype(pred_q_posterior_logits.dtype)[..., None]
        gumbel_noise = -jnp.log(-jnp.log(noise))
        return jnp.argmax(pred_q_posterior_logits + gumbel_noise * nonzero_mask,
                          axis=-1)

    # -- pytree plumbing ----------------------------------------------------
    def tree_flatten(self):
        leaves = (self.q_one_step_mats, self.q_one_step_transposed, self.q_mats)
        aux = (self.num_timesteps, self.max_atoms, self.hybrid_coeff, self.eps)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        num_timesteps, max_atoms, hybrid_coeff, eps = aux
        return cls(num_timesteps, max_atoms, hybrid_coeff, eps, *leaves)
