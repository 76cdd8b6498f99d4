"""Lattice-system projection — the symmetry analog of CSP type clamping.

The steering probe (BENCH.md "Crystal-system conditioning") measured that a
crystal-system word in the prompt pulls the generated lattice toward the
right geometry (cubic prompt: edge-length CV 0.178 -> 0.075, 8.7 sigma) but
an order of magnitude too weakly to land inside the symprec-0.1 basin that
exact symmetry detection requires. This module closes that gap the same way
``fixed_types`` closes the composition gap (models/chemeleon.py sampler_step):
by construction instead of statistical pull — every reverse step projects the
lattice onto the prompted system's Bravais metric constraints, so the chain
diffuses *within* the constraint manifold and the final cell satisfies the
prompted lattice system exactly.

The reference has no equivalent: its sampler diffuses the lattice freely and
its evaluation merely scores crystal_system_matching after the fact
(reference chemeleon.py:412-425, evaluate.py:231-272). This is a framework
extension in the spirit of symmetry-constrained diffusion (DiffCSP-family);
it guarantees the LATTICE (metric) class — full space-group symmetry would
additionally need symmetric Wyckoff positions, which stay free.

All functions are jnp, batched, and differentiable; they run inside the
jitted sampler scan. The matrix convention is the canonical
``from_parameters`` frame used everywhere in the framework (chem/lattice.py:
row2 = (0, 0, c), zeros at (0,1), (2,0), (2,1) — the reason for
MASK_LATTICE_MATRIX).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

# id 0 = free (no projection). Crystal-system word "trigonal" maps to the
# rhombohedral metric constraint (a=b=c, alpha=beta=gamma != 90 allowed);
# lattice_system() reports it as "rhombohedral" (chem/lattice.py:202-205).
SYSTEM_IDS = {None: 0, "": 0, "free": 0,
              "triclinic": 1, "monoclinic": 2, "orthorhombic": 3,
              "tetragonal": 4, "trigonal": 5, "rhombohedral": 5,
              "hexagonal": 6, "cubic": 7}

_EPS = 1e-8


def system_ids(systems: List[Optional[str]]) -> np.ndarray:
    """Map per-structure crystal-system words (None = free) to int ids."""
    try:
        return np.array([SYSTEM_IDS[s if s is None else s.strip().lower()]
                         for s in systems], np.int32)
    except KeyError as e:
        raise ValueError(
            f"unknown crystal system {e.args[0]!r}; expected one of "
            f"{sorted(k for k in SYSTEM_IDS if isinstance(k, str) and k)}"
        ) from None


def lattice_params_jax(l: jnp.ndarray) -> tuple:
    """(a, b, c, alpha, beta, gamma) [B] from canonical [B, 3, 3] row-vector
    lattices (angles in degrees). jnp mirror of chem/lattice.py:38-53."""
    norms = jnp.linalg.norm(l, axis=-1)  # [B, 3]
    a, b, c = norms[:, 0], norms[:, 1], norms[:, 2]

    def ang(u, v, nu, nv):
        cos = jnp.sum(u * v, -1) / jnp.maximum(nu * nv, _EPS)
        return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))

    alpha = ang(l[:, 1], l[:, 2], b, c)
    beta = ang(l[:, 0], l[:, 2], a, c)
    gamma = ang(l[:, 0], l[:, 1], a, b)
    return a, b, c, alpha, beta, gamma


def lattice_from_params_jax(a, b, c, alpha, beta, gamma) -> jnp.ndarray:
    """Canonical [B, 3, 3] lattices from [B] params — jnp mirror of
    chem/lattice.py:18-35 (pymatgen ``from_parameters`` convention)."""
    ar, br, gr = map(jnp.radians, (alpha, beta, gamma))
    sin_a = jnp.maximum(jnp.sin(ar), _EPS)
    sin_b = jnp.maximum(jnp.sin(br), _EPS)
    val = jnp.clip((jnp.cos(ar) * jnp.cos(br) - jnp.cos(gr))
                   / (sin_a * sin_b), -1.0, 1.0)
    gs = jnp.arccos(val)
    zero = jnp.zeros_like(a)
    row0 = jnp.stack([a * jnp.sin(br), zero, a * jnp.cos(br)], -1)
    row1 = jnp.stack([-b * sin_a * jnp.cos(gs), b * sin_a * jnp.sin(gs),
                      b * jnp.cos(ar)], -1)
    row2 = jnp.stack([zero, zero, c], -1)
    return jnp.stack([row0, row1, row2], -2)


def project_lattice_system(l: jnp.ndarray, sys_ids: jnp.ndarray,
                           min_len: float = 1e-3) -> jnp.ndarray:
    """Project [B, 3, 3] canonical lattices onto each row's lattice-system
    metric constraints (sys_ids [B] int32 per SYSTEM_IDS; 0 = row returned
    untouched, bit-for-bit).

    Per-system constraints (lengths averaged, angles pinned — the nearest
    in-class cell under the parameter metric):
      triclinic     none (but re-canonicalized through the param round-trip)
      monoclinic    alpha = gamma = 90 (unique axis b; beta free)
      orthorhombic  all angles 90
      tetragonal    a = b, all angles 90
      trigonal      a = b = c, alpha = beta = gamma (rhombohedral cell)
      hexagonal     a = b, alpha = beta = 90, gamma = 120
      cubic         a = b = c, all angles 90

    ``min_len`` floors the projected lengths: early in the reverse chain the
    noisy state can have near-zero rows, and a degenerate projected cell
    would put NaNs into the decoder's Fourier features."""
    a, b, c, alpha, beta, gamma = lattice_params_jax(l)
    k = sys_ids

    tie_ab = (k == 4) | (k == 5) | (k == 6) | (k == 7)
    tie_abc = (k == 5) | (k == 7)
    mean_ab = 0.5 * (a + b)
    mean_abc = (a + b + c) / 3.0
    a2 = jnp.where(tie_abc, mean_abc, jnp.where(tie_ab, mean_ab, a))
    b2 = jnp.where(tie_abc, mean_abc, jnp.where(tie_ab, mean_ab, b))
    c2 = jnp.where(tie_abc, mean_abc, c)
    a2, b2, c2 = (jnp.maximum(x, min_len) for x in (a2, b2, c2))

    tie_ang = k == 5                                   # rhombohedral
    mean_ang = (alpha + beta + gamma) / 3.0
    al2 = jnp.where(tie_ang, mean_ang, alpha)
    be2 = jnp.where(tie_ang, mean_ang, beta)
    ga2 = jnp.where(tie_ang, mean_ang, gamma)
    set_a90 = (k == 2) | (k == 3) | (k == 4) | (k == 6) | (k == 7)
    set_b90 = (k == 3) | (k == 4) | (k == 6) | (k == 7)
    set_g90 = (k == 2) | (k == 3) | (k == 4) | (k == 7)
    al2 = jnp.where(set_a90, 90.0, al2)
    be2 = jnp.where(set_b90, 90.0, be2)
    ga2 = jnp.where(k == 6, 120.0, jnp.where(set_g90, 90.0, ga2))
    # keep rhombohedral away from the degenerate branch: an a=b=c cell with
    # alpha=beta=gamma >= 120 deg has zero volume (the three rows become
    # coplanar), so clip the tied angle strictly below it — pure-noise init
    # states can average above 120 and would otherwise emit a singular cell
    al2 = jnp.where(tie_ang, jnp.clip(al2, 5.0, 115.0), al2)
    be2 = jnp.where(tie_ang, jnp.clip(be2, 5.0, 115.0), be2)
    ga2 = jnp.where(tie_ang, jnp.clip(ga2, 5.0, 115.0), ga2)

    proj = lattice_from_params_jax(a2, b2, c2, al2, be2, ga2)
    return jnp.where((k == 0)[:, None, None], l, proj)
