"""In-repo energy surrogate for the metastability metric.

The reference computes ``meta_stable`` with the MACE ML force field
(reference evaluate.py:207-220: fraction of same-composition samples within
0.1 eV/atom of the ground-truth energy). MACE is not installable in this
image (zero egress), so this module provides a documented classical
surrogate — a Born-Lande-style ionic potential:

    E = E_Ewald(q)                       long-range electrostatics
      + sum_pairs A exp((sigma_ij - r)/rho)    Born-Mayer repulsion
      - sum_pairs eps_d (sigma_ij / r)^6       universal dispersion

with formal charges q assigned per element from the SMACT-style oxidation
state tables (chem/validity.py::charge_neutral_assignments + Pauling
electronegativity ordering); metallic/alloy compositions that admit no
neutral ionic assignment get q = 0 and are scored by the
repulsion+dispersion packing terms alone.

This is a *surrogate*: its absolute energies are not formation energies,
but within a fixed composition it ranks packings — the ground-truth
structure sits at/near a local minimum while distorted or mis-ordered
polymorphs (e.g. rock-salt vs zinc-blende for NaCl) score higher. The
calibration artifact (scripts/calibrate_energy.py ->
results/energy_calibration.json) quantifies this on mp-40 ground truths:
the ground truth scores below its perturbed copies in ~82% of rows and the
0.1 eV/atom gate passes small perturbations while failing large ones —
the gross-geometry separation meta_stable relies on. It does NOT resolve
meV-scale polymorph ordering (energy_above_hull ranking within polymorph
groups is at chance, 7/16 pairs) — treat meta_stable-with-surrogate as a
geometry-sanity gate, not a thermodynamic stability claim. MACE takes over
automatically when installed (eval/metrics.py).

Units: eV and Angstrom; e^2/(4 pi eps0) = 14.3996 eV*A.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from chemeleon_tpu.chem.elements import (COVALENT_RADII, ELECTRONEGATIVITY,
                                         OXIDATION_STATES, symbol_of)
from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.chem.validity import (charge_neutral_assignments,
                                         pauling_ordered)

KE = 14.399645  # e^2 / (4 pi eps0), eV * Angstrom


def assign_charges(crystal: Crystal) -> np.ndarray:
    """Formal charge per site from the oxidation-state tables.

    Picks the charge-neutral, Pauling-ordered oxidation-state combination
    with the smallest total |q| (the "most ionic-modest" assignment);
    returns zeros when none exists (alloys, noble-gas compounds, elements
    missing from the tables)."""
    comp: Dict[str, int] = crystal.composition
    elements = list(comp.keys())
    counts = [int(comp[e]) for e in elements]
    if len(elements) == 1:
        return np.zeros(len(crystal))
    best: Optional[Tuple[float, Tuple[int, ...]]] = None
    for states in charge_neutral_assignments(elements, counts):
        if not pauling_ordered(elements, states):
            continue
        score = sum(abs(s) * c for s, c in zip(states, counts))
        if best is None or score < best[0]:
            best = (score, states)
    if best is None:
        return np.zeros(len(crystal))
    by_el = dict(zip(elements, best[1]))
    return np.array([float(by_el[symbol_of(int(z))])
                     for z in crystal.atom_types])


def ewald_energy(lattice: np.ndarray, frac: np.ndarray, q: np.ndarray,
                 accuracy: float = 1e-5) -> float:
    """Ewald summation of the point-charge electrostatic energy (eV).

    Standard three-part split (real-space erfc + reciprocal Gaussian +
    self-energy) with the conventional work-balancing splitting parameter
    alpha = (n pi^3 / V^2)^(1/6)."""
    from scipy.special import erfc

    n = len(q)
    if n == 0 or not np.any(q):
        return 0.0
    lattice = np.asarray(lattice, np.float64)
    V = abs(float(np.linalg.det(lattice)))
    cart = (np.asarray(frac) % 1.0) @ lattice
    alpha = (n * np.pi ** 3 / V ** 2) ** (1.0 / 6.0)
    tol = np.sqrt(-np.log(accuracy))
    rcut = tol / alpha
    gcut = 2.0 * alpha * tol

    # real-space: images within rcut (per-axis repeats from plane spacings)
    reps = []
    for i in range(3):
        cross = np.cross(lattice[(i + 1) % 3], lattice[(i + 2) % 3])
        d = V / max(float(np.linalg.norm(cross)), 1e-12)
        reps.append(max(1, int(np.ceil(rcut / d))))
    ims = np.array([[i, j, k]
                    for i in range(-reps[0], reps[0] + 1)
                    for j in range(-reps[1], reps[1] + 1)
                    for k in range(-reps[2], reps[2] + 1)],
                   np.float64) @ lattice                      # [m, 3]
    dvec = (cart[None, :, None, :] + ims[None, None, :, :]
            - cart[:, None, None, :])                         # [n, n, m, 3]
    r = np.linalg.norm(dvec, axis=-1)                         # [n, n, m]
    mask = (r > 1e-10) & (r < rcut)
    rs = np.where(mask, r, 1.0)
    qq = q[:, None, None] * q[None, :, None]
    e_real = 0.5 * float((np.where(mask, qq * erfc(alpha * rs) / rs, 0.0)
                          ).sum())

    # reciprocal space: k = 2 pi (recip rows) . h within gcut
    recip = 2.0 * np.pi * np.linalg.inv(lattice).T
    hmax = []
    for i in range(3):
        hmax.append(max(1, int(np.ceil(gcut /
                                       max(np.linalg.norm(recip[i]), 1e-12)))))
    hs = np.array([[i, j, k]
                   for i in range(-hmax[0], hmax[0] + 1)
                   for j in range(-hmax[1], hmax[1] + 1)
                   for k in range(-hmax[2], hmax[2] + 1)
                   if (i, j, k) != (0, 0, 0)], np.float64)
    ks = hs @ recip                                           # [nk, 3]
    k2 = (ks ** 2).sum(-1)
    sel = k2 < gcut ** 2
    ks, k2 = ks[sel], k2[sel]
    phase = ks @ cart.T                                       # [nk, n]
    s_re = (q[None, :] * np.cos(phase)).sum(-1)
    s_im = (q[None, :] * np.sin(phase)).sum(-1)
    e_recip = (2.0 * np.pi / V) * float(
        (np.exp(-k2 / (4.0 * alpha ** 2)) / k2
         * (s_re ** 2 + s_im ** 2)).sum())

    e_self = -alpha / np.sqrt(np.pi) * float((q ** 2).sum())
    return KE * (e_real + e_recip + e_self)


class IonicPotentialCalculator:
    """Born-Lande-style surrogate: Ewald + Born-Mayer repulsion +
    universal r^-6 dispersion. ``__call__(crystal) -> total energy (eV)``
    (the eval/metrics.py calculator protocol)."""

    def __init__(self, a_rep: float = 0.21, rho: float = 0.30,
                 eps_disp: float = 0.02, rcut: float = 10.0,
                 radius_scale: float = 1.0):
        # defaults tuned on NaCl: rock-salt below zinc-blende by ~0.14
        # eV/atom with the equilibrium at the experimental lattice constant
        # (the classic BMH rho=0.345 with strong dispersion flips the
        # polymorph ordering — see the parameter scan in the build notes)
        self.a_rep = a_rep          # Born-Mayer prefactor (eV)
        self.rho = rho              # Born-Mayer hardness (A)
        self.eps_disp = eps_disp    # dispersion well scale (eV)
        self.rcut = rcut
        self.radius_scale = radius_scale

    def _short_range(self, st: Crystal) -> float:
        n = len(st)
        cart = st.cart_coords
        radii = np.array([COVALENT_RADII.get(symbol_of(int(z)), 1.2)
                          for z in st.atom_types]) * self.radius_scale
        lattice = st.lattice
        V = max(st.volume, 1e-9)
        reps = []
        for i in range(3):
            cross = np.cross(lattice[(i + 1) % 3], lattice[(i + 2) % 3])
            d = V / max(float(np.linalg.norm(cross)), 1e-12)
            reps.append(min(6, max(1, int(np.ceil(self.rcut / d)))))
        ims = np.array([[i, j, k]
                        for i in range(-reps[0], reps[0] + 1)
                        for j in range(-reps[1], reps[1] + 1)
                        for k in range(-reps[2], reps[2] + 1)],
                       np.float64) @ lattice
        e = 0.0
        for i in range(n):
            d = cart[None, :, :] + ims[:, None, :] - cart[i]   # [m, n, 3]
            r = np.linalg.norm(d, axis=-1)
            sig = (radii[i] + radii)[None, :]
            mask = (r > 1e-10) & (r < self.rcut)
            rs = np.where(mask, r, 1.0)
            rep = self.a_rep * np.exp((sig - rs) / self.rho)
            disp = -self.eps_disp * (sig / rs) ** 6
            e += 0.5 * float(np.where(mask, rep + disp, 0.0).sum())
        return e

    def __call__(self, st: Crystal) -> float:
        q = assign_charges(st)
        return ewald_energy(st.lattice, st.frac_coords, q) + \
            self._short_range(st)


def surrogate_calculator():
    """Calculator for eval/metrics.py: ``calc(crystal) -> energy (eV)``."""
    calc = IonicPotentialCalculator()

    def f(st: Crystal) -> float:
        return calc(st)

    return f
