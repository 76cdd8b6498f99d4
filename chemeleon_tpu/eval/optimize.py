"""Structure relaxation (reference: chemeleon/scripts/optimize.py:16-124).

The reference relaxes generated structures with MACE + ASE FIRE (cell relax
via FrechetCellFilter, then internal coordinates, with a divergence guard and
a fail.log skip-list). Neither MACE nor ASE is available here, so this module
implements:

  * a calculator protocol: ``calc(crystal) -> (energy eV, forces [n,3] eV/A)``
  * ``SoftSphereCalculator`` — an analytic pair-repulsion surrogate
    (covalent-radii based) useful for testing and for pushing atoms off
    collisions;
  * ``fire_relax`` — the FIRE algorithm (Bitzek et al. 2006) on cartesian
    coordinates, optionally with isotropic cell scaling;
  * ``optimize_atoms_list`` — the reference's batch workflow incl. the
    fmax>1000 divergence guard (optimize.py:116-120) and fail.log resume
    (optimize.py:42-47). Uses MACE when importable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Tuple

import numpy as np

from chemeleon_tpu.chem.elements import COVALENT_RADII, symbol_of
from chemeleon_tpu.chem.structure import Crystal

def _pbc_offsets(lattice: np.ndarray, rcut: float,
                 max_rep: int = 4) -> np.ndarray:
    """Integer image offsets covering every periodic image within ``rcut``.

    A fixed -1..1 range silently drops in-range neighbors when a cell axis
    is shorter than rcut (e.g. a 3 A axis with rcut=8 A needs images 2-3
    cells away). Per axis, the number of repeats is ceil(rcut / d_i) where
    d_i is the perpendicular spacing of the i-planes (V / |a_j x a_k|).
    Generated (unrelaxed) cells can be near-singular, so repeats are capped
    at ``max_rep`` per axis to bound the image count."""
    V = abs(float(np.linalg.det(lattice)))
    reps = []
    for i in range(3):
        cross = np.cross(lattice[(i + 1) % 3], lattice[(i + 2) % 3])
        d = V / max(np.linalg.norm(cross), 1e-12)
        reps.append(min(max_rep, max(1, int(np.ceil(rcut / max(d, 1e-12))))))
    return np.array([[i, j, k]
                     for i in range(-reps[0], reps[0] + 1)
                     for j in range(-reps[1], reps[1] + 1)
                     for k in range(-reps[2], reps[2] + 1)],
                    dtype=np.float64)


class SoftSphereCalculator:
    """E = sum_pairs eps * max(0, (r0_ij - r) / r0_ij)^2 over min images."""

    def __init__(self, eps: float = 1.0, radius_scale: float = 1.0):
        self.eps = eps
        self.radius_scale = radius_scale

    def __call__(self, st: Crystal) -> Tuple[float, np.ndarray]:
        n = len(st)
        cart = st.cart_coords
        radii = np.array([COVALENT_RADII.get(symbol_of(int(z)), 1.2)
                          for z in st.atom_types]) * self.radius_scale
        # interaction range = largest pair overlap distance
        img = _pbc_offsets(st.lattice, 2.0 * float(radii.max(initial=0.0))
                           ) @ st.lattice
        energy = 0.0
        forces = np.zeros((n, 3))
        for i in range(n):
            # vector from i to every j in every image
            d = cart[None, :, None, :] + img[None, None, :, :] - cart[i][None, None, None, :]
            d = d[0]                                   # [n, 27, 3]
            r = np.linalg.norm(d, axis=-1)             # [n, 27]
            r0 = (radii[i] + radii)[:, None]
            mask = (r > 1e-8) & (r < r0)
            ov = np.where(mask, (r0 - r) / r0, 0.0)
            energy += 0.5 * self.eps * float((ov ** 2).sum())
            # F_i = -dE/dx_i = -2 eps ov d / (r0 r): push i AWAY from j
            # (d points i -> j); pair energy counted once per unordered pair.
            with np.errstate(divide="ignore", invalid="ignore"):
                coef = np.where(
                    mask, -2.0 * self.eps * ov / r0 / np.maximum(r, 1e-8), 0.0)
            forces[i] += (coef[..., None] * d).sum(axis=(0, 1))
        return energy, forces


class LennardJonesCalculator:
    """Min-image LJ with per-pair sigma from covalent radii. Unlike the
    soft-sphere repulsion it has an equilibrium cell, so it exercises the
    full (anisotropic) cell relaxation the way MACE does upstream."""

    def __init__(self, eps: float = 0.2, sigma_scale: float = 1.0,
                 rcut: float = 8.0):
        self.eps = eps
        self.sigma_scale = sigma_scale
        self.rcut = rcut

    def __call__(self, st: Crystal) -> Tuple[float, np.ndarray]:
        n = len(st)
        cart = st.cart_coords
        radii = np.array([COVALENT_RADII.get(symbol_of(int(z)), 1.2)
                          for z in st.atom_types]) * self.sigma_scale
        img = _pbc_offsets(st.lattice, self.rcut) @ st.lattice
        energy = 0.0
        forces = np.zeros((n, 3))
        for i in range(n):
            d = cart[None, :, :] + img[:, None, :] - cart[i]  # [27, n, 3]
            r = np.linalg.norm(d, axis=-1)                    # [27, n]
            sig = (radii[i] + radii)[None, :]
            mask = (r > 1e-8) & (r < self.rcut)
            rs = np.where(mask, r, 1.0)
            x6 = (sig / rs) ** 6
            e = 4.0 * self.eps * (x6 ** 2 - x6)
            energy += 0.5 * float(np.where(mask, e, 0.0).sum())
            # dE/dr = 4 eps (-12 x12 + 6 x6)/r; F_i = -dE/dx_i (d points i->j)
            dedr = np.where(mask, 4.0 * self.eps *
                            (-12.0 * x6 ** 2 + 6.0 * x6) / rs, 0.0)
            forces[i] += ((dedr / rs)[..., None] * d).sum(axis=(0, 1))
        return energy, forces


def numerical_stress(st: Crystal,
                     calc: Callable[[Crystal], Tuple[float, np.ndarray]],
                     eps: float = 1e-4) -> np.ndarray:
    """Symmetric 3x3 stress tensor sigma_ab = (1/V) dE/d(eps_ab) by central
    finite differences on affine strains (atoms co-move, frac fixed)."""
    lat0 = st.lattice
    frac = st.frac_coords
    V = st.volume
    sigma = np.zeros((3, 3))
    for a in range(3):
        for b in range(a, 3):
            strain = np.zeros((3, 3))
            strain[a, b] = strain[b, a] = eps
            Ep, _ = calc(Crystal(lat0 @ (np.eye(3) + strain), frac,
                                 st.atom_types))
            Em, _ = calc(Crystal(lat0 @ (np.eye(3) - strain), frac,
                                 st.atom_types))
            # dE = V * sigma : d_eps; the symmetric off-diagonal strain hits
            # both (a,b) and (b,a)
            denom = (2.0 if a == b else 4.0) * eps * V
            sigma[a, b] = sigma[b, a] = (Ep - Em) / denom
    return sigma


def fire_relax(st: Crystal, calc: Callable[[Crystal], Tuple[float, np.ndarray]],
               fmax: float = 0.05, steps: int = 200, dt: float = 0.1,
               dt_max: float = 1.0, relax_cell: bool = False,
               diverge_fmax: float = 1000.0,
               smax: float = 5e-3, max_strain_step: float = 0.02,
               cell_gain: float = 1.0) -> Tuple[Crystal, dict]:
    """FIRE minimization; returns (relaxed crystal, info).

    ``relax_cell=True`` relaxes the FULL 3x3 cell (lengths AND angles) via
    steepest descent on the strain — the TPU-repo analog of the reference's
    FrechetCellFilter stage (reference optimize.py:100-108), which the
    round-1 isotropic volume scaling did not cover. Every 10 position steps
    the cell takes a strain step d_eps = -cell_gain * sigma (proportional to
    the stress so it decays near the minimum, capped at max_strain_step for
    stability far away) until |sigma| < smax."""
    x = st.cart_coords.copy()
    lat = st.lattice.copy()
    v = np.zeros_like(x)
    a_start, f_inc, f_dec, f_alpha, n_min = 0.1, 1.1, 0.5, 0.99, 5
    alpha = a_start
    n_pos = 0
    info = {"converged": False, "steps": 0, "diverged": False}
    for step in range(steps):
        cur = Crystal(lat, (x @ np.linalg.inv(lat)) % 1.0, st.atom_types)
        energy, forces = calc(cur)
        fnorm = float(np.sqrt((forces ** 2).sum(-1)).max()) if len(x) else 0.0
        info.update(steps=step, energy=energy, fmax=fnorm)
        if fnorm > diverge_fmax:  # divergence guard (optimize.py:116-120)
            info["diverged"] = True
            break
        if fnorm < fmax:
            if relax_cell:
                sigma = numerical_stress(cur, calc)
                info["stress_max"] = float(np.abs(sigma).max())
                if info["stress_max"] > smax:
                    # forces converged but cell still stressed: strain and go on
                    frac = (x @ np.linalg.inv(lat)) % 1.0
                    gamma = min(cell_gain,
                                max_strain_step / info["stress_max"])
                    lat = lat @ (np.eye(3) - gamma * sigma)
                    x = frac @ lat
                    continue
            info["converged"] = True
            break
        p = float((forces * v).sum())
        if p > 0:
            n_pos += 1
            v = (1 - alpha) * v + alpha * np.linalg.norm(v) * (
                forces / max(np.linalg.norm(forces), 1e-12))
            if n_pos > n_min:
                dt = min(dt * f_inc, dt_max)
                alpha *= f_alpha
        else:
            n_pos = 0
            v[:] = 0.0
            dt *= f_dec
            alpha = a_start
        v = v + dt * forces
        x = x + dt * v
        if relax_cell and step % 10 == 9:
            # full anisotropic cell step: strain against the stress tensor
            frac = (x @ np.linalg.inv(lat)) % 1.0
            cur_cell = Crystal(lat, frac, st.atom_types)
            sigma = numerical_stress(cur_cell, calc)
            s_inf = float(np.abs(sigma).max())
            info["stress_max"] = s_inf
            if s_inf > smax:
                gamma = min(cell_gain, max_strain_step / s_inf)
                strain = -gamma * sigma
                lat = lat @ (np.eye(3) + strain)
                x = frac @ lat  # atoms co-move affinely
    final = Crystal(lat, (x @ np.linalg.inv(lat)) % 1.0, st.atom_types)
    return final, info


def optimize_atoms_list(crystals: List[Crystal], save_dir: str,
                        calc: Optional[Callable] = None, fmax: float = 0.05,
                        steps: int = 200) -> List[Optional[Crystal]]:
    """Batch relaxation workflow with fail.log resume
    (reference optimize.py:16-81)."""
    save = Path(save_dir)
    save.mkdir(parents=True, exist_ok=True)
    fail_log = save / "fail.log"
    failed = set()
    if fail_log.exists():
        failed = set(fail_log.read_text().split())
    if calc is None:
        calc = _mace_calculator() or SoftSphereCalculator()
    out: List[Optional[Crystal]] = []
    for i, st in enumerate(crystals):
        tag = f"{i}"
        if tag in failed:
            out.append(None)
            continue
        try:
            relaxed, info = fire_relax(st, calc, fmax=fmax, steps=steps)
            if info["diverged"]:
                raise RuntimeError(f"diverged (fmax={info['fmax']:.1f})")
            (save / f"opt_{i}.cif").write_text(relaxed.to_cif())
            out.append(relaxed)
        except Exception as e:
            print(f"optimize failed for structure {i}: {e}")
            with open(fail_log, "a") as f:
                f.write(tag + "\n")
            out.append(None)
    return out


def _mace_calculator():
    try:
        from mace.calculators import mace_mp
    except ImportError:
        return None
    mc = mace_mp(default_dtype="float32", device="cpu")

    def calc(st: Crystal):
        atoms = st.to_ase()
        atoms.calc = mc
        return float(atoms.get_potential_energy()), np.asarray(
            atoms.get_forces())

    return calc
