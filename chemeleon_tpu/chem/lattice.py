"""Lattice math: parameter conversion, Niggli reduction, lattice systems.

Standalone rebuild of the pymatgen lattice functionality the reference relies
on (reference mp_dataset.py:44-50 Niggli-reduces and canonicalizes via
``Lattice.from_parameters``; evaluate.py:252-272 classifies lattice systems).
No pymatgen in this environment, so these are implemented from the standard
algorithms (Krivy & Gruber 1976 for Niggli).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def lattice_from_parameters(a: float, b: float, c: float, alpha: float,
                            beta: float, gamma: float) -> np.ndarray:
    """Canonical row-vector lattice matrix from lengths (Angstrom) and angles
    (degrees), using the same convention as pymatgen's
    ``Lattice.from_parameters`` — which zeroes entries (0,1), (2,0), (2,1),
    the reason for the reference's ``mask_lattice_matrix``
    (chemeleon.py:70-73)."""
    alpha_r, beta_r, gamma_r = map(math.radians, (alpha, beta, gamma))
    val = ((math.cos(alpha_r) * math.cos(beta_r) - math.cos(gamma_r))
           / (math.sin(alpha_r) * math.sin(beta_r)))
    val = min(1.0, max(-1.0, val))
    gamma_star = math.acos(val)
    vector_a = [a * math.sin(beta_r), 0.0, a * math.cos(beta_r)]
    vector_b = [-b * math.sin(alpha_r) * math.cos(gamma_star),
                b * math.sin(alpha_r) * math.sin(gamma_star),
                b * math.cos(alpha_r)]
    vector_c = [0.0, 0.0, float(c)]
    return np.array([vector_a, vector_b, vector_c], dtype=np.float64)


def lattice_parameters(matrix: np.ndarray) -> Tuple[float, float, float,
                                                    float, float, float]:
    """(a, b, c, alpha, beta, gamma) in Angstrom / degrees from a row-vector
    lattice matrix."""
    m = np.asarray(matrix, dtype=np.float64)
    lengths = np.linalg.norm(m, axis=1)
    a, b, c = lengths

    def angle(u, v):
        cosang = np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v))
        return math.degrees(math.acos(min(1.0, max(-1.0, cosang))))

    alpha = angle(m[1], m[2])
    beta = angle(m[0], m[2])
    gamma = angle(m[0], m[1])
    return float(a), float(b), float(c), alpha, beta, gamma


def canonicalize_lattice(matrix: np.ndarray) -> np.ndarray:
    """Rebuild the lattice from its parameters — rotates any lattice into the
    canonical from_parameters frame (the reference applies this to every
    training structure, mp_dataset.py:46-50)."""
    return lattice_from_parameters(*lattice_parameters(matrix))


def volume(matrix: np.ndarray) -> float:
    return float(abs(np.linalg.det(np.asarray(matrix, dtype=np.float64))))


# ---------------------------------------------------------------------------
# Niggli reduction (Krivy & Gruber 1976, with the Grosse-Kunstleve 2004
# stabilization) — same algorithm family as pymatgen's get_niggli_reduced_lattice.
# ---------------------------------------------------------------------------

def niggli_reduce(matrix: np.ndarray, tol: float = 1e-5,
                  max_iter: int = 100) -> np.ndarray:
    """Return the Niggli-reduced cell of ``matrix`` (row vectors).

    The returned matrix spans the same lattice (related by a unimodular
    transform). Raises ValueError if the iteration fails to converge.
    Uses the native C++ kernel when built (chemeleon_tpu/native).
    """
    try:
        from chemeleon_tpu.native import available
        if available():
            from chemeleon_tpu.native import niggli_reduce as native_niggli
            return native_niggli(matrix, tol=tol, max_iter=max_iter)
    except ImportError:
        pass
    m = np.asarray(matrix, dtype=np.float64).copy()
    e = tol * volume(m) ** (1.0 / 3.0)

    # Metric quantities
    def metrics(mat):
        a_v, b_v, c_v = mat
        A = float(np.dot(a_v, a_v))
        B = float(np.dot(b_v, b_v))
        C = float(np.dot(c_v, c_v))
        xi = 2.0 * float(np.dot(b_v, c_v))
        eta = 2.0 * float(np.dot(a_v, c_v))
        zeta = 2.0 * float(np.dot(a_v, b_v))
        return A, B, C, xi, eta, zeta

    for _ in range(max_iter):
        A, B, C, xi, eta, zeta = metrics(m)

        # A1
        if A > B + e or (abs(A - B) < e and abs(xi) > abs(eta) + e):
            m = m[[1, 0, 2]] * np.array([[1.0], [1.0], [-1.0]])
            continue
        A, B, C, xi, eta, zeta = metrics(m)
        # A2
        if B > C + e or (abs(B - C) < e and abs(eta) > abs(zeta) + e):
            m = m[[0, 2, 1]] * np.array([[-1.0], [1.0], [1.0]])
            continue
        # A3 / A4: fix signs of xi, eta, zeta
        l_ = 1 if xi > e else (-1 if xi < -e else 0)
        mm = 1 if eta > e else (-1 if eta < -e else 0)
        n = 1 if zeta > e else (-1 if zeta < -e else 0)
        if l_ * mm * n == 1:
            i = 1 if l_ != -1 else -1
            j = 1 if mm != -1 else -1
            k = 1 if n != -1 else -1
            m = m * np.array([[float(i)], [float(j)], [float(k)]])
        else:
            # make all non-positive
            vals = [l_, mm, n]
            signs = [1.0, 1.0, 1.0]
            undef = -1
            for idx, v in enumerate(vals):
                if v == 1:
                    signs[idx] = -1.0
                elif v == 0:
                    undef = idx
            if np.prod(signs) < 0 and undef >= 0:
                signs[undef] = -1.0
            m = m * np.array([[signs[0]], [signs[1]], [signs[2]]])
        A, B, C, xi, eta, zeta = metrics(m)

        # A5
        if (abs(xi) > B + e or (abs(B - xi) < e and 2 * eta < zeta - e)
                or (abs(B + xi) < e and zeta < -e)):
            s = -1.0 if xi > 0 else 1.0
            m[2] = m[2] + s * m[1]
            continue
        # A6
        if (abs(eta) > A + e or (abs(A - eta) < e and 2 * xi < zeta - e)
                or (abs(A + eta) < e and zeta < -e)):
            s = -1.0 if eta > 0 else 1.0
            m[2] = m[2] + s * m[0]
            continue
        # A7
        if (abs(zeta) > A + e or (abs(A - zeta) < e and 2 * xi < eta - e)
                or (abs(A + zeta) < e and eta < -e)):
            s = -1.0 if zeta > 0 else 1.0
            m[1] = m[1] + s * m[0]
            continue
        # A8
        if xi + eta + zeta + A + B < -e or (
                abs(xi + eta + zeta + A + B) < e and 2 * (A + eta) + zeta > e):
            m[2] = m[0] + m[1] + m[2]
            continue
        return m
    raise ValueError("Niggli reduction did not converge")


# ---------------------------------------------------------------------------
# Lattice-system classification (reference evaluate.py:252-272 special-cases)
# ---------------------------------------------------------------------------

LATTICE_SYSTEMS = ("triclinic", "monoclinic", "orthorhombic", "tetragonal",
                   "rhombohedral", "hexagonal", "cubic")


def lattice_system(matrix: np.ndarray, length_tol: float = 1e-2,
                   angle_tol: float = 0.5) -> str:
    """Classify the lattice system from cell parameters alone."""
    a, b, c, alpha, beta, gamma = lattice_parameters(matrix)

    def close(x, y, tol):
        return abs(x - y) <= tol

    len_ab = close(a, b, length_tol * max(a, b))
    len_bc = close(b, c, length_tol * max(b, c))
    len_ac = close(a, c, length_tol * max(a, c))
    r90 = [close(x, 90.0, angle_tol) for x in (alpha, beta, gamma)]
    r120 = close(gamma, 120.0, angle_tol)

    if len_ab and len_bc and all(r90):
        return "cubic"
    if len_ab and len_bc and close(alpha, beta, angle_tol) \
            and close(beta, gamma, angle_tol) and not r90[0]:
        return "rhombohedral"
    if len_ab and r90[0] and r90[1] and r120:
        return "hexagonal"
    if len_ab and all(r90):
        return "tetragonal"
    if all(r90):
        return "orthorhombic"
    if sum(r90) == 2:
        return "monoclinic"
    return "triclinic"


# Crystal system equals lattice system except rhombohedral -> trigonal.
def crystal_system_from_lattice(matrix: np.ndarray) -> str:
    ls = lattice_system(matrix)
    return "trigonal" if ls == "rhombohedral" else ls
