"""Native C++ kernels vs pure-Python fallbacks: fuzz agreement + speed."""

import time

import numpy as np
import pytest

native = pytest.importorskip("chemeleon_tpu.native")

from chemeleon_tpu.chem.lattice import (  # noqa: E402
    lattice_from_parameters,
    lattice_parameters,
)
from chemeleon_tpu.chem.matcher import StructureMatcher  # noqa: E402
from chemeleon_tpu.chem.structure import Crystal  # noqa: E402


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (no g++?)")


def _rand_crystal(rng, n=None):
    n = n or int(rng.integers(2, 8))
    lat = lattice_from_parameters(*(rng.uniform(3.5, 7.0, 3)),
                                  *(rng.uniform(70, 110, 3)))
    return Crystal(lat, rng.uniform(size=(n, 3)), rng.integers(1, 20, n))


def test_niggli_agreement():
    rng = np.random.default_rng(0)
    for _ in range(30):
        m = lattice_from_parameters(*(rng.uniform(3, 8, 3)),
                                    *(rng.uniform(60, 120, 3)))
        # random unimodular shear
        m2 = m.copy()
        m2[2] += int(rng.integers(-2, 3)) * m2[0] + int(rng.integers(-2, 3)) * m2[1]
        red = native.niggli_reduce(m2)
        # same lattice volume, reduced-cell params are canonical
        np.testing.assert_allclose(abs(np.linalg.det(red)),
                                   abs(np.linalg.det(m2)), rtol=1e-9)
        a, b, c, *_ = lattice_parameters(red)
        assert a <= b + 1e-6 and b <= c + 1e-6


def test_distance_agreement():
    rng = np.random.default_rng(1)
    for _ in range(20):
        c = _rand_crystal(rng)
        dn = native.distance_matrix(c.lattice, c.frac_coords)
        # pure-python reference computation
        cart = c.cart_coords
        offsets = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                            for k in (-1, 0, 1)], dtype=np.float64)
        img = offsets @ c.lattice
        diff = (cart[None, :, None, :] + img[None, None]
                - cart[:, None, None, :])
        dp = np.linalg.norm(diff, axis=-1).min(-1)
        np.testing.assert_allclose(dn, dp, atol=1e-8)


def test_matcher_agreement_fuzz():
    rng = np.random.default_rng(2)
    py = StructureMatcher(backend="python")
    nat = StructureMatcher(backend="native")
    n_match = 0
    for trial in range(40):
        s1 = _rand_crystal(rng)
        if trial % 2 == 0:
            # derived copy: shift + permute (should usually match)
            order = rng.permutation(len(s1))
            s2 = Crystal(s1.lattice,
                         (s1.frac_coords[order] + rng.uniform(0, 1, 3)) % 1.0,
                         s1.atom_types[order])
        else:
            s2 = Crystal(s1.lattice,
                         (s1.frac_coords + rng.normal(0, 0.15,
                                                      s1.frac_coords.shape))
                         % 1.0, s1.atom_types)
        want = py.fit(s1, s2)
        got = nat.fit(s1, s2)
        assert got == want, (trial, want, got)
        n_match += got
    assert 0 < n_match < 40  # both outcomes exercised


def test_native_matcher_speed():
    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(10):
        s1 = _rand_crystal(rng, n=12)
        order = rng.permutation(12)
        s2 = Crystal(s1.lattice,
                     (s1.frac_coords[order] + rng.uniform(0, 1, 3)) % 1.0,
                     s1.atom_types[order])
        pairs.append((s1, s2))
    nat = StructureMatcher(backend="native")
    py = StructureMatcher(backend="python")
    t0 = time.perf_counter()
    for s1, s2 in pairs:
        nat.fit(s1, s2)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s1, s2 in pairs:
        py.fit(s1, s2)
    t_py = time.perf_counter() - t0
    print(f"native {t_nat*1000:.1f}ms vs python {t_py*1000:.1f}ms "
          f"({t_py/max(t_nat,1e-9):.1f}x)")
    assert t_nat < t_py  # native must actually be faster
