"""Lattice-system projection (ops/lattice_proj) — unit + sampler clamp.

The clamp is the symmetry analog of CSP ``fixed_types``: BENCH.md
"Crystal-system conditioning" measured that prompts steer lattice geometry
but never reach exact symmetry; ``lattice_system=`` makes the metric class
exact by construction. These tests pin (1) the projection lands in the
right class per chem/lattice.py's classifier, (2) id 0 is a bitwise no-op,
(3) the jnp param/matrix round-trip matches the numpy reference, and (4)
the full sampler honors the clamp end-to-end, composed with CSP mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemeleon_tpu.chem.lattice import (
    crystal_system_from_lattice,
    lattice_from_parameters,
    lattice_parameters,
    lattice_system,
)
from chemeleon_tpu.ops.lattice_proj import (
    SYSTEM_IDS,
    lattice_from_params_jax,
    lattice_params_jax,
    project_lattice_system,
    system_ids,
)

TINY = dict(hidden_dim=32, time_dim=16, num_layers=1, num_freqs=8,
            timesteps=10, text_embed_dim=32, text_dim=32)


def _random_canonical(n, seed=0):
    """[n, 3, 3] random but well-conditioned canonical-frame lattices."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        a, b, c = rng.uniform(3.0, 9.0, 3)
        al, be, ga = rng.uniform(60.0, 115.0, 3)
        out.append(lattice_from_parameters(a, b, c, al, be, ga))
    return np.stack(out)


def test_params_roundtrip_matches_numpy():
    lats = _random_canonical(8, seed=1)
    a, b, c, al, be, ga = (np.asarray(x) for x in
                           lattice_params_jax(jnp.asarray(lats)))
    rebuilt = np.asarray(lattice_from_params_jax(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
        jnp.asarray(al), jnp.asarray(be), jnp.asarray(ga)))
    for i in range(len(lats)):
        ref = lattice_parameters(lats[i])
        np.testing.assert_allclose(
            [a[i], b[i], c[i], al[i], be[i], ga[i]], ref, atol=1e-5)
        np.testing.assert_allclose(rebuilt[i], lats[i], atol=1e-5)


@pytest.mark.parametrize("word,expected_ls", [
    ("monoclinic", "monoclinic"),
    ("orthorhombic", "orthorhombic"),
    ("tetragonal", "tetragonal"),
    ("trigonal", "rhombohedral"),   # rhombohedral cell == trigonal system
    ("hexagonal", "hexagonal"),
    ("cubic", "cubic"),
])
def test_projection_lands_in_class(word, expected_ls):
    lats = jnp.asarray(_random_canonical(6, seed=2))
    ids = jnp.asarray(system_ids([word] * 6))
    proj = np.asarray(project_lattice_system(lats, ids))
    for m in proj:
        assert lattice_system(m) == expected_ls
        # canonical zero pattern preserved (MASK_LATTICE_MATRIX)
        assert abs(m[0, 1]) < 1e-9 and abs(m[2, 0]) < 1e-9 \
            and abs(m[2, 1]) < 1e-9
    if word == "trigonal":
        assert crystal_system_from_lattice(proj[0]) == "trigonal"


def test_free_rows_bitwise_untouched():
    lats = jnp.asarray(_random_canonical(4, seed=3))
    ids = jnp.asarray(np.array([0, 7, 0, 3], np.int32))
    proj = np.asarray(project_lattice_system(lats, ids))
    np.testing.assert_array_equal(proj[0], np.asarray(lats)[0])
    np.testing.assert_array_equal(proj[2], np.asarray(lats)[2])
    assert lattice_system(proj[1]) == "cubic"
    assert lattice_system(proj[3]) == "orthorhombic"


def test_projection_survives_noise_lattices():
    # pure N(0,1) masked noise (the sampler's initial state) must project
    # to finite, in-class cells (min_len floor)
    key = jax.random.PRNGKey(0)
    mask = jnp.asarray([[1, 0, 1], [1, 1, 1], [0, 0, 1]], jnp.float32)
    noise = jax.random.normal(key, (7, 3, 3)) * mask
    ids = jnp.asarray(np.arange(1, 8, dtype=np.int32))
    proj = np.asarray(project_lattice_system(noise, ids))
    assert np.isfinite(proj).all()
    assert lattice_system(proj[6]) == "cubic"


def test_system_ids_validation():
    assert list(system_ids([None, "CUBIC ", "trigonal"])) == [0, 7, 5]
    with pytest.raises(ValueError, match="unknown crystal system"):
        system_ids(["spherical"])
    assert SYSTEM_IDS["rhombohedral"] == SYSTEM_IDS["trigonal"]


@pytest.fixture(scope="module")
def tiny_model():
    from chemeleon_tpu import Chemeleon, get_config
    cfg = get_config("chemeleon_bert_prompt", **TINY)
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_sample_batch_lattice_clamp(tiny_model):
    crystals = tiny_model.sample_batch(
        [4] * 3, ["TiO2"] * 3, key=jax.random.PRNGKey(1),
        lattice_system="cubic")
    for c in crystals:
        assert lattice_system(c.lattice) == "cubic"
        a, b, cc, al, be, ga = c.lattice_params
        np.testing.assert_allclose([a, b], [cc, cc], rtol=1e-5)
        np.testing.assert_allclose([al, be, ga], [90.0] * 3, atol=1e-4)


def test_sample_batch_mixed_clamp(tiny_model):
    crystals = tiny_model.sample_batch(
        [4] * 3, ["TiO2"] * 3, key=jax.random.PRNGKey(2),
        lattice_system=[None, "hexagonal", "tetragonal"])
    assert lattice_system(crystals[1].lattice) == "hexagonal"
    assert lattice_system(crystals[2].lattice) == "tetragonal"
    # row 0 free: must equal the unclamped run of the same key? a separate
    # compile may schedule differently — assert it is NOT pinned instead
    ga = crystals[0].lattice_params[5]
    assert not (abs(ga - 90.0) < 1e-4 or abs(ga - 120.0) < 1e-4)


def test_sample_csp_with_lattice_clamp(tiny_model):
    crystals = tiny_model.sample_csp("TiO2", n_samples=2, z=1,
                                     key=jax.random.PRNGKey(3),
                                     lattice_system="cubic")
    for c in crystals:
        assert c.reduced_formula() == "O2Ti"      # composition exact (CSP)
        assert lattice_system(c.lattice) == "cubic"  # lattice exact (clamp)


def test_stream_lattice_clamp(tiny_model):
    # the clamp holds at EVERY streamed snapshot, not just the final one —
    # the chain diffuses within the constraint manifold throughout
    snaps = list(tiny_model.sample_batch_stream(
        [4] * 2, ["TiO2"] * 2, key=jax.random.PRNGKey(4), stream_chunk=5,
        lattice_system="cubic"))
    assert len(snaps) == 2  # 10 timesteps / chunk 5
    for crystals in snaps:
        for c in crystals:
            assert lattice_system(c.lattice) == "cubic"


def test_lattice_clamp_validation(tiny_model):
    with pytest.raises(ValueError, match="same number"):
        tiny_model.sample_batch([4, 4], ["a", "b"],
                                lattice_system=["cubic"],
                                key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unknown crystal system"):
        tiny_model.sample_batch([4], ["a"], lattice_system="isometric",
                                key=jax.random.PRNGKey(0))
