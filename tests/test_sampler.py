"""End-to-end sampler tests: determinism, stream/batch equivalence,
trajectory bookkeeping, unguided mode."""

import jax
import numpy as np
import pytest

from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import Chemeleon

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, text_embed_dim=32,
            pad_buckets=(8,))


@pytest.fixture(scope="module")
def model():
    cfg = get_config(None, **TINY)
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_sample_shapes_and_types(model):
    crystals = model.sample("LiMnO4", n_atoms=6, n_samples=3,
                            key=jax.random.PRNGKey(1))
    assert len(crystals) == 3
    for c in crystals:
        assert len(c) == 6
        assert ((c.atom_types >= 0) & (c.atom_types <= 103)).all()
        assert ((c.frac_coords >= 0) & (c.frac_coords < 1)).all()
        # lattice respects the canonical zero pattern (chemeleon.py:70-73)
        assert c.lattice[0, 1] == 0 and c.lattice[2, 0] == 0 \
            and c.lattice[2, 1] == 0


def test_determinism(model):
    a = model.sample("TiO2", 4, 2, key=jax.random.PRNGKey(7))
    b = model.sample("TiO2", 4, 2, key=jax.random.PRNGKey(7))
    for ca, cb in zip(a, b):
        np.testing.assert_array_equal(ca.atom_types, cb.atom_types)
        np.testing.assert_allclose(ca.frac_coords, cb.frac_coords)
        np.testing.assert_allclose(ca.lattice, cb.lattice)


def test_stream_matches_batch(model):
    """Chunked streaming must produce the exact same final state as the
    single-scan path (both fold the same key by timestep)."""
    key = jax.random.PRNGKey(3)
    batch_result = model.sample("TiO2", 4, 2, key=key)
    chunks = list(model.sample("TiO2", 4, 2, stream=True, stream_chunk=5,
                               key=key))
    assert len(chunks) == 20 // 5
    final = chunks[-1]
    for ca, cb in zip(batch_result, final):
        np.testing.assert_array_equal(ca.atom_types, cb.atom_types)
        np.testing.assert_allclose(ca.frac_coords, cb.frac_coords, atol=1e-6)


def test_trajectory(model):
    traj = model.sample("TiO2", 4, 2, return_trajectory=True,
                        key=jax.random.PRNGKey(4))
    assert len(traj) == 21  # t = T (initial noise) .. 0
    last_step = traj[-1]
    assert len(last_step) == 2


def test_trajectory_container_api(model):
    cont = model.sample_batch([4, 6], ["TiO2", "SiO2"],
                              key=jax.random.PRNGKey(5),
                              return_trajectory=True)
    assert 0 in cont and 19 in cont
    # container[T] is the initial pure-noise state (the documented index
    # convention; the reference records it, chemeleon.py:361-368)
    assert 20 in cont
    assert (np.asarray(cont[20].atom_types) == 0).all()  # all-dummy start
    crystals = cont.get_atoms(0)
    assert [len(c) for c in crystals] == [4, 6]


def test_unguided(model):
    cfg = get_config("unguided", **TINY)
    m = Chemeleon(cfg)
    m.init_params(jax.random.PRNGKey(0))
    crystals = m.sample(None, 4, 2, key=jax.random.PRNGKey(1))
    assert len(crystals) == 2


def test_mixed_natoms_padding(model):
    """Graphs of different sizes in one batch: each keeps its own n."""
    crystals = model.sample_batch([3, 7, 5], ["a", "b", "c"],
                                  key=jax.random.PRNGKey(6))
    assert [len(c) for c in crystals] == [3, 7, 5]


def test_cond_scale_changes_output(model):
    a = model.sample("TiO2", 4, 1, cond_scale=2.0, key=jax.random.PRNGKey(9))
    b = model.sample("TiO2", 4, 1, cond_scale=0.0, key=jax.random.PRNGKey(9))
    assert not np.allclose(a[0].frac_coords, b[0].frac_coords)


def test_baseline_config1_smoke(model):
    """BASELINE.json config #1 shape: prompt-mode, 3 samples x 6 atoms
    (the reference CLI default: `chemeleon sample prompt -t ... --n-atoms 6
    --n-samples 3`, BASELINE.md) — CPU-runnable end-to-end smoke."""
    crystals = model.sample(
        "A Crystal Structure of LiMnO4 with orthorhombic symmetry",
        n_atoms=6, n_samples=3, cond_scale=2.0, step_lr=1e-5,
        key=jax.random.PRNGKey(42))
    assert len(crystals) == 3
    for c in crystals:
        assert len(c) == 6
        cif = c.to_cif()
        assert "_cell_length_a" in cif and cif.count("  1") >= 6


def test_input_validation_errors(model):
    """Silent-misuse guards: truncating n_max, missing prompt on a guided
    model, mismatched lengths — all raise clear ValueErrors."""
    with pytest.raises(ValueError, match="truncat"):
        model.sample_batch([12], ["TiO2"], n_max=8,
                           key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="text-guided"):
        model.sample_batch([4], None, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="same number"):
        model.sample_batch([4, 4], ["TiO2"], key=jax.random.PRNGKey(0))
    from chemeleon_tpu.models.chemeleon import Chemeleon as _C
    m = _C(get_config(None, **TINY), text_backend="hash")
    with pytest.raises(RuntimeError, match="init_params"):
        m.sample_batch([4], ["TiO2"], key=jax.random.PRNGKey(0))


def test_architecture_typos_fail_loudly():
    """dis_emb/act_fn typos must raise, not silently change the network."""
    import jax.numpy as jnp
    for bad in (dict(dis_emb="sine"), dict(act_fn="relu")):
        cfg = get_config(None, **{**TINY, **bad})
        m = Chemeleon(cfg, text_backend="hash")
        with pytest.raises(ValueError):
            m.init_params(jax.random.PRNGKey(0))


def test_trajectory_stride(model):
    """trajectory_stride=k records every k-th state (host transfer shrinks
    k-fold) without perturbing the sampled final state: stride==1 and
    stride==5 runs are bitwise-identical at t=0, and the strided container
    holds exactly {T (initial), T-k, T-2k, ..., 0}."""
    key = jax.random.PRNGKey(11)
    cfg5 = get_config(None, **{**TINY, "trajectory_stride": 5})
    m5 = Chemeleon(cfg5, text_backend="hash")
    m5.params = model.params  # same weights, different stride

    dense = model.sample_batch([4, 6], ["TiO2", "SiO2"], key=key,
                               return_trajectory=True)
    strided = m5.sample_batch([4, 6], ["TiO2", "SiO2"], key=key,
                              return_trajectory=True)

    T = model.cfg.timesteps
    assert strided.timesteps() == [0, 5, 10, 15, T]
    assert dense.timesteps() == list(range(T + 1))
    for t in strided.timesteps():
        a, b = dense[t], strided[t]
        np.testing.assert_array_equal(a.atom_types, b.atom_types)
        np.testing.assert_allclose(a.frac_coords, b.frac_coords, atol=1e-6)
        np.testing.assert_allclose(a.lattices, b.lattices, atol=1e-6)


def test_trajectory_stride_must_divide(model):
    cfg = get_config(None, **{**TINY, "trajectory_stride": 3})  # 20 % 3 != 0
    m = Chemeleon(cfg, text_backend="hash")
    m.params = model.params
    with pytest.raises(ValueError, match="stride"):
        m.sample_batch([4], ["TiO2"], key=jax.random.PRNGKey(0),
                       return_trajectory=True)


def test_sampler_cost_analysis(model):
    """bench.py's MFU column divides XLA's flop count for the compiled
    whole-sampler program by measured wall time; the hook must return a
    positive flop count and scale with batch size."""
    ca2 = model.sampler_cost_analysis([6] * 2, ["TiO2"] * 2)
    ca4 = model.sampler_cost_analysis([6] * 4, ["TiO2"] * 4)
    assert ca2.get("flops", 0) > 0
    # CFG doubles the decoder batch, so flops must grow ~linearly in B
    assert ca4["flops"] > 1.5 * ca2["flops"]


# ---- CSP (fixed-composition) mode -----------------------------------------

def test_csp_mode_clamps_types(model):
    """fixed_types switches to CSP mode: every sample carries exactly the
    requested atomic numbers (geometry still diffuses)."""
    types = [22, 8, 8, 22, 8, 8]  # 2x TiO2
    crystals = model.sample_batch([6, 6], ["TiO2", "TiO2"],
                                  fixed_types=[types, types],
                                  key=jax.random.PRNGKey(3))
    for c in crystals:
        assert sorted(c.atom_types.tolist()) == sorted(types)
    # geometry differs between the two samples (only types are clamped)
    assert not np.allclose(crystals[0].frac_coords, crystals[1].frac_coords)


def test_sample_csp_exact_composition(model):
    crystals = model.sample_csp("TiO2", n_samples=3, z=2,
                                key=jax.random.PRNGKey(5))
    assert len(crystals) == 3
    for c in crystals:
        assert len(c) == 6
        assert c.reduced_formula() == "O2Ti"


def test_csp_validation_errors(model):
    with pytest.raises(ValueError, match="entries but natoms"):
        model.sample_batch([6], ["TiO2"], fixed_types=[[22, 8, 8]],
                           key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="atomic numbers"):
        model.sample_batch([2], ["X"], fixed_types=[[0, 300]],
                           key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="same number"):
        model.sample_batch([2, 2], ["A", "B"], fixed_types=[[22, 8]],
                           key=jax.random.PRNGKey(0))


def test_csp_trajectory_records_fixed_types(model):
    traj = model.sample_batch([4], ["TiO2"], fixed_types=[[22, 22, 8, 8]],
                              return_trajectory=True,
                              key=jax.random.PRNGKey(9))
    # every recorded step, including the t=T initial state, has the types
    for t in (model.cfg.timesteps, model.cfg.timesteps // 2, 0):
        step = traj[t]
        assert step.atom_types[0, :4].tolist() == [22, 22, 8, 8]


def test_comp_prior_scale_zero_matches_unbiased(model):
    """comp_prior with scale 0.0 adds a zero bias — bitwise-identical
    samples to the no-prior path (same key)."""
    key = jax.random.PRNGKey(11)
    plain = model.sample_batch([6, 6], ["TiO2", "TiO2"], key=key)
    biased = model.sample_batch([6, 6], ["TiO2", "TiO2"], key=key,
                                comp_prior=["TiO2", "TiO2"],
                                comp_prior_scale=0.0)
    for ca, cb in zip(plain, biased):
        np.testing.assert_array_equal(ca.atom_types, cb.atom_types)
        np.testing.assert_allclose(ca.frac_coords, cb.frac_coords)
        np.testing.assert_allclose(ca.lattice, cb.lattice)


def test_comp_prior_strong_restricts_element_set(model):
    """A strong prior confines sampled types to the target element set even
    under random-init params (types still diffuse — counts are free)."""
    crystals = model.sample_batch([6] * 4, ["TiO2"] * 4, key=jax.random.PRNGKey(12),
                                  comp_prior=["TiO2"] * 4,
                                  comp_prior_scale=50.0)
    for c in crystals:
        assert set(c.atom_types.tolist()) <= {8, 22}, c.atom_types


def test_comp_prior_none_rows_stay_unbiased(model):
    """None entries in comp_prior leave those rows unbiased."""
    key = jax.random.PRNGKey(13)
    mixed = model.sample_batch([6, 6], ["TiO2", "NaCl"], key=key,
                               comp_prior=[None, "NaCl"],
                               comp_prior_scale=50.0)
    # row 1 strongly biased -> only Na/Cl; row 0 free (random-init model
    # almost surely produces something outside {Na, Cl} across 6 atoms)
    assert set(mixed[1].atom_types.tolist()) <= {11, 17}


def test_comp_prior_rejected_in_csp_mode(model):
    with pytest.raises(ValueError, match="no effect in CSP mode"):
        model.sample_batch([2], ["TiO2"], fixed_types=[[22, 8]],
                           comp_prior=["TiO2"],
                           key=jax.random.PRNGKey(0))


def test_comp_prior_length_validation(model):
    with pytest.raises(ValueError, match="same number"):
        model.sample_batch([2, 2], ["A", "B"], comp_prior=["TiO2"],
                           key=jax.random.PRNGKey(0))


def test_scan_unroll_identical_numerics(model):
    """sampler_scan_unroll replicates the step body; per-step math and order
    are unchanged, so samples must be bitwise-identical to unroll=1."""
    from chemeleon_tpu.config import get_config
    cfg2 = get_config(None, sampler_scan_unroll=4, **TINY)
    m2 = Chemeleon(cfg2, text_backend="hash")
    m2.params = model.params
    key = jax.random.PRNGKey(21)
    a = model.sample("TiO2", 6, 2, key=key)
    b = m2.sample("TiO2", 6, 2, key=key)
    for ca, cb in zip(a, b):
        np.testing.assert_array_equal(ca.atom_types, cb.atom_types)
        np.testing.assert_allclose(ca.frac_coords, cb.frac_coords)
        np.testing.assert_allclose(ca.lattice, cb.lattice)


def test_stream_matches_batch_with_type_conditioning(model):
    """CSP and comp-prior modes stream identically to the batched path."""
    key = jax.random.PRNGKey(31)
    types = [22, 8, 8, 22, 8, 8]
    b = model.sample_batch([6], ["TiO2"], fixed_types=[types], key=key)
    chunks = list(model.sample_batch_stream([6], ["TiO2"],
                                            fixed_types=[types], key=key,
                                            stream_chunk=5))
    sb, ss = b[0], chunks[-1][0]
    np.testing.assert_array_equal(sb.atom_types, ss.atom_types)
    np.testing.assert_allclose(sb.frac_coords, ss.frac_coords, atol=1e-6)

    b2 = model.sample_batch([6], ["TiO2"], comp_prior=["TiO2"],
                            comp_prior_scale=3.0, key=key)
    chunks2 = list(model.sample_batch_stream([6], ["TiO2"],
                                             comp_prior=["TiO2"],
                                             comp_prior_scale=3.0, key=key,
                                             stream_chunk=5))
    sb2, ss2 = b2[0], chunks2[-1][0]
    np.testing.assert_array_equal(sb2.atom_types, ss2.atom_types)
    np.testing.assert_allclose(sb2.frac_coords, ss2.frac_coords, atol=1e-6)


def test_csp_prior_conflict_raises_everywhere(model):
    """The csp + comp-prior conflict raises one consistent error at every
    entry point instead of silently preferring one mode."""
    from chemeleon_tpu.eval.evaluate import test_evaluate
    from chemeleon_tpu.scripts.navigate_chemical_system import (
        navigate_chemical_system,
    )
    from chemeleon_tpu.scripts.sample_target_composition import (
        sample_target_composition,
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        test_evaluate(model, csp=True, comp_prior_scale=1.0)
    with pytest.raises(ValueError, match="mutually exclusive"):
        sample_target_composition("TiO2", model=model, csp=True,
                                  comp_prior_scale=1.0)
    with pytest.raises(ValueError, match="mutually exclusive"):
        navigate_chemical_system(["Na", "Cl"], model=model, csp=True,
                                 comp_prior_scale=1.0)


def test_warmup_precompiles_grid(model):
    timings = model.warmup(batch_sizes=[2], buckets=[8], stream_chunk=5)
    # one full-scan program + one chunked streaming program
    assert [(t["batch"], t["bucket"]) for t in timings] == [(2, 8), (2, 8)]
    assert {t["stream_chunk"] for t in timings} == {None, 5}
    assert all(t["seconds"] >= 0 for t in timings)
    # warmed shape then samples without error (cache hit not directly
    # observable here, but the program identity is)
    crystals = model.sample_batch([8, 8], ["a", "b"],
                                  key=jax.random.PRNGKey(0))
    assert len(crystals) == 2


def test_fixed_lattice_mode(model):
    """fixed_lattice clamps the cell exactly (canonicalized) while coords
    and types still diffuse; mutually exclusive with lattice_system."""
    from chemeleon_tpu.chem.lattice import canonicalize_lattice

    m = model
    cell = np.array([[4.0, 0.3, 0.1], [0.2, 5.0, 0.0], [0.0, 0.1, 6.0]])
    crystals = m.sample_batch([4, 6], ["a", "b"], fixed_lattice=cell,
                              key=jax.random.PRNGKey(0))
    want = canonicalize_lattice(cell)
    for c in crystals:
        np.testing.assert_allclose(c.lattice, want, atol=1e-5)
        assert np.all(c.frac_coords >= 0) and np.all(c.frac_coords < 1)
    # per-structure list + exclusivity guard
    with pytest.raises(ValueError):
        m.sample_batch([4], ["a"], fixed_lattice=cell,
                       lattice_system="cubic")
    with pytest.raises(ValueError):
        m.sample_batch([4, 4], ["a", "b"], fixed_lattice=[cell])


def test_csp_mixed_rows_clamp_and_diffuse(model):
    """A mixed batch (None entries in fixed_types — what the /generate
    dynamic batcher produces when CSP and free requests share a window,
    serve/server.py): CSP rows carry exactly their clamped types, free
    rows still type-diffuse, and a disjoint comp_prior on a free row is
    allowed and honored."""
    types = [22, 8, 8]
    crystals = model.sample_batch(
        [3, 3, 3], ["TiO2", "NaCl", "NaCl"],
        fixed_types=[types, None, None],
        comp_prior=[None, None, "NaCl"], comp_prior_scale=50.0,
        key=jax.random.PRNGKey(21))
    assert sorted(crystals[0].atom_types.tolist()) == sorted(types)
    # prior-guided free row is steered to the Na/Cl element set
    assert set(crystals[2].atom_types.tolist()) <= {11, 17}
    # all-None fixed_types degenerates to a plain batch (same compiled
    # program as no fixed_types at all)
    a = model.sample_batch([3], ["NaCl"], fixed_types=[None],
                           key=jax.random.PRNGKey(22))
    b = model.sample_batch([3], ["NaCl"], key=jax.random.PRNGKey(22))
    assert a[0].atom_types.tolist() == b[0].atom_types.tolist()
    assert np.allclose(a[0].frac_coords, b[0].frac_coords)


def test_csp_same_row_prior_still_rejected(model):
    with pytest.raises(ValueError, match="no effect in CSP mode"):
        model.sample_batch([2, 2], ["TiO2", "TiO2"],
                           fixed_types=[[22, 8], None],
                           comp_prior=["TiO2", None],
                           key=jax.random.PRNGKey(0))
