"""Composition conditioner tests: featurizer parsing, tower gradients inside
the jitted diffusion loss, and guidance actually steering generation
(VERDICT round 2, item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemeleon_tpu.chem.elements import Z_BY_SYMBOL
from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import Chemeleon
from chemeleon_tpu.text.composition import (
    CRYSTAL_SYSTEMS,
    FEAT_DIM,
    CompositionTower,
    extract_composition,
    featurize_text,
)


# ---------------------------------------------------------------------------
# featurizer
# ---------------------------------------------------------------------------

def test_extract_bare_formula():
    assert extract_composition("TiO2") == {"Ti": 1.0, "O": 2.0}


def test_extract_mp40_composition_column():
    # the dataset's composition column format: "Ca1 O10"
    assert extract_composition("Ca1 O10") == {"Ca": 1.0, "O": 10.0}


def test_extract_assembled_multi_target():
    # data/mp_dataset.py _assemble_text joined form
    comp = extract_composition(
        "composition: Ca1 O10, crystal_system: tetragonal")
    assert comp == {"Ca": 1.0, "O": 10.0}


def test_extract_from_prompt():
    # real mp-40 prompt styles (data/mp-40/test.csv)
    assert extract_composition(
        "Tetragonal crystal structure of CaO10 compound") == \
        {"Ca": 1.0, "O": 10.0}
    assert extract_composition(
        "Unique cubic arrangement of atoms in NaCaH6Ir crystal structure") \
        == {"Na": 1.0, "Ca": 1.0, "H": 6.0, "Ir": 1.0}
    assert extract_composition(
        "Ternary compound Tc3Se4I exhibiting monoclinic symmetry") == \
        {"Tc": 3.0, "Se": 4.0, "I": 1.0}


def test_extract_rejects_english_words():
    # capitalized words that parse as element runs must not count
    assert extract_composition("Interesting structure") is None
    assert extract_composition("No composition here") is None


def test_extract_parenthesized():
    assert extract_composition("Ca(OH)2") == {"Ca": 1.0, "O": 2.0, "H": 2.0}


def test_featurize_fractions_and_flags():
    f = featurize_text("TiO2")
    assert f.shape == (FEAT_DIM,)
    assert f[Z_BY_SYMBOL["Ti"] - 1] == pytest.approx(1 / 3)
    assert f[Z_BY_SYMBOL["O"] - 1] == pytest.approx(2 / 3)
    # fraction block sums to 1 when parsed
    assert f[:103].sum() == pytest.approx(1.0)
    assert f[112] == 1.0  # parsed flag
    assert f[105:112].sum() == 0.0  # no crystal-system word


def test_featurize_crystal_system_one_hot():
    f = featurize_text("composition: Ti1 O2, crystal_system: cubic")
    idx = CRYSTAL_SYSTEMS.index("cubic")
    assert f[105 + idx] == 1.0 and f[105:112].sum() == 1.0


def test_featurize_unparsable_is_zero_composition():
    f = featurize_text("a lovely material please")
    assert f[:105].sum() == 0.0 and f[112] == 0.0


def test_featurize_scale_invariance():
    # fractions ignore the formula-unit multiple; size feature does not
    a, b = featurize_text("TiO2"), featurize_text("Ti2O4")
    np.testing.assert_allclose(a[:103], b[:103], atol=1e-7)
    assert a[103] < b[103]


# ---------------------------------------------------------------------------
# tower + end-to-end
# ---------------------------------------------------------------------------

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, pad_buckets=(8,))


@pytest.fixture(scope="module")
def comp_model():
    cfg = get_config("chemeleon_composition", **TINY, text_embed_dim=32)
    m = Chemeleon(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_tower_distinguishes_compositions():
    tower = CompositionTower(text_embed_dim=32)
    params = tower.init_params(jax.random.PRNGKey(0))
    e = tower.encode(params, ["TiO2", "SiO2", "TiO2"])
    assert e.shape == (3, 32)
    np.testing.assert_allclose(e[0], e[2], atol=1e-6)  # same formula
    assert not np.allclose(e[0], e[1])                 # different formula


def test_tower_gradients_flow_in_loss(comp_model):
    """The composition MLP sits INSIDE the differentiated diffusion loss:
    grads w.r.t. params['text']['tower'] must be nonzero."""
    from chemeleon_tpu.ops.graph import batch_from_arrays

    m = comp_model
    batch = batch_from_arrays(
        [np.array([22, 8, 8]), np.array([14, 8, 8, 8])],
        [np.random.default_rng(0).random((3, 3)).astype(np.float32),
         np.random.default_rng(1).random((4, 3)).astype(np.float32)],
        [np.eye(3, dtype=np.float32) * 4.0,
         np.eye(3, dtype=np.float32) * 5.0], n_max=8)
    raw_text = m.text_encoder.text_inputs(["TiO2", "SiO2"])

    def loss_fn(params):
        loss, _ = m.loss(params, batch, raw_text, jax.random.PRNGKey(3))
        return loss

    grads = jax.grad(loss_fn)(m.params)
    tower_leaves = jax.tree.leaves(grads["text"]["tower"])
    assert tower_leaves, "no tower grads in the tree"
    total = sum(float(jnp.abs(g).sum()) for g in tower_leaves)
    assert total > 0.0, "tower gradients are identically zero"


def test_sampling_with_composition_tower(comp_model):
    crystals = comp_model.sample("TiO2", n_atoms=6, n_samples=2,
                                 key=jax.random.PRNGKey(1))
    assert len(crystals) == 2 and all(len(c) == 6 for c in crystals)


def test_conditioning_changes_samples(comp_model):
    """Different composition prompts with identical noise must produce
    different structures (the conditioning path is live end to end)."""
    a = comp_model.sample("TiO2", 6, 1, key=jax.random.PRNGKey(5))
    b = comp_model.sample("BaTiO3", 6, 1, key=jax.random.PRNGKey(5))
    assert not np.allclose(a[0].frac_coords, b[0].frac_coords)


def test_checkpoint_roundtrip_restores_tower(comp_model, tmp_path):
    """Trainer save -> load_from_checkpoint restores the tower params and
    produces identical embeddings."""
    import json

    import orbax.checkpoint as ocp

    p = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((p / "params").absolute(), comp_model.params)
    with open(p / "meta.json", "w") as f:
        json.dump({"config": comp_model.cfg.to_dict()}, f)
    ckptr.wait_until_finished()

    m2 = Chemeleon.load_from_checkpoint(str(p))
    assert m2.text_encoder.tower is not None
    e1 = comp_model.text_encoder.tower.encode(
        comp_model.params["text"]["tower"], ["TiO2"])
    e2 = m2.text_encoder.tower.encode(m2.params["text"]["tower"], ["TiO2"])
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-7)


def test_prompt_featurization():
    """Free-form mp-40 prompts: embedded formula + system word + BoW
    residual are all captured (prompt-mode conditioning, round 4)."""
    import numpy as np
    from chemeleon_tpu.text.composition import featurize_text

    f = featurize_text("Tetragonal crystal structure of CaO10 compound")
    assert f[112] == 1.0                     # composition parsed
    assert abs(f[19] - 1 / 11) < 1e-6        # Ca (Z=20) fraction
    assert abs(f[7] - 10 / 11) < 1e-6        # O (Z=8) fraction
    assert f[105 + 3] == 1.0                 # tetragonal one-hot
    assert np.count_nonzero(f[113:]) > 0     # BoW residual live
    # same formula in different prose differs only in the BoW block
    g = featurize_text("Tetragonal CaO10 crystal structure showing its "
                       "unique symmetry")
    np.testing.assert_allclose(f[:113], g[:113])
    assert np.any(f[113:] != g[113:])


def test_prompt_bow_distinguishes_free_text():
    from chemeleon_tpu.text.composition import featurize_text
    a = featurize_text("a metallic alloy with high conductivity")
    b = featurize_text("an insulating oxide with wide band gap")
    assert (a != b).any()
