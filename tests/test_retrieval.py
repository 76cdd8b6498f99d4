"""chemeleon_tpu.eval.retrieval — text→graph retrieval metric logic.

The metric is the operational test of Crystal-CLIP alignment (see module
docstring); these tests pin its semantics with a stub whose geometry is known
exactly, then smoke the real CrystalClip path end-to-end.
"""

import jax
import numpy as np
import pytest

from chemeleon_tpu.eval.retrieval import clip_retrieval


class _StubClip:
    """get_graph_embeds returns rows pre-stored per label; get_text_embeds
    maps each unique text through the same lookup (aligned) or a shuffled
    one (misaligned)."""

    def __init__(self, text_table):
        self.text_table = text_table

    def get_graph_embeds(self, params, batch):
        return batch  # "batch" IS the embedding matrix in these tests

    def get_text_embeds(self, params, texts):
        return np.stack([self.text_table[t] for t in texts])


def _one_hot(i, d=8):
    v = np.zeros(d, np.float32)
    v[i] = 1.0
    return v


def test_aligned_embeddings_give_perfect_top1():
    labels = ["TiO2", "NaCl", "Fe2O3", "TiO2"]  # TiO2 appears twice
    embeds = np.stack([_one_hot({"TiO2": 0, "NaCl": 1, "Fe2O3": 2}[t])
                       for t in labels])
    clip = _StubClip({t: _one_hot(i) for i, t in
                      enumerate(["TiO2", "NaCl", "Fe2O3"])})
    out = clip_retrieval(clip, None, [(embeds, labels)])
    assert out["top1"] == 1.0 and out["top5"] == 1.0
    assert out["n_graphs"] == 4 and out["unique_prompts"] == 3
    # chance: mean over prompts of label frequency = (1/4 + 2/4 + 1/4)/3
    assert out["chance_top1"] == pytest.approx((0.25 + 0.5 + 0.25) / 3,
                                               abs=1e-4)


def test_misaligned_embeddings_miss():
    labels = ["A", "B", "C", "D"]
    embeds = np.stack([_one_hot(i) for i in range(4)])
    # text table cyclically shifted: every query's nearest graph is wrong
    clip = _StubClip({t: _one_hot((i + 1) % 4)
                      for i, t in enumerate(labels)})
    out = clip_retrieval(clip, None, [(embeds, labels)])
    assert out["top1"] == 0.0


def test_multiple_batches_concatenate():
    labels1, labels2 = ["A", "B"], ["C"]
    e1 = np.stack([_one_hot(0), _one_hot(1)])
    e2 = _one_hot(2)[None]
    clip = _StubClip({t: _one_hot(i) for i, t in enumerate("ABC")})
    out = clip_retrieval(clip, None, [(e1, labels1), (e2, labels2)])
    assert out["n_graphs"] == 3 and out["top1"] == 1.0


def test_empty_loader_raises():
    with pytest.raises(ValueError, match="no rows"):
        clip_retrieval(_StubClip({}), None, [])


def test_real_clip_smoke():
    """Random-init CrystalClip with the composition tower: metrics come back
    well-formed and bounded; exercises the real embed path end-to-end."""
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.models.clip import CrystalClip
    from chemeleon_tpu.ops.graph import batch_from_arrays

    cfg = get_config("clip_composition_featurized", hidden_dim=32,
                     time_dim=16, text_dim=24, num_layers=2, num_freqs=4,
                     text_embed_dim=32, clip_dim=16)
    clip = CrystalClip(cfg)
    assert clip.backend_kind == "composition"
    params = clip.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    texts = ["TiO2", "NaCl", "Fe2O3", "TiO2"]
    batch = batch_from_arrays(
        [rng.integers(1, 20, 4) for _ in texts],
        [rng.uniform(size=(4, 3)).astype(np.float32) for _ in texts],
        [np.eye(3, dtype=np.float32) * 4] * len(texts), n_max=8)
    out = clip_retrieval(clip, params, [(batch, texts)])
    assert out["unique_prompts"] == 3
    assert 0.0 <= out["top1"] <= 1.0
    assert out["top5"] == 1.0  # only 4 graphs: top-5 always hits
