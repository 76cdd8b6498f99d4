"""HFTextBackend pooling-branch coverage (reference text_encoder.py:129-177).

The zero-egress image has no pretrained LMs, so each branch is exercised
with a tiny random-init model + WordLevel tokenizer written to tmp and
loaded with ``local_files_only=True`` — the same code path a cached real
model takes (VERDICT round 2, item 5).
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from chemeleon_tpu.text.encoder import HFTextBackend  # noqa: E402

TEXTS = ["a crystal structure of tio2", "sio2"]


def _save_tokenizer(path, with_pad=True):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = ["a", "crystal", "structure", "of", "tio2", "sio2"]
    vocab = {"<pad>": 0, "<unk>": 1, "</s>": 2,
             **{w: i + 3 for i, w in enumerate(words)}}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    kw = dict(unk_token="<unk>", eos_token="</s>")
    if with_pad:
        kw["pad_token"] = "<pad>"
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, **kw)
    fast.save_pretrained(str(path))


def test_t5_mean_pool_branch(tmp_path):
    from transformers import FlaxT5EncoderModel, T5Config

    d = tmp_path / "tiny-t5"
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4)
    FlaxT5EncoderModel(cfg).save_pretrained(str(d))
    _save_tokenizer(d)

    be = HFTextBackend(str(d), max_text_len=16)
    assert be.pooling == "mean"
    emb = be(TEXTS)
    assert emb.shape == (2, 32) and emb.dtype == np.float32
    assert np.isfinite(emb).all()
    # pooling is content-sensitive: distinct prompts -> distinct embeddings
    assert not np.allclose(emb[0], emb[1])


def test_causal_lm_mean_hidden_branch(tmp_path):
    from transformers import FlaxGPT2LMHeadModel, GPT2Config

    d = tmp_path / "tiny-causal"
    cfg = GPT2Config(vocab_size=64, n_positions=64, n_embd=32,
                     n_layer=2, n_head=4)
    FlaxGPT2LMHeadModel(cfg).save_pretrained(str(d))
    # no pad token: exercises the pad_token = eos_token fallback
    # (text_encoder.py:152-171 semantics)
    _save_tokenizer(d, with_pad=False)

    be = HFTextBackend(str(d), max_text_len=16)
    assert be.pooling == "mean_hidden"
    assert be.tokenizer.pad_token is not None
    emb = be(TEXTS)
    assert emb.shape == (2, 32) and np.isfinite(emb).all()
    assert not np.allclose(emb[0], emb[1])


def test_bert_cls_branch(tmp_path):
    from transformers import BertConfig, FlaxBertModel

    d = tmp_path / "tiny-bert"
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    FlaxBertModel(cfg).save_pretrained(str(d))
    _save_tokenizer(d)

    be = HFTextBackend(str(d), max_text_len=16)
    assert be.pooling == "cls"
    emb = be(TEXTS)
    assert emb.shape == (2, 32) and np.isfinite(emb).all()


def test_determinism_per_backend(tmp_path):
    from transformers import BertConfig, FlaxBertModel

    d = tmp_path / "tiny-bert"
    FlaxBertModel(BertConfig(vocab_size=64, hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=4,
                             intermediate_size=64,
                             max_position_embeddings=64)).save_pretrained(
        str(d))
    _save_tokenizer(d)
    be = HFTextBackend(str(d), max_text_len=16)
    np.testing.assert_array_equal(be(TEXTS), be(TEXTS))


def test_orbax_clip_backend(tmp_path):
    """A trained (here: random-init) Crystal-CLIP orbax checkpoint serves as
    a frozen text conditioner via text_encoder_name="clip-orbax:<dir>" — the
    TPU-native analog of the reference's chemeleon/clip-* artifact encoders."""
    import jax

    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.clip_trainer import ClipTrainer
    from chemeleon_tpu.text.encoder import TextEncoder

    cfg = get_config("clip_composition_featurized", hidden_dim=32,
                     time_dim=16, text_dim=24, num_layers=2, num_freqs=4,
                     text_embed_dim=32, clip_dim=16,
                     log_dir=str(tmp_path))
    trainer = ClipTrainer(cfg)
    params = trainer.clip.init_params(jax.random.PRNGKey(0))
    trainer.save_checkpoint("best", params, None, 0, 0, 1.0)
    ckpt = trainer.ckpt_dir / "best"

    te = TextEncoder(text_encoder_name=f"clip-orbax:{ckpt}",
                     text_embed_dim=cfg.clip_dim, text_dim=24)
    emb = np.asarray(te.backend(["TiO2", "Fe2O3"]))
    assert emb.shape == (2, cfg.clip_dim)
    assert not np.allclose(emb[0], emb[1])  # composition-featurized: distinct
    # deterministic (frozen)
    again = np.asarray(te.backend(["TiO2", "Fe2O3"]))
    np.testing.assert_allclose(emb, again)
