"""Checkpoint conversion roundtrip: flax params -> reference-style Lightning
state_dict -> converter -> identical flax params and identical model outputs."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import Chemeleon
from chemeleon_tpu.utils.convert import (
    convert_chemeleon_checkpoint,
    convert_decoder_state_dict,
    convert_text_conditioner_state_dict,
    decoder_params_to_state_dict,
)

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, text_embed_dim=32, pad_buckets=(8,))


def _text_params_to_state_dict(text_params):
    p = text_params["params"]
    sd = {}
    sd["text_encoder.null_text_embeds"] = torch.tensor(
        np.asarray(p["null_text_embeds"]))
    emb = p["text_emb"]
    sd["text_encoder.text_emb.0.weight"] = torch.tensor(
        np.asarray(emb["lin1"]["kernel"]).T)
    sd["text_encoder.text_emb.0.bias"] = torch.tensor(
        np.asarray(emb["lin1"]["bias"]))
    sd["text_encoder.text_emb.1.weight"] = torch.tensor(
        np.asarray(emb["norm"]["scale"]))
    sd["text_encoder.text_emb.1.bias"] = torch.tensor(
        np.asarray(emb["norm"]["bias"]))
    sd["text_encoder.text_emb.3.weight"] = torch.tensor(
        np.asarray(emb["lin2"]["kernel"]).T)
    sd["text_encoder.text_emb.3.bias"] = torch.tensor(
        np.asarray(emb["lin2"]["bias"]))
    return sd


def test_roundtrip_through_lightning_ckpt(tmp_path):
    cfg = get_config(None, **TINY)
    model = Chemeleon(cfg, text_backend="hash")
    params = model.init_params(jax.random.PRNGKey(0))

    # export to a reference-style Lightning checkpoint
    sd = {k: torch.tensor(v) for k, v in decoder_params_to_state_dict(
        params["decoder"], ln=cfg.ln, smooth=cfg.smooth).items()}
    sd.update(_text_params_to_state_dict(params["text"]))
    # schedule buffers (bit-parity path)
    sd["sigma_scheduler.sigmas"] = torch.tensor(
        np.asarray(model.sched.sigma.sigmas))
    sd["sigma_scheduler.sigmas_norm"] = torch.tensor(
        np.asarray(model.sched.sigma.sigmas_norm))
    ckpt = {"state_dict": sd, "hyper_parameters": cfg.to_dict()}
    path = tmp_path / "fake.ckpt"
    torch.save(ckpt, path)

    cfg2, params2, buffers, _ = convert_chemeleon_checkpoint(path)
    assert cfg2.hidden_dim == cfg.hidden_dim
    assert cfg2.num_layers == cfg.num_layers

    # tree equality
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    got_dec = {"decoder": params2["decoder"], "text": params2["text"]}
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(got_dec)[0]}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        assert ks in flat2, ks
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat2[ks]),
                                   atol=1e-6, err_msg=ks)

    # converted params drive the model identically
    model2 = Chemeleon(cfg2, text_backend="hash")
    model2.params = jax.tree.map(jnp.asarray, params2)
    model.params = params
    a = model.sample("TiO2", 4, 2, key=jax.random.PRNGKey(1))
    b = model2.sample("TiO2", 4, 2, key=jax.random.PRNGKey(1))
    for ca, cb in zip(a, b):
        np.testing.assert_array_equal(ca.atom_types, cb.atom_types)
        np.testing.assert_allclose(ca.frac_coords, cb.frac_coords, atol=1e-6)
    assert "sigma_scheduler.sigmas_norm" in buffers


def _fake_clip_ckpt(tmp_path, hidden=128, clip_dim=24, vocab=200):
    """Synthetic CrystalClip Lightning checkpoint with a real torch BERT."""
    from transformers import BertConfig, BertModel
    import torch.nn as nn
    # head_dim=64 convention so the backend's shape-based config
    # reconstruction is exact
    cfg = BertConfig(vocab_size=vocab, hidden_size=hidden,
                     num_hidden_layers=2, num_attention_heads=hidden // 64,
                     intermediate_size=2 * hidden,
                     max_position_embeddings=64)
    bert = BertModel(cfg)
    proj = nn.Sequential(nn.Linear(hidden, hidden), nn.LayerNorm(hidden),
                         nn.GELU(), nn.Linear(hidden, clip_dim))
    sd = {}
    for k, v in bert.state_dict().items():
        sd[f"text_encoder.{k}"] = v
    for k, v in proj.state_dict().items():
        sd[f"text_proj.{k}"] = v
    path = tmp_path / "clip.ckpt"
    torch.save({"state_dict": sd,
                "hyper_parameters": {"text_encoder": "nonexistent/model"}},
               path)
    return path, bert, proj


def test_clip_checkpoint_backend(tmp_path):
    from chemeleon_tpu.text.clip_backend import ClipCheckpointBackend
    path, bert, proj = _fake_clip_ckpt(tmp_path)
    bert.eval()  # disable dropout for the oracle comparison
    proj.eval()
    backend = ClipCheckpointBackend(path, max_text_len=32)
    emb = backend(["TiO2 crystal", "LiMnO4 orthorhombic"])
    assert emb.shape == (2, 24)
    assert np.isfinite(emb).all()
    # the tower weights were actually loaded: compare against direct torch
    tok = backend.tokenizer(["TiO2 crystal"], padding="longest",
                            truncation=True, max_length=32,
                            return_tensors="np")
    with torch.no_grad():
        out = bert(input_ids=torch.tensor(tok["input_ids"], dtype=torch.long),
                   attention_mask=torch.tensor(tok["attention_mask"],
                                               dtype=torch.long))
        want = proj(out.last_hidden_state[:, 0, :]).numpy()
    np.testing.assert_allclose(emb[:1], want, atol=1e-5)


def test_load_pretrained_end_to_end(tmp_path):
    """Full pretrained-loading path with synthetic reference checkpoints:
    diffusion ckpt + CLIP ckpt -> sampling model with trained text tower."""
    from chemeleon_tpu.utils.checkpoints import load_pretrained

    # CLIP ckpt with clip_dim == text_embed_dim of the diffusion config
    clip_path, _, _ = _fake_clip_ckpt(tmp_path, hidden=128, clip_dim=32)

    cfg = get_config(None, **TINY)  # text_embed_dim=32
    model = Chemeleon(cfg, text_backend="hash")
    params = model.init_params(jax.random.PRNGKey(0))
    sd = {k: torch.tensor(v) for k, v in decoder_params_to_state_dict(
        params["decoder"], ln=cfg.ln, smooth=cfg.smooth).items()}
    sd.update(_text_params_to_state_dict(params["text"]))
    sd["sigma_scheduler.sigmas"] = torch.tensor(
        np.asarray(model.sched.sigma.sigmas))
    sd["sigma_scheduler.sigmas_norm"] = torch.tensor(
        np.asarray(model.sched.sigma.sigmas_norm))
    dft = tmp_path / "chemeleon.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": cfg.to_dict()}, dft)

    model2 = load_pretrained("general_text", path_ckpt=str(dft),
                             path_ckpt_clip=str(clip_path))
    crystals = model2.sample("TiO2 crystal", 4, 2, key=jax.random.PRNGKey(1))
    assert len(crystals) == 2 and len(crystals[0]) == 4

    # first load wrote the torch-free conversion cache; a second load hits
    # it and produces identical params
    cache = dft.parent / (dft.name + ".converted.npz")
    assert cache.exists()
    model3 = load_pretrained("general_text", path_ckpt=str(dft),
                             path_ckpt_clip=str(clip_path))
    for a, b in zip(jax.tree.leaves(model2.params),
                    jax.tree.leaves(model3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mismatched checkpoint pair fails loudly with a clear message
    (tmp_path / "bad").mkdir()
    bad_clip, _, _ = _fake_clip_ckpt(tmp_path / "bad", hidden=128,
                                     clip_dim=64)
    with pytest.raises(ValueError, match="clip_dim"):
        load_pretrained("general_text", path_ckpt=str(dft),
                        path_ckpt_clip=str(bad_clip))
