"""Text backend driven by a reference Crystal-CLIP Lightning checkpoint.

The reference's ``chemeleon/clip-*`` text encoders load a CrystalClip
checkpoint (wandb artifact or figshare file) and use its trained BERT tower +
text projection (reference text_encoder.py:67-82, :180-182). This backend
reconstructs that tower directly from the checkpoint's state_dict and runs it
with torch on the host — the tower is frozen at sampling time, so it is host
preprocessing (like tokenization), not TPU compute-path code.

Tokenizer: the HF tokenizer of the underlying base model when locally cached;
otherwise a WordPiece-style hashing fallback (clearly lower fidelity —
loaded checkpoints should ship the tokenizer cache for exact parity).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np


def _bert_config_from_state_dict(sd, prefix: str,
                                 num_attention_heads: Optional[int] = None):
    """Reconstruct a BertConfig from tensor shapes.

    The head count is not recoverable from shapes; all supported BERT
    variants follow the head_dim=64 convention (hidden // 64 heads) — pass
    ``num_attention_heads`` explicitly for nonstandard towers."""
    from transformers import BertConfig
    vocab, hidden = sd[f"{prefix}embeddings.word_embeddings.weight"].shape
    max_pos = sd[f"{prefix}embeddings.position_embeddings.weight"].shape[0]
    type_vocab = sd[f"{prefix}embeddings.token_type_embeddings.weight"].shape[0]
    n_layers = 0
    while f"{prefix}encoder.layer.{n_layers}.attention.self.query.weight" in sd:
        n_layers += 1
    inter = sd[f"{prefix}encoder.layer.0.intermediate.dense.weight"].shape[0]
    heads = num_attention_heads or max(1, hidden // 64)
    return BertConfig(vocab_size=vocab, hidden_size=hidden,
                      num_hidden_layers=n_layers, num_attention_heads=heads,
                      intermediate_size=inter,
                      max_position_embeddings=max_pos,
                      type_vocab_size=type_vocab)


class ClipCheckpointBackend:
    """Encodes text with the BERT tower + text_proj of a CrystalClip
    checkpoint. Output dim = clip_dim (feeds the diffusion model's text_emb
    MLP, whose text_embed_dim must equal clip_dim)."""

    def __init__(self, ckpt_path: str | Path, max_text_len: int = 256,
                 base_tokenizer: Optional[str] = None,
                 num_attention_heads: Optional[int] = None):
        import torch
        from transformers import BertModel

        blob = torch.load(str(ckpt_path), map_location="cpu",
                          weights_only=False)
        sd = blob["state_dict"]
        hparams = dict(blob.get("hyper_parameters", {}))
        self.max_text_len = max_text_len

        cfg = _bert_config_from_state_dict(sd, "text_encoder.",
                                           num_attention_heads)
        self.bert = BertModel(cfg)
        bert_sd = {k[len("text_encoder."):]: v for k, v in sd.items()
                   if k.startswith("text_encoder.")}
        missing, unexpected = self.bert.load_state_dict(bert_sd, strict=False)
        # strict=False tolerates transformers-version extras (e.g. the
        # position_ids buffer), but genuinely MISSING weights would leave
        # tower layers at random init and silently condition sampling on
        # noise — fail fast instead
        real_missing = [k for k in missing if not k.endswith("position_ids")]
        if real_missing:
            raise ValueError(
                f"CLIP checkpoint is missing {len(real_missing)} BERT "
                f"weights (first: {sorted(real_missing)[:5]}); the tower "
                "would be partially random-initialized")
        self.bert.eval()

        # text projection head (crystal_clip.py:62-67)
        import torch.nn as nn
        clip_dim = sd["text_proj.3.weight"].shape[0]
        hidden = cfg.hidden_size
        self.text_proj = nn.Sequential(
            nn.Linear(hidden, hidden), nn.LayerNorm(hidden), nn.GELU(),
            nn.Linear(hidden, clip_dim))
        proj_sd = {k[len("text_proj."):]: v for k, v in sd.items()
                   if k.startswith("text_proj.")}
        self.text_proj.load_state_dict(proj_sd)
        self.text_proj.eval()
        self.clip_dim = clip_dim
        self.text_embed_dim = clip_dim

        tok_name = base_tokenizer or hparams.get(
            "text_encoder", "lfoppiano/MatTPUSciBERT")
        self.tokenizer = None
        try:
            from transformers import AutoTokenizer
            self.tokenizer = AutoTokenizer.from_pretrained(
                tok_name, local_files_only=True)
        except Exception:
            from chemeleon_tpu.text.tower import WordHashTokenizer
            self.tokenizer = WordHashTokenizer(cfg.vocab_size, max_text_len)

    def __call__(self, texts: List[str]) -> np.ndarray:
        import torch
        tok = self.tokenizer(list(texts), padding="longest", truncation=True,
                             max_length=self.max_text_len,
                             return_tensors="np")
        with torch.no_grad():
            out = self.bert(
                input_ids=torch.tensor(np.asarray(tok["input_ids"]),
                                       dtype=torch.long),
                attention_mask=torch.tensor(np.asarray(tok["attention_mask"]),
                                            dtype=torch.long))
            cls = out.last_hidden_state[:, 0, :]
            emb = self.text_proj(cls)
        return emb.numpy().astype(np.float32)


class OrbaxClipBackend:
    """Frozen text encoder from one of THIS framework's trained Crystal-CLIP
    orbax checkpoints (``logs/<exp>/clip_checkpoints/best``; meta.json
    carries the full config, so the backend is self-describing). Encodes
    text with the checkpoint's own tower + text projection — the TPU-native
    analog of the reference's ``chemeleon/clip-*`` wandb-artifact encoders
    (text_encoder.py:67-82). Output dim = clip_dim: the diffusion model's
    text_embed_dim must match (same constraint as the reference)."""

    def __init__(self, ckpt_dir):
        import json

        import jax
        import orbax.checkpoint as ocp

        from chemeleon_tpu.config import ChemeleonConfig
        from chemeleon_tpu.models.clip import CrystalClip

        p = Path(ckpt_dir)
        with open(p / "meta.json") as f:
            meta = json.load(f)
        cfg = ChemeleonConfig.from_dict(meta["config"])
        self.clip = CrystalClip(cfg)
        like = self.clip.init_params(jax.random.PRNGKey(0))
        self.params = ocp.StandardCheckpointer().restore(
            p.absolute() / "params", like)
        self.clip_dim = cfg.clip_dim
        self.text_embed_dim = cfg.clip_dim

    def __call__(self, texts: List[str]) -> np.ndarray:
        emb = self.clip.get_text_embeds(self.params, list(texts))
        return np.asarray(emb, dtype=np.float32)
