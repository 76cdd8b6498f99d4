"""Trainable text tower: host-side tokenization + jit-side Flax forward.

This is the piece that makes ``trainable_text_encoder`` real (reference:
chemeleon/text_encoder/text_encoder.py:36-46 unfreezes the BERT tower;
crystal_clip.py:82-96 trains it with a dedicated 1e-5 LR group). The split is
TPU-native:

  * ``tokenize(texts)`` runs on host (strings are not jit-able) and pads the
    token grid to a multiple of 16 so the number of distinct compiled shapes
    stays bounded (one per length bucket, not one per batch);
  * ``apply(tower_params, input_ids, attention_mask)`` is a pure function of
    its params — it traces under ``jax.jit``/``jax.grad``, so the tower sits
    INSIDE the differentiated loss and gradients reach ``params["text_tower"]``.

Weights load from the local HF cache when present; in zero-egress
environments a compact random-init BERT stands in so the full trainable path
is still exercised end to end.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PAD_MULTIPLE = 16


class TrainableTextTower:
    """Flax BERT tower whose forward lives inside the compiled loss."""

    def __init__(self, model_name: str, text_embed_dim: int,
                 max_text_len: int):
        from transformers import AutoTokenizer, BertConfig, FlaxBertModel
        self.model_name = model_name
        self.max_text_len = max_text_len
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(
                model_name, local_files_only=True)
            self.model = FlaxBertModel.from_pretrained(
                model_name, local_files_only=True)
            self.random_init = False
        except Exception:
            # zero-egress fallback: compact random-init BERT + hashing
            # tokenizer, same code path end to end
            bc = BertConfig(vocab_size=30522, hidden_size=text_embed_dim,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=2 * text_embed_dim,
                            max_position_embeddings=max_text_len)
            self.model = FlaxBertModel(bc)
            self.tokenizer = WordHashTokenizer(bc.vocab_size, max_text_len)
            self.random_init = True

    # -- host side -----------------------------------------------------------
    def tokenize(self, texts: List[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(input_ids, attention_mask), width padded to a multiple of 16."""
        tok = self.tokenizer(list(texts), padding="longest", truncation=True,
                             max_length=self.max_text_len,
                             return_tensors="np")
        ids = np.asarray(tok["input_ids"], np.int32)
        mask = np.asarray(tok["attention_mask"], np.int32)
        L = ids.shape[1]
        Lp = min(self.max_text_len,
                 -(-L // _PAD_MULTIPLE) * _PAD_MULTIPLE)
        if Lp > L:
            pad = ((0, 0), (0, Lp - L))
            ids = np.pad(ids, pad)
            mask = np.pad(mask, pad)
        return jnp.asarray(ids), jnp.asarray(mask)

    # -- jit side --------------------------------------------------------------
    def apply(self, tower_params, input_ids: jnp.ndarray,
              attention_mask: jnp.ndarray) -> jnp.ndarray:
        """CLS-token embedding [B, hidden]; pure in ``tower_params``."""
        out = self.model(input_ids=input_ids, attention_mask=attention_mask,
                         params=tower_params)
        return out.last_hidden_state[:, 0, :]

    def init_params(self, key: Optional[jax.Array] = None):
        return self.model.params

    # Convenience for host-side (non-differentiated) encoding.
    def encode(self, tower_params, texts: List[str]) -> jnp.ndarray:
        ids, mask = self.tokenize(texts)
        return self.apply(tower_params, ids, mask)


class WordHashTokenizer:
    """Deterministic hashing tokenizer (offline stand-in for a real vocab)."""

    def __init__(self, vocab_size: int, max_len: int):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def __call__(self, texts: List[str], padding=None, truncation=True,
                 max_length: Optional[int] = None, return_tensors="np"):
        max_length = max_length or self.max_len
        if self.vocab_size > 3000:  # BERT-like vocab: keep special-id range
            cls_id, sep_id, lo = 101, 102, 2000
        else:  # tiny vocab (tests / compact models)
            cls_id, sep_id, lo = 1, 2, 3
        span = max(1, self.vocab_size - lo)
        seqs = []
        for t in texts:
            words = t.split()[: max_length - 2]
            ids = [cls_id] + [
                lo + int.from_bytes(
                    hashlib.sha1(w.encode()).digest()[:3], "little") % span
                for w in words] + [sep_id]
            seqs.append(ids)
        L = max(len(s) for s in seqs)
        input_ids = np.zeros((len(seqs), L), np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            input_ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}
