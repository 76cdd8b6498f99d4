"""Crystal CLIP — contrastive text/graph pretraining.

Rebuild of the reference CrystalClip (reference:
chemeleon/text_encoder/crystal_clip.py:15-191): a text tower (BERT CLS ->
projection) and a graph tower (CSPNet with time_dim = text_dim = 0 -> pooled
node features -> projection), trained with a soft-target symmetric
contrastive loss over the GLOBAL batch.

TPU-native distribution: the reference gathers embeddings across ranks with
``self.all_gather(sync_grads=True)`` (crystal_clip.py:125-130). Here the loss
is written on the global batch; under pjit with the batch sharded on the data
axis, GSPMD inserts the differentiable all-gather for the similarity matrix
automatically — the collective rides ICI with gradient flow by construction.

Text tower backends:
  * "hf": a trainable FlaxBertModel (from local HF cache, or random-init from
    a config when no weights are available — zero-egress environment);
  * "hash": frozen deterministic embeddings (offline fallback; only the
    projection heads train).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from chemeleon_tpu.config import ChemeleonConfig
from chemeleon_tpu.models.cspnet import CSPNet
from chemeleon_tpu.ops.graph import CrystalBatch, masked_mean_nodes, masked_sum_nodes
from chemeleon_tpu.text.encoder import HashTextBackend, ProjectionMLP


class GraphTower(nn.Module):
    """CSPNet (unconditioned) + pooling + projection
    (crystal_clip.py:35-73, :98-112)."""
    cfg: ChemeleonConfig

    @nn.compact
    def __call__(self, batch: CrystalBatch) -> jnp.ndarray:
        c = self.cfg
        net = CSPNet(hidden_dim=c.hidden_dim, time_dim=0, text_dim=0,
                     num_layers=c.num_layers, max_atoms=c.max_atoms,
                     act_fn=c.act_fn, dis_emb=c.dis_emb, num_freqs=c.num_freqs,
                     edge_style=c.edge_style, cutoff=c.cutoff,
                     max_neighbors=c.max_neighbors, ln=c.ln, ip=c.ip,
                     smooth=c.smooth, pred_atom_types=c.pred_atom_types,
                     name="graph_encoder")
        out = net(batch.atom_types, batch.frac_coords, batch.lattices,
                  batch.node_mask, None, None)
        mask = batch.node_mask
        if c.graph_pooling == "mean":
            pooled = masked_mean_nodes(out.node_features, mask)
        elif c.graph_pooling == "sum":
            pooled = masked_sum_nodes(out.node_features, mask)
        else:
            raise ValueError(f"unknown graph_pooling {c.graph_pooling}")
        return ProjectionMLP(c.hidden_dim, c.clip_dim, name="graph_proj")(pooled)


class TextProjHead(nn.Module):
    """text_proj applied to raw tower embeddings (crystal_clip.py:62-67)."""
    cfg: ChemeleonConfig

    @nn.compact
    def __call__(self, raw: jnp.ndarray) -> jnp.ndarray:
        return ProjectionMLP(self.cfg.text_embed_dim, self.cfg.clip_dim,
                             name="text_proj")(raw)


def _smooth_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               smoothing: float) -> jnp.ndarray:
    """Cross entropy with label smoothing (torch semantics), per-row."""
    n = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n)
    target = onehot * (1.0 - smoothing) + smoothing / n
    return -(target * jax.nn.log_softmax(logits, axis=-1)).sum(-1)


def contrastive_loss(text_embeds: jnp.ndarray, graph_embeds: jnp.ndarray,
                     label_smoothing: float) -> jnp.ndarray:
    """Soft-target symmetric contrastive loss on the global batch
    (crystal_clip.py:121-152)."""
    graph_sim = graph_embeds @ graph_embeds.T
    text_sim = text_embeds @ text_embeds.T
    targets = jax.nn.softmax((graph_sim + text_sim) / 2.0, axis=-1)
    logits = text_embeds @ graph_embeds.T
    graph_loss = _smooth_ce(logits.T, targets.argmax(-1), label_smoothing)
    text_loss = _smooth_ce(logits, targets.argmax(0), label_smoothing)
    return ((graph_loss + text_loss) / 2.0).mean()


class CrystalClip:
    """Facade with the reference API (get_text_embeds / get_graph_embeds /
    compute_contrastive_loss)."""

    def __init__(self, cfg: ChemeleonConfig, text_backend: str = "auto"):
        self.cfg = cfg
        self.graph_tower = GraphTower(cfg)
        self.text_head = TextProjHead(cfg)
        self.backend_kind = "hash"
        self.hf = None
        if text_backend in ("hf", "auto"):
            try:
                self.hf = _HFTrainableTower(cfg)
                self.backend_kind = "hf"
            except Exception:
                if text_backend == "hf":
                    raise
        if self.hf is None:
            self.hash_backend = HashTextBackend(cfg.text_embed_dim)

    # -- params ---------------------------------------------------------------
    def init_params(self, key: jax.Array, n_max: int = 8) -> Dict[str, Any]:
        kg, kt, kh = jax.random.split(key, 3)
        B = 2
        dummy = CrystalBatch(
            atom_types=jnp.zeros((B, n_max), jnp.int32),
            frac_coords=jnp.zeros((B, n_max, 3)),
            lattices=jnp.eye(3)[None].repeat(B, 0),
            natoms=jnp.full((B,), n_max, jnp.int32))
        params = {
            "graph": self.graph_tower.init(kg, dummy),
            "text_proj": self.text_head.init(
                kt, jnp.zeros((B, self.cfg.text_embed_dim))),
        }
        if self.hf is not None:
            params["text_tower"] = self.hf.init_params(kh)
        return params

    # -- towers -----------------------------------------------------------------
    def encode_text_raw(self, params, texts: List[str]) -> jnp.ndarray:
        """Tower output before the CLIP projection: [B, text_embed_dim]."""
        if self.hf is not None:
            return self.hf.encode(params.get("text_tower"), texts)
        return jnp.asarray(self.hash_backend(list(texts)))

    def get_text_embeds(self, params, texts: List[str]) -> jnp.ndarray:
        raw = self.encode_text_raw(params, texts)
        return self.text_head.apply(params["text_proj"], raw)

    def get_graph_embeds(self, params, batch: CrystalBatch) -> jnp.ndarray:
        return self.graph_tower.apply(params["graph"], batch)

    # -- loss --------------------------------------------------------------------
    def loss(self, params, batch: CrystalBatch,
             raw_text: jnp.ndarray) -> jnp.ndarray:
        """Jit-friendly: ``raw_text`` is the host-encoded tower output (hash
        backend) or recomputed inside when the tower is trainable."""
        text = self.text_head.apply(params["text_proj"], raw_text)
        graph = self.get_graph_embeds(params, batch)
        return contrastive_loss(text, graph, self.cfg.label_smoothing)

    def compute_contrastive_loss(self, text_embeds, graph_embeds):
        return contrastive_loss(text_embeds, graph_embeds,
                                self.cfg.label_smoothing)

    # -- for TextEncoder attachment (text_encoder.py:48-51, :180-182) -----------
    def make_text_proj_apply(self, params):
        def apply(raw):
            return self.text_head.apply(params["text_proj"], raw)
        return apply


class _HFTrainableTower:
    """Trainable Flax BERT tower. Loads local weights when present; otherwise
    random-inits a small BERT config (zero-egress environments)."""

    def __init__(self, cfg: ChemeleonConfig):
        from transformers import AutoTokenizer, FlaxBertModel, BertConfig
        self.cfg = cfg
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(
                cfg.text_encoder, local_files_only=True)
            self.model = FlaxBertModel.from_pretrained(
                cfg.text_encoder, local_files_only=True)
            self._random = False
        except Exception:
            # no local weights: random-init a compact BERT so the full
            # trainable-tower path still exercises end-to-end
            bc = BertConfig(vocab_size=30522, hidden_size=cfg.text_embed_dim,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=2 * cfg.text_embed_dim,
                            max_position_embeddings=cfg.max_text_len)
            self.model = FlaxBertModel(bc)
            self.tokenizer = _WordHashTokenizer(bc.vocab_size,
                                                cfg.max_text_len)
            self._random = True

    def init_params(self, key: jax.Array):
        return self.model.params

    def encode(self, tower_params, texts: List[str]) -> jnp.ndarray:
        tok = self.tokenizer(list(texts), padding="longest", truncation=True,
                             max_length=self.cfg.max_text_len,
                             return_tensors="np")
        out = self.model(input_ids=tok["input_ids"],
                         attention_mask=tok["attention_mask"],
                         params=tower_params)
        return out.last_hidden_state[:, 0, :]  # CLS token


class _WordHashTokenizer:
    """Deterministic hashing tokenizer (offline stand-in for a real vocab)."""

    def __init__(self, vocab_size: int, max_len: int):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def __call__(self, texts: List[str], padding=None, truncation=True,
                 max_length: Optional[int] = None, return_tensors="np"):
        import hashlib
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
