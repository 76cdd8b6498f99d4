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
from chemeleon_tpu.text.tower import TrainableTextTower


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
                     max_neighbors=c.max_neighbors,
                     image_range=c.knn_image_range, ln=c.ln, ip=c.ip,
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
        from chemeleon_tpu.utils.compilation_cache import (
            enable_persistent_compilation_cache)
        enable_persistent_compilation_cache()
        self.cfg = cfg
        self.graph_tower = GraphTower(cfg)
        self.text_head = TextProjHead(cfg)
        self.backend_kind = "hash"
        self.hf = None
        if cfg.text_encoder == "composition":
            # offline trainable element-fraction tower (text/composition.py)
            from chemeleon_tpu.text.composition import CompositionTower
            self.hf = CompositionTower(cfg.text_embed_dim)
            self.backend_kind = "composition"
        elif text_backend in ("hf", "auto"):
            try:
                self.hf = TrainableTextTower(cfg.text_encoder,
                                             cfg.text_embed_dim,
                                             cfg.max_text_len)
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
    def text_inputs(self, texts: List[str]):
        """Host-side text preprocessing for ``loss``: token arrays
        (input_ids, attention_mask) when the tower is trainable, else the
        frozen backend embeddings. Either way the result is a pytree of
        arrays safe to pass through a jitted step."""
        if self.hf is not None:
            return self.hf.tokenize(texts)
        return jnp.asarray(self.hash_backend(list(texts)))

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
    def loss(self, params, batch: CrystalBatch, text_input) -> jnp.ndarray:
        """Jit-friendly. ``text_input`` is the output of ``text_inputs``:
        (input_ids, attention_mask) tokens when the tower is trainable — the
        tower forward then runs INSIDE this (differentiated) function, so
        ``jax.grad`` reaches ``params["text_tower"]`` (reference
        crystal_clip.py:82-96, 172-177) — or pre-computed [B, D] embeddings
        for the frozen hash backend."""
        if self.hf is not None:
            # text_input is whatever tuple the tower's tokenize produced:
            # (input_ids, attention_mask) for BERT, (features,) for the
            # composition tower
            raw_text = self.hf.apply(params["text_tower"], *text_input)
        else:
            raw_text = text_input
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


# The trainable tower implementation lives in chemeleon_tpu/text/tower.py
# (shared with TextEncoder's trainable_text_encoder path).
