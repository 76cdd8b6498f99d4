"""Text→graph retrieval evaluation for Crystal-CLIP checkpoints.

The reference trains Crystal-CLIP (crystal_clip.py:15-191) so that text
embeddings land next to the graph embeddings of matching structures; the
operational test of "does the tower align" is retrieval: embed every held-out
structure with the graph tower, embed each unique prompt with the text tower,
and ask how often the nearest graph actually has that composition. The
reference never ships this as a module (its notebooks do it ad hoc); here it
is a first-class eval so alignment claims are reproducible:

    python -m chemeleon_tpu.eval.retrieval clip_composition_featurized \
        logs/clip_comp/clip_checkpoints/best

Chance top-1 for U unique prompts over G graphs is (graphs with that
composition)/G averaged over prompts — reported alongside the measurement so
"at chance" vs "aligned" is a one-line read.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _l2norm(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def clip_retrieval(clip, params, dataloader, top_ks=(1, 5),
                   ) -> Dict[str, Any]:
    """Text→graph retrieval metrics over ``dataloader``'s batches.

    Each yielded (CrystalBatch, texts) row contributes one graph embedding
    labelled with its own text (the dataset's composition string when
    ``text_targets == ("composition",)``). Texts are deduplicated; a query is
    correct@k when any of its k nearest graphs carries the query's label.
    """
    graph_embeds: List[np.ndarray] = []
    labels: List[str] = []
    for batch, texts in dataloader:
        g = clip.get_graph_embeds(params, batch)
        graph_embeds.append(np.asarray(jax.device_get(g)))
        labels.extend(texts)
    if not labels:
        raise ValueError("dataloader yielded no rows")
    G = _l2norm(np.concatenate(graph_embeds, axis=0))        # [n_graphs, D]

    unique = sorted(set(labels))
    T = _l2norm(np.asarray(jax.device_get(
        clip.get_text_embeds(params, unique))))              # [n_unique, D]

    sims = T @ G.T                                           # [n_unique, n_graphs]
    order = np.argsort(-sims, axis=1)
    labels_arr = np.asarray(labels)

    out: Dict[str, Any] = {
        "n_graphs": int(len(labels)),
        "unique_prompts": int(len(unique)),
    }
    for k in top_ks:
        hits = 0
        for qi, text in enumerate(unique):
            topk = labels_arr[order[qi, :k]]
            hits += int(np.any(topk == text))
        out[f"top{k}"] = round(hits / len(unique), 4)
    # expected top-1 of a random ranking: mean over prompts of
    # (#graphs with that label) / (#graphs)
    counts = {t: 0 for t in unique}
    for t in labels:
        counts[t] += 1
    out["chance_top1"] = round(
        float(np.mean([counts[t] / len(labels) for t in unique])), 4)
    return out


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    import sys

    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.data.datamodule import DataModule
    from chemeleon_tpu.models.clip import CrystalClip
    from chemeleon_tpu.train.clip_trainer import ClipTrainer

    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) < 2:
        raise SystemExit("usage: python -m chemeleon_tpu.eval.retrieval "
                         "<preset> <checkpoint> [split]")
    preset, ckpt = args[0], args[1]
    split = args[2] if len(args) > 2 else "test"

    if preset.endswith(".json"):
        # a training run's own logs/<exp>/config.json — guarantees the param
        # tree matches the checkpoint regardless of preset drift
        from chemeleon_tpu.config import ChemeleonConfig
        cfg = ChemeleonConfig.from_dict(json.load(open(preset)))
    else:
        cfg = get_config(preset)
    trainer = ClipTrainer(cfg)
    params = trainer.clip.init_params(jax.random.PRNGKey(cfg.seed))
    params, _, _ = trainer.load_checkpoint(ckpt, params)
    dm = DataModule(cfg)
    dm.setup("fit" if split in ("train", "val") else "test")
    loader = {"train": dm.train_dataloader, "val": dm.val_dataloader,
              "test": dm.test_dataloader}[split]()
    result = clip_retrieval(trainer.clip, params, loader)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
