"""Bucketed static-shape batching + host prefetch.

Replaces the reference's PyG DataLoader stack (reference:
chemeleon/datamodule.py:10-94) with a TPU-friendly pipeline:

  * each sample is assigned the smallest padding bucket >= natoms, so a
    training run compiles at most (#buckets x #batch-shapes) programs instead
    of one per dynamic graph size;
  * batches are dense ``CrystalBatch`` pytrees (ops/graph.py);
  * a small background-thread prefetcher overlaps host batch assembly and
    device transfer with TPU compute (the reference ships num_workers=0,
    config.py:24).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from chemeleon_tpu.config import ChemeleonConfig
from chemeleon_tpu.data.mp_dataset import MPDataset
from chemeleon_tpu.ops.graph import CrystalBatch, batch_from_arrays, pick_bucket


def collate(items: List[Dict], n_max: int) -> Tuple[CrystalBatch, List[str]]:
    batch = batch_from_arrays(
        [it["atom_types"] for it in items],
        [it["frac_coords"] for it in items],
        [it["lattice"] for it in items],
        n_max=n_max)
    texts = [it.get("text", "") for it in items]
    return batch, texts


def bucketed_batches(dataset: MPDataset, batch_size: int,
                     buckets: Sequence[int], shuffle: bool,
                     seed: int = 0, drop_last: bool = False
                     ) -> Iterator[Tuple[CrystalBatch, List[str]]]:
    """Yield dense batches grouped by padding bucket."""
    natoms = dataset.natoms()
    by_bucket: Dict[int, List[int]] = {}
    for i, n in enumerate(natoms):
        b = pick_bucket(int(n), buckets)
        by_bucket.setdefault(b, []).append(i)

    rng = np.random.default_rng(seed)
    order = sorted(by_bucket)
    if shuffle:
        rng.shuffle(order)
    plan: List[Tuple[int, List[int]]] = []
    for b in order:
        idxs = by_bucket[b]
        if shuffle:
            idxs = list(rng.permutation(idxs))
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s: s + batch_size]
            if drop_last and len(chunk) < batch_size:
                continue
            plan.append((b, chunk))
    if shuffle:
        rng.shuffle(plan)
    for b, chunk in plan:
        yield collate([dataset[i] for i in chunk], n_max=b)


def prefetch(it: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch. Producer exceptions are re-raised in the
    consumer (a bare sentinel on failure would make a crashed dataloader
    look like a normal, short epoch and training would silently continue
    on truncated data)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        try:
            for x in it:
                q.put(x)
            q.put(sentinel)
        except BaseException as e:  # noqa: BLE001 - transported to consumer
            q.put((sentinel, e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        x = q.get()
        if x is sentinel:
            return
        if isinstance(x, tuple) and len(x) == 2 and x[0] is sentinel:
            raise x[1]
        yield x


class DataModule:
    """Split management mirroring the reference DataModule API
    (datamodule.py:39-94)."""

    def __init__(self, cfg: ChemeleonConfig, max_rows: Optional[int] = None):
        if cfg.dataset_name != "mp-40":
            raise NotImplementedError(
                f"{cfg.dataset_name} should be one of mp-40")
        self.cfg = cfg
        self.max_rows = max_rows
        self.train_dataset: Optional[MPDataset] = None
        self.val_dataset: Optional[MPDataset] = None
        self.test_dataset: Optional[MPDataset] = None

    def _make(self, split: str) -> MPDataset:
        return MPDataset(self.cfg.data_dir, split,
                         text_guide=self.cfg.text_guide,
                         text_targets=self.cfg.text_targets,
                         max_rows=self.max_rows)

    def setup(self, stage: Optional[str] = None) -> None:
        if stage in ("fit", None):
            self.train_dataset = self._make("train")
            self.val_dataset = self._make("val")
        if stage in ("test", None):
            self.test_dataset = self._make("test")

    def train_dataloader(self, epoch: int = 0):
        ds = self.train_dataset
        if self.cfg.aug_supercell:
            from chemeleon_tpu.data.augment import SupercellView
            # deterministic expansion (fixed across epochs: static shapes)
            ds = SupercellView(ds, max_atoms=max(self.cfg.pad_buckets),
                               max_z=self.cfg.aug_supercell_max_z)
        if self.cfg.aug_substitution_prob > 0:
            from chemeleon_tpu.data.augment import AugmentedView
            # reseeded per epoch: every epoch sees a fresh substitution draw
            ds = AugmentedView(ds, self.cfg.aug_substitution_prob,
                               seed=self.cfg.seed + epoch)
        if self.cfg.aug_lattice_noise > 0:
            from chemeleon_tpu.data.augment import LatticeNoiseView
            ds = LatticeNoiseView(ds, self.cfg.aug_lattice_noise,
                                  seed=self.cfg.seed + epoch)
        return prefetch(bucketed_batches(
            ds, self.cfg.batch_size, self.cfg.pad_buckets,
            shuffle=True, seed=self.cfg.seed + epoch, drop_last=True))

    def val_dataloader(self):
        return prefetch(bucketed_batches(
            self.val_dataset, self.cfg.batch_size, self.cfg.pad_buckets,
            shuffle=False))

    def test_dataloader(self):
        return prefetch(bucketed_batches(
            self.test_dataset, self.cfg.batch_size, self.cfg.pad_buckets,
            shuffle=False))
