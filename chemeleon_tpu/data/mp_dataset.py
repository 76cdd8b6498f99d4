"""MP-40 dataset: CSV -> preprocessed dense arrays with an on-disk cache.

Rebuild of the reference MPDataset (reference: chemeleon/datasets/mp_dataset.py:18-66),
which re-parses every CIF with pymatgen on every epoch inside the dataloader.
TPU-first fix: a one-time offline preprocessing pass (CIF parse -> Niggli
reduction -> canonical ``from_parameters`` lattice -> arrays) cached to an
``.npz`` next to the CSV; epochs then stream pure numpy.

Text assembly matches the reference exactly (mp_dataset.py:53-64): a single
text_target yields the raw column value; multiple targets yield
``"col: val, col: val"``.
"""

from __future__ import annotations

import csv
import hashlib
import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from chemeleon_tpu.chem.cif import parse_cif
from chemeleon_tpu.chem.lattice import canonicalize_lattice, niggli_reduce
from chemeleon_tpu.chem.structure import Crystal


def preprocess_structure(crystal: Crystal) -> Crystal:
    """Niggli-reduce then canonicalize the lattice frame
    (reference mp_dataset.py:44-50)."""
    try:
        red_lat = niggli_reduce(crystal.lattice)
    except ValueError:
        red_lat = crystal.lattice
    # re-express coords in the reduced basis
    f = crystal.frac_coords @ crystal.lattice @ np.linalg.inv(red_lat)
    canon = canonicalize_lattice(red_lat)
    return Crystal(canon, f % 1.0, crystal.atom_types)


def _assemble_text(row: Dict[str, str], text_targets: Sequence[str]) -> str:
    vals = [row[t] for t in text_targets]
    if len(text_targets) == 1:
        return str(vals[0])
    return ", ".join(f"{t}: {v}" for t, v in zip(text_targets, vals))


class MPDataset:
    """Array-backed dataset over one split CSV.

    Items: dict(atom_types [n], frac_coords [n,3], lattice [3,3], text str).
    """

    def __init__(self, data_dir: str, split: str, text_guide: bool = False,
                 text_targets: Optional[Sequence[str]] = None,
                 use_cache: bool = True, max_rows: Optional[int] = None):
        self.data_dir = Path(data_dir)
        self.split = split
        self.text_guide = text_guide
        self.text_targets = list(text_targets or [])
        path_csv = self.data_dir / f"{split}.csv"
        if not path_csv.exists():
            raise FileNotFoundError(path_csv)

        cache_key = hashlib.sha1(
            f"{path_csv.stat().st_mtime}:{max_rows}".encode()).hexdigest()[:10]
        cache = self.data_dir / f".cache_{split}_{cache_key}.npz"
        if use_cache and cache.exists():
            blob = np.load(cache, allow_pickle=True)
            self.atom_types = list(blob["atom_types"])
            self.frac_coords = list(blob["frac_coords"])
            self.lattices = blob["lattices"]
            self.rows = list(blob["rows"])
        else:
            self.atom_types, self.frac_coords, lattices, self.rows = \
                self._preprocess(path_csv, max_rows)
            self.lattices = np.stack(lattices) if lattices else \
                np.zeros((0, 3, 3))
            if use_cache:
                try:
                    np.savez_compressed(
                        cache,
                        atom_types=np.asarray(self.atom_types, dtype=object),
                        frac_coords=np.asarray(self.frac_coords, dtype=object),
                        lattices=self.lattices,
                        rows=np.asarray(self.rows, dtype=object))
                except OSError:
                    pass  # read-only data dir: skip caching

    def _preprocess(self, path_csv: Path, max_rows: Optional[int]):
        csv.field_size_limit(10 ** 9)
        atom_types, frac_coords, lattices, rows = [], [], [], []
        with open(path_csv) as f:
            for i, row in enumerate(csv.DictReader(f)):
                if max_rows is not None and i >= max_rows:
                    break
                try:
                    c = preprocess_structure(parse_cif(row["cif"]))
                except (ValueError, KeyError):
                    continue
                atom_types.append(c.atom_types.astype(np.int32))
                frac_coords.append(c.frac_coords.astype(np.float32))
                lattices.append(c.lattice.astype(np.float32))
                rows.append({k: v for k, v in row.items() if k != "cif"})
        return atom_types, frac_coords, lattices, rows

    def __len__(self) -> int:
        return len(self.atom_types)

    def __getitem__(self, idx: int) -> Dict:
        item = {
            "atom_types": self.atom_types[idx],
            "frac_coords": self.frac_coords[idx],
            "lattice": self.lattices[idx],
        }
        if self.text_guide:
            item["text"] = _assemble_text(self.rows[idx], self.text_targets)
        return item

    def natoms(self) -> np.ndarray:
        return np.asarray([len(a) for a in self.atom_types])
