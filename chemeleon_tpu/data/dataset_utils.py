"""Dataset conversion utilities (reference:
chemeleon/datasets/dataset_utils.py:13-64)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from chemeleon_tpu.chem.composition import reduced_formula_alphabetical
from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.ops.graph import CrystalBatch, batch_from_arrays


def crystal_to_item(crystal: Crystal, text: str | None = None) -> Dict:
    """Crystal -> training item (the analog of atoms_to_pyg_data,
    dataset_utils.py:13-28)."""
    item = {
        "atom_types": crystal.atom_types.astype(np.int32),
        "frac_coords": (crystal.frac_coords % 1.0).astype(np.float32),
        "lattice": crystal.lattice.astype(np.float32),
    }
    if text is not None:
        item["text"] = text
    return item


def crystals_to_batch(crystals: List[Crystal], n_max: int | None = None
                      ) -> CrystalBatch:
    return batch_from_arrays(
        [c.atom_types for c in crystals],
        [(c.frac_coords % 1.0).astype(np.float32) for c in crystals],
        [c.lattice.astype(np.float32) for c in crystals], n_max=n_max)


def batch_to_crystal_list(batch: CrystalBatch) -> List[Crystal]:
    """Dense batch -> list of Crystals (the analog of batch_to_atoms_list,
    dataset_utils.py:31-46)."""
    out = []
    types = np.asarray(batch.atom_types)
    coords = np.asarray(batch.frac_coords)
    lats = np.asarray(batch.lattices)
    for b, n in enumerate(np.asarray(batch.natoms)):
        out.append(Crystal(lats[b], coords[b, :n] % 1.0, types[b, :n]))
    return out


def convert_reduced_composition(formula: str) -> str:
    """Alphabetical reduced formula with pymatgen-style spacing, e.g.
    'Li2O3Mn' -> 'Li2 Mn1 O3' (dataset_utils.py:49-64)."""
    from chemeleon_tpu.chem.composition import (
        parse_composition,
        reduced_composition,
    )
    red = reduced_composition(parse_composition(formula))
    return " ".join(f"{el}{n}" for el, n in sorted(red.items()))
