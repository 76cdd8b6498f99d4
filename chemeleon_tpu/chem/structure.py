"""Crystal structure object — the framework's standalone replacement for
ASE ``Atoms`` / pymatgen ``Structure`` on the output path (the reference
converts sampled tensors to ASE atoms, schema.py:57-83, then to pymatgen for
CIF export, sample_prompt.py:17-43)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from chemeleon_tpu.chem.elements import SYMBOLS, symbol_of, z_of
from chemeleon_tpu.chem.lattice import lattice_parameters, volume as _volume


@dataclass
class Crystal:
    """A periodic crystal: row-vector lattice, fractional coords, species Z."""

    lattice: np.ndarray          # [3, 3] row vectors, Angstrom
    frac_coords: np.ndarray      # [n, 3] in [0, 1)
    atom_types: np.ndarray       # [n] int Z (1..103)
    properties: Dict = field(default_factory=dict)

    def __post_init__(self):
        self.lattice = np.asarray(self.lattice, dtype=np.float64).reshape(3, 3)
        self.frac_coords = np.asarray(self.frac_coords,
                                      dtype=np.float64).reshape(-1, 3)
        self.atom_types = np.asarray(self.atom_types, dtype=np.int64).reshape(-1)
        assert len(self.frac_coords) == len(self.atom_types)

    # -- basic properties ---------------------------------------------------
    def __len__(self) -> int:
        return len(self.atom_types)

    @property
    def num_atoms(self) -> int:
        return len(self.atom_types)

    @property
    def symbols(self) -> List[str]:
        return [symbol_of(int(z)) for z in self.atom_types]

    @property
    def cart_coords(self) -> np.ndarray:
        return self.frac_coords @ self.lattice

    @property
    def volume(self) -> float:
        return _volume(self.lattice)

    @property
    def lattice_params(self):
        """(a, b, c, alpha, beta, gamma)."""
        return lattice_parameters(self.lattice)

    @property
    def composition(self) -> Dict[str, int]:
        comp: Dict[str, int] = {}
        for s in self.symbols:
            comp[s] = comp.get(s, 0) + 1
        return comp

    def reduced_composition(self) -> Dict[str, int]:
        from math import gcd
        from functools import reduce
        comp = self.composition
        g = reduce(gcd, comp.values())
        return {k: v // g for k, v in sorted(comp.items())}

    def reduced_formula(self) -> str:
        """Alphabetical reduced formula, matching the reference's
        ``convert_reduced_composition`` (dataset_utils.py:49-64)."""
        return "".join(f"{el}{n if n > 1 else ''}"
                       for el, n in self.reduced_composition().items())

    def formula(self) -> str:
        comp = self.composition
        return "".join(f"{el}{n if n > 1 else ''}"
                       for el, n in sorted(comp.items()))

    # -- geometry -----------------------------------------------------------
    def _reduced_frame(self):
        """(reduced lattice, frac coords in it): a +-1 image search is only
        exact on a Niggli-reduced basis — heavily skewed generated cells
        (canonical zero-pattern, extreme angles) have nearest images at
        offsets beyond +-1 of the raw basis, which would over-report
        min distances and let overlapping structures pass validity."""
        from chemeleon_tpu.chem.lattice import niggli_reduce
        try:
            red = np.asarray(niggli_reduce(self.lattice), np.float64)
        except (ValueError, ZeroDivisionError):
            return np.asarray(self.lattice, np.float64), \
                np.asarray(self.frac_coords, np.float64) % 1.0
        # niggli_reduce keeps the cartesian frame (row ops only), so carts
        # are unchanged and fracs re-express through the reduced basis
        frac_red = (self.cart_coords @ np.linalg.inv(red)) % 1.0
        return red, frac_red

    def distance_matrix(self, _frame=None) -> np.ndarray:
        """Min-image pairwise distances [n, n]: 3x3x3 image search on the
        Niggli-reduced basis (exact there; see _reduced_frame)."""
        lat, frac = _frame if _frame is not None else self._reduced_frame()
        try:
            from chemeleon_tpu.native import available, distance_matrix
            if available():
                return distance_matrix(lat, frac)
        except ImportError:
            pass
        cart = frac @ lat
        offsets = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                            for k in (-1, 0, 1)], dtype=np.float64)
        img = offsets @ lat                                # [27, 3]
        diff = cart[None, :, None, :] + img[None, None, :, :] - cart[:, None, None, :]
        d = np.linalg.norm(diff, axis=-1)                  # [n, n, 27]
        return d.min(axis=-1)

    def min_pair_distance(self) -> float:
        """Smallest interatomic distance (excluding self at zero image)."""
        n = len(self)
        if n < 1:
            return float("inf")
        lat, frac = frame = self._reduced_frame()
        try:
            from chemeleon_tpu.native import available, min_pair_distance
            if available():
                return min_pair_distance(lat, frac)
        except ImportError:
            pass
        d = self.distance_matrix(_frame=frame)
        np.fill_diagonal(d, np.inf)  # same atom, center image
        # self-image distances (atom to its own periodic copy); on the
        # reduced basis the shortest lattice vector is among these combos
        self_img = np.array([np.linalg.norm(off @ lat)
                             for off in [[1, 0, 0], [0, 1, 0], [0, 0, 1],
                                         [1, 1, 0], [1, 0, 1], [0, 1, 1],
                                         [1, 1, 1], [1, -1, 0], [1, 0, -1],
                                         [0, 1, -1], [1, 1, -1], [1, -1, 1],
                                         [-1, 1, 1]]]).min()
        if n == 1:
            return float(self_img)
        return float(min(d.min(), self_img))

    def wrap(self) -> "Crystal":
        return Crystal(self.lattice, self.frac_coords % 1.0, self.atom_types,
                       dict(self.properties))

    def sorted_by_type(self) -> "Crystal":
        """Sort atoms by atomic number (the reference applies
        ase.build.tools.sort, schema.py:80)."""
        order = np.argsort(self.atom_types, kind="stable")
        return Crystal(self.lattice, self.frac_coords[order],
                       self.atom_types[order], dict(self.properties))

    # -- codecs ---------------------------------------------------------------
    def to_dict(self) -> Dict:
        return {
            "lattice": self.lattice.tolist(),
            "frac_coords": self.frac_coords.tolist(),
            "atom_types": self.atom_types.tolist(),
            "properties": self.properties,
        }

    @classmethod
    def from_dict(cls, d: Dict) -> "Crystal":
        return cls(np.array(d["lattice"]), np.array(d["frac_coords"]),
                   np.array(d["atom_types"]), d.get("properties", {}))

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "Crystal":
        return cls.from_dict(json.loads(s))

    def to_cif(self) -> str:
        from chemeleon_tpu.chem.cif import write_cif
        return write_cif(self)

    @classmethod
    def from_cif(cls, text: str) -> "Crystal":
        from chemeleon_tpu.chem.cif import parse_cif
        return parse_cif(text)

    def to_ase(self):
        """Optional ASE interop (gated: ase is not in this environment)."""
        from ase import Atoms  # noqa: F401
        return Atoms(symbols=self.symbols,
                     scaled_positions=self.frac_coords % 1.0,
                     cell=self.lattice, pbc=True)

    @classmethod
    def from_ase(cls, atoms) -> "Crystal":
        return cls(np.array(atoms.cell), atoms.get_scaled_positions(),
                   atoms.get_atomic_numbers())

    def __repr__(self) -> str:
        a, b, c, al, be, ga = self.lattice_params
        return (f"Crystal({self.formula()}, n={len(self)}, "
                f"a={a:.3f} b={b:.3f} c={c:.3f} "
                f"alpha={al:.1f} beta={be:.1f} gamma={ga:.1f})")
