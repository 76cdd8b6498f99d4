"""Trajectory schema — device tensors -> Crystal objects.

Rebuild of the reference's pydantic trajectory models (reference:
chemeleon/modules/schema.py:14-88) for dense padded batches. A step holds the
dense state ``[B, N]`` arrays; ``get_crystals`` splits by natoms, clamps
out-of-range types to the dummy class (schema.py:60-62), wraps coords, and
sorts atoms by atomic number (schema.py:80).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from chemeleon_tpu.chem.structure import Crystal


@dataclass
class TrajectoryStep:
    """One timestep of dense sampler state (host numpy)."""
    natoms: np.ndarray        # [B]
    atom_types: np.ndarray    # [B, N] int
    frac_coords: np.ndarray   # [B, N, 3]
    lattices: np.ndarray      # [B, 3, 3]

    def get_crystals(self) -> List[Crystal]:
        out = []
        max_type = 103
        for b in range(len(self.natoms)):
            n = int(self.natoms[b])
            types = np.asarray(self.atom_types[b, :n]).copy()
            types[(types < 0) | (types > max_type)] = 0
            coords = np.asarray(self.frac_coords[b, :n]) % 1.0
            out.append(Crystal(np.asarray(self.lattices[b]), coords,
                               types).sorted_by_type())
        return out


class TrajectoryContainer:
    """Maps timestep -> TrajectoryStep (reference schema.py:26-88).

    Index convention matches the reference: ``container[T]`` is the initial
    noise state, ``container[0]`` the final sample.
    """

    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self._steps: Dict[int, TrajectoryStep] = {}

    def __setitem__(self, t: int, step: TrajectoryStep) -> None:
        self._steps[int(t)] = step

    def __getitem__(self, t: int) -> TrajectoryStep:
        return self._steps[int(t)]

    def __contains__(self, t: int) -> bool:
        return int(t) in self._steps

    def timesteps(self) -> List[int]:
        return sorted(self._steps)

    def get_atoms(self, t: int) -> List[Crystal]:
        """Name kept for API parity with the reference (schema.py:57-83);
        returns Crystal objects (no ASE in this environment)."""
        return self._steps[int(t)].get_crystals()

    def get_crystals(self, t: int) -> List[Crystal]:
        return self.get_atoms(t)

    def get_trajectory(self) -> List[List[Crystal]]:
        """All recorded steps, ordered from t=T down to t=0
        (schema.py:85-88)."""
        return [self.get_atoms(t) for t in sorted(self._steps, reverse=True)]

    @classmethod
    def from_scan_output(cls, natoms: np.ndarray, traj_types: np.ndarray,
                         traj_coords: np.ndarray, traj_lattices: np.ndarray,
                         total_steps: int, stride: int = 1) -> "TrajectoryContainer":
        """Build from stacked lax.scan outputs ordered t = T-1 .. 0.

        With ``stride`` k, record i is the state AFTER the (i+1)-th chunk of
        k steps, i.e. timestep total_steps - (i+1)*k (identical to the
        per-step convention at k=1; the final record is always t=0)."""
        c = cls(total_steps)
        n_rec = traj_types.shape[0]
        for i in range(n_rec):
            t = total_steps - (i + 1) * stride
            c[t] = TrajectoryStep(natoms=np.asarray(natoms),
                                  atom_types=np.asarray(traj_types[i]),
                                  frac_coords=np.asarray(traj_coords[i]),
                                  lattices=np.asarray(traj_lattices[i]))
        return c
