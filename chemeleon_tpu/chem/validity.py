"""Composition and structure validity screens.

Standalone replacements for the chemistry screens the reference delegates to
smact/pymatgen:
  * ``smact_validity`` — charge-neutrality + electronegativity-ordering
    screen over common oxidation states (used by chemical-system navigation,
    reference navigate_chemical_system.py:40).
  * ``structure_validity`` — the reference eval's validity criterion:
    lattice lengths <= 60 A and min pairwise distance > 0.5 A
    (evaluate.py:177-189; sample_target_composition.py:57-62).
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterable, List, Sequence, Tuple

from chemeleon_tpu.chem.elements import ELECTRONEGATIVITY, OXIDATION_STATES
from chemeleon_tpu.chem.structure import Crystal


def charge_neutral_assignments(elements: Sequence[str],
                               counts: Sequence[int],
                               max_assignments: int = 200000):
    """Yield oxidation-state assignments with zero total charge."""
    state_lists = [OXIDATION_STATES.get(el, []) for el in elements]
    if any(not s for s in state_lists):
        return
    tried = 0
    for states in itertools.product(*state_lists):
        tried += 1
        if tried > max_assignments:
            return
        if sum(s * c for s, c in zip(states, counts)) == 0:
            yield states


def pauling_ordered(elements: Sequence[str], states: Sequence[int]) -> bool:
    """Cations should be less electronegative than anions (Pauling test)."""
    for (e1, s1), (e2, s2) in itertools.combinations(zip(elements, states), 2):
        x1 = ELECTRONEGATIVITY.get(e1)
        x2 = ELECTRONEGATIVITY.get(e2)
        if x1 is None or x2 is None:
            continue
        if s1 > 0 and s2 < 0 and x1 > x2:
            return False
        if s2 > 0 and s1 < 0 and x2 > x1:
            return False
    return True


def smact_validity(composition: Dict[str, int], use_pauling_test: bool = True,
                   include_alloys: bool = True) -> bool:
    """Charge-neutrality (+ optional Pauling) screen, SMACT-style."""
    elements = list(composition.keys())
    counts = [int(composition[e]) for e in elements]
    if len(elements) == 1:
        return True
    if include_alloys:
        metals = {e for e in elements
                  if OXIDATION_STATES.get(e) and
                  all(s > 0 for s in OXIDATION_STATES[e])}
        if all(e in metals for e in elements):
            return True
    for states in charge_neutral_assignments(elements, counts):
        if not use_pauling_test or pauling_ordered(elements, states):
            return True
    return False


def structure_validity(crystal: Crystal, cutoff: float = 0.5,
                       max_lattice_length: float = 60.0) -> bool:
    """Reference validity criterion (evaluate.py:177-189): all lattice
    lengths <= 60 A, min interatomic distance > 0.5 A, positive volume."""
    a, b, c, *_ = crystal.lattice_params
    if max(a, b, c) > max_lattice_length:
        return False
    if crystal.volume < 0.1:
        return False
    # n == 1 included: min_pair_distance returns the self-image distance,
    # so a single atom 0.4 A from its periodic copy is correctly invalid
    if len(crystal) >= 1 and crystal.min_pair_distance() <= cutoff:
        return False
    return True
