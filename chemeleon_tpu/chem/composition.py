"""Composition parsing and formula utilities (standalone pymatgen-Composition
replacement for the workflows in reference scripts/)."""

from __future__ import annotations

import re
from functools import reduce
from math import gcd
from typing import Dict, List, Tuple

from chemeleon_tpu.chem.elements import Z_BY_SYMBOL


def parse_composition(formula: str) -> Dict[str, float]:
    """Parse 'LiMnO4', 'Ca(OH)2', 'Ba2 Ti2 O6' ... -> {element: amount}."""
    formula = formula.replace(" ", "")

    def parse_block(s: str, i: int) -> Tuple[Dict[str, float], int]:
        comp: Dict[str, float] = {}
        while i < len(s):
            ch = s[i]
            if ch == "(":
                sub, i = parse_block(s, i + 1)
                m = re.match(r"\d*\.?\d*", s[i:])
                mult = float(m.group(0)) if m.group(0) else 1.0
                i += len(m.group(0))
                for el, n in sub.items():
                    comp[el] = comp.get(el, 0.0) + n * mult
            elif ch == ")":
                return comp, i + 1
            else:
                m = re.match(r"([A-Z][a-z]?)(\d*\.?\d*)", s[i:])
                if not m:
                    raise ValueError(f"cannot parse formula at {s[i:]!r}")
                el, num = m.groups()
                if el not in Z_BY_SYMBOL:
                    raise ValueError(f"unknown element {el!r} in {formula!r}")
                comp[el] = comp.get(el, 0.0) + (float(num) if num else 1.0)
                i += m.end()
        return comp, i

    comp, _ = parse_block(formula, 0)
    if not comp:
        raise ValueError(f"empty formula {formula!r}")
    return comp


def reduced_composition(comp: Dict[str, float]) -> Dict[str, int]:
    """Integer-reduce a composition (assumes near-integer amounts)."""
    ints = {el: int(round(n)) for el, n in comp.items()}
    if any(abs(ints[el] - comp[el]) > 1e-6 for el in comp):
        # fractional composition: scale to integers via denominator search
        for scale in range(1, 25):
            if all(abs(n * scale - round(n * scale)) < 1e-6
                   for n in comp.values()):
                ints = {el: int(round(n * scale)) for el, n in comp.items()}
                break
    g = reduce(gcd, ints.values())
    return {el: n // g for el, n in sorted(ints.items())}


def reduced_formula_alphabetical(formula_or_comp) -> str:
    """Alphabetical reduced formula, matching the reference's
    ``convert_reduced_composition`` (dataset_utils.py:49-64)."""
    comp = (parse_composition(formula_or_comp)
            if isinstance(formula_or_comp, str) else dict(formula_or_comp))
    red = reduced_composition(comp)
    return "".join(f"{el}{n if n > 1 else ''}" for el, n in sorted(red.items()))


def composition_natoms(comp: Dict[str, float]) -> int:
    return int(round(sum(comp.values())))


def composition_log_prior(formulas, num_classes: int, eps: float = 1e-9):
    """[B, num_classes] additive log-bias over atom-type classes for
    composition-prior guided sampling (framework extension; the reference's
    composition workflow filters free samples instead,
    sample_target_composition.py:57-62).

    Row i is log(fraction of element z in formulas[i]); elements absent from
    the formula — and the dummy/absorbing class 0, which a clean x0 never is —
    get log(eps). Added to the predicted x0 type logits with a scale knob
    before the D3PM posterior; softmax shift-invariance makes absolute level
    irrelevant, only differences steer."""
    import numpy as np

    out = np.full((len(formulas), num_classes), np.log(eps), np.float32)
    for i, f in enumerate(formulas):
        comp = parse_composition(f)
        total = sum(comp.values())
        for el, cnt in comp.items():
            z = Z_BY_SYMBOL[el]
            if not 1 <= z < num_classes:
                raise ValueError(
                    f"element {el} (Z={z}) outside the model's "
                    f"{num_classes}-class type vocabulary")
            out[i, z] = np.log(cnt / total)
    return out


def formula_from_counts(comp: Dict[str, int]) -> str:
    return "".join(f"{el}{n if n > 1 else ''}" for el, n in sorted(comp.items()))


def composition_to_types(formula: str, z: int = 1) -> List[int]:
    """Atomic-number sequence for ``z`` formula units of the REDUCED
    composition — the exact expansion ``Chemeleon.sample_csp`` clamps to
    (models/chemeleon.py), shared with the serving wire protocol's
    ``fixed_comp`` field so server-side CSP matches local CSP type-for-type.
    """
    from chemeleon_tpu.chem.elements import z_of

    red = reduced_composition(parse_composition(formula))
    types: List[int] = []
    for el, cnt in sorted(red.items()):
        types += [z_of(el)] * int(round(cnt)) * int(z)
    return types
