"""Chemical-system navigation workflow (reference:
chemeleon/scripts/navigate_chemical_system.py:15-103): enumerate all
compositions with stoichiometry <= max_stoich, filter by SMACT validity, run
the Z-factor sampling loop per composition, dedupe globally, save CIFs."""

from __future__ import annotations

import itertools
from collections import defaultdict
from pathlib import Path
from typing import List

from chemeleon_tpu.chem.composition import (
    composition_natoms,
    formula_from_counts,
    reduced_composition,
    reduced_formula_alphabetical,
)
from chemeleon_tpu.chem.matcher import StructureMatcher
from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.chem.validity import smact_validity


def enumerate_valid_compositions(elements: List[str], max_stoich: int
                                 ) -> List[dict]:
    """All unique SMACT-valid reduced compositions of the element set
    (navigate_chemical_system.py:33-44)."""
    seen = {}
    for amts in itertools.product(range(max_stoich + 1), repeat=len(elements)):
        if max(amts) == 0:
            continue
        comp = {el: a for el, a in zip(elements, amts) if a > 0}
        red = reduced_composition(comp)
        key = tuple(sorted(red.items()))
        if key not in seen:
            seen[key] = red
    valid = [c for c in seen.values() if smact_validity(c)]
    print(f"Number of unique valid compositions: {len(valid)} "
          f"out of {len(seen)}")
    return valid


def navigate_chemical_system(elements: List[str] = ("Zn", "Ti", "O"),
                             max_stoich: int = 8, n_samples: int = 100,
                             max_natoms: int = 40, max_factor: int = 13,
                             save_dir: str = "results/navigate",
                             model=None, key=None, csp: bool = False,
                             comp_prior_scale: float = 0.0,
                             sample_steps: int = 0,
                             profile: str = None) -> List[Crystal]:
    """``csp``/``comp_prior_scale`` mirror the composition workflow: clamp or
    bias atom types per enumerated formula (sample_target_composition.py
    docstring) — the navigate filter accepts any in-system composition, so
    both modes raise its yield rather than change its semantics."""
    from chemeleon_tpu.models.chemeleon import Chemeleon

    if csp and comp_prior_scale > 0:
        raise ValueError("csp and comp_prior_scale are mutually exclusive: "
                         "CSP clamps atom types, so a type prior has no "
                         "effect (same rule as sample_batch)")
    if model is None:
        model = Chemeleon.load_composition_model()
    print(f"Text targets: {model.cfg.text_targets}")

    def tqdm(x):  # optional nicety; keep default args runnable without it
        return x
    try:
        from tqdm import tqdm  # noqa: F811
    except ImportError:
        pass

    save = Path(save_dir)
    save.mkdir(parents=True, exist_ok=True)

    valid_comps = enumerate_valid_compositions(list(elements), max_stoich)
    valid_formulas = {reduced_formula_alphabetical(c) for c in valid_comps}

    sm = StructureMatcher()
    collected: List[Crystal] = []
    for comp in tqdm(valid_comps):
        formula = reduced_formula_alphabetical(comp)
        reduced_natoms = composition_natoms(comp)
        print(f"Sampling for {formula}")
        valid: List[Crystal] = []
        for f in range(1, max_factor + 1):
            n_atoms = reduced_natoms * f
            if n_atoms > max_natoms:
                break
            print(f"Sampling {n_samples} structures for {formula} "
                  f"with {n_atoms} atoms...")
            if csp:
                gen_list = model.sample_csp(formula, n_samples=n_samples,
                                            z=f, key=key,
                                            sample_steps=sample_steps
                                            or None, profile=profile)
            elif comp_prior_scale > 0:
                gen_list = model.sample_batch(
                    [n_atoms] * n_samples,
                    ([formula] * n_samples if model.cfg.text_guide
                     else None),
                    key=key, comp_prior=[formula] * n_samples,
                    comp_prior_scale=comp_prior_scale,
                    sample_steps=sample_steps or None, profile=profile)
            else:
                gen_list = model.sample(text_input=formula, n_atoms=n_atoms,
                                        n_samples=n_samples, key=key,
                                        sample_steps=sample_steps or None,
                                        profile=profile)
            if gen_list is None:
                continue
            for st in gen_list:
                a, b, c_, *_ = st.lattice_params
                if max(a, b, c_) > 60:
                    continue
                if st.reduced_formula() not in valid_formulas:
                    continue
                valid.append(st)
        unique = [g[0] for g in sm.group_structures(valid)]
        print(f"Number of unique structures: {len(unique)}")
        collected.extend(unique)

    final = [g[0] for g in sm.group_structures(collected)]
    print(f"Number of final unique structures: {len(final)}")

    idx = defaultdict(int)
    for st in final:
        c = st.reduced_formula()
        idx[c] += 1
        (save / f"gen_{c}_{len(st)}_{idx[c]}.cif").write_text(st.to_cif())
    print(f"Results saved in {save}")
    return final
