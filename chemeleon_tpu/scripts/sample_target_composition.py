"""Composition-mode sampling workflow (reference:
chemeleon/scripts/sample_target_composition.py:12-79): loop Z-factors while
n_atoms <= max_natoms, filter by validity + exact reduced composition, dedupe
with the structure matcher, save CIFs."""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import List, Optional

from chemeleon_tpu.chem.composition import (
    composition_natoms,
    parse_composition,
    reduced_composition,
    reduced_formula_alphabetical,
)
from chemeleon_tpu.chem.matcher import StructureMatcher
from chemeleon_tpu.chem.structure import Crystal


def sample_target_composition(target_composition: str = "TiO2",
                              n_samples: int = 100, max_natoms: int = 40,
                              max_factor: int = 13,
                              save_dir: str = "results/TiO2",
                              model=None, key=None,
                              csp: bool = False,
                              comp_prior_scale: float = 0.0,
                              sample_steps: int = 0,
                              lattice_system: str = None,
                              profile: str = None) -> List[Crystal]:
    """``csp=True`` clamps atom types to the target composition (CSP mode,
    models/chemeleon.py sampler_step) so every sample passes the exact
    composition filter by construction; the text-guided default mirrors the
    reference's rejection-sampling workflow. ``comp_prior_scale > 0`` steers
    free type diffusion toward the target element fractions via an additive
    log-prior on the x0 type logits (models/chemeleon.py sampler_step) —
    raising the exact-composition filter pass rate without CSP's hard
    clamp. ``lattice_system`` clamps the cell to that crystal system's
    metric constraints (ops/lattice_proj), composable with every mode."""
    from chemeleon_tpu.models.chemeleon import Chemeleon

    if csp and comp_prior_scale > 0:
        raise ValueError("csp and comp_prior_scale are mutually exclusive: "
                         "CSP clamps atom types, so a type prior has no "
                         "effect (same rule as sample_batch)")
    if model is None:
        model = Chemeleon.load_composition_model()
    print(f"Text targets: {model.cfg.text_targets}")

    save = Path(save_dir)
    save.mkdir(parents=True, exist_ok=True)

    red = reduced_composition(parse_composition(target_composition))
    reduced_natoms = composition_natoms(red)
    comp = reduced_formula_alphabetical(red)
    print(f"target composition: {comp}")

    sm = StructureMatcher(angle_tol=10)  # reference uses angle_tol=10 (:35)
    valid: List[Crystal] = []
    for f in range(1, max_factor + 1):
        n_atoms = reduced_natoms * f
        if n_atoms > max_natoms:
            break
        print(f"Sampling {n_samples} structures for {comp} "
              f"with {n_atoms} atoms...")
        if csp:
            gen_list = model.sample_csp(comp, n_samples=n_samples, z=f,
                                        key=key,
                                        sample_steps=sample_steps or None,
                                        lattice_system=lattice_system,
                                        profile=profile)
        elif comp_prior_scale > 0:
            gen_list = model.sample_batch(
                [n_atoms] * n_samples,
                [comp] * n_samples if model.cfg.text_guide else None,
                key=key, comp_prior=[comp] * n_samples,
                comp_prior_scale=comp_prior_scale,
                sample_steps=sample_steps or None,
                lattice_system=lattice_system,
                profile=profile)
        else:
            gen_list = model.sample(text_input=comp, n_atoms=n_atoms,
                                    n_samples=n_samples, key=key,
                                    sample_steps=sample_steps or None,
                                    lattice_system=lattice_system,
                                    profile=profile)
        if gen_list is None:
            continue
        for st in gen_list:
            a, b, c_, *_ = st.lattice_params
            if max(a, b, c_) > 60:            # validity (:57-62)
                continue
            if st.reduced_formula() != comp:
                continue
            valid.append(st)
        print(len(valid))

    unique = [g[0] for g in sm.group_structures(valid)]
    print(f"Number of unique structures: {len(unique)}")

    idx = defaultdict(int)
    for st in unique:
        c = st.reduced_formula()
        idx[c] += 1
        (save / f"gen_{c}_{len(st)}_{idx[c]}.cif").write_text(st.to_cif())
    print(f"Results saved in {save}")
    return unique
