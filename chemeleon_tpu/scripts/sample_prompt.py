"""Prompt-mode sampling workflow (reference:
chemeleon/scripts/sample_prompt.py:11-43)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional


def sample_prompt(text_input: str = ("A Crystal structure of LiMnO4 with "
                                     "orthorhombic symmetry"),
                  n_samples: int = 3, n_atoms: int = 6,
                  save_dir: str = "results/prompt", model=None,
                  key=None, sample_steps: int = 0,
                  lattice_system: str = None, profile: str = None):
    from chemeleon_tpu.models.chemeleon import Chemeleon

    if model is None:
        model = Chemeleon.load_general_text_model()
    print(f"Text targets: {model.cfg.text_targets}")

    save = Path(save_dir)
    save.mkdir(parents=True, exist_ok=True)

    print(f"Sampling {n_samples} structures for {text_input} "
          f"with {n_atoms} atoms...")
    gen_list = model.sample(text_input=text_input, n_atoms=n_atoms,
                            n_samples=n_samples, key=key,
                            sample_steps=sample_steps or None,
                            lattice_system=lattice_system,
                            profile=profile)
    if gen_list is None:
        print("Sampling failed")
        return None
    for i, st in enumerate(gen_list):
        (save / f"gen_{i}.cif").write_text(st.to_cif())
    print(f"Results saved in {save}")
    return gen_list
