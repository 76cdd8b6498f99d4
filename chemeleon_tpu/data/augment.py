"""Isovalent element-substitution augmentation for composition conditioning.

The mp-40 split available in this image is 596 training rows — far too few
for the type-denoiser to learn the *compositional* structure of prompts
(held-out composition_matching 0.0, BENCH.md round 3). But the mapping the
conditioner must learn (prompt composition ↔ atom-type marginals) is
compositional, and chemistry gives a cheap, label-correct augmentation:
replace a species with an isovalent one (same periodic-table family),
rescale the cell isotropically by the covalent-radius ratio, and rewrite the
prompt's composition to match. Every augmented pair is a *new* composition
string whose types the model must honor — exactly the generalization the
held-out eval probes.

This is the classic substitution trick of CSP ML pipelines (SMACT-style
isovalent families; the reference leans on the full MP corpus instead —
mp_dataset.py has no augmentation). The geometry of a substituted cell is
only approximately relaxed, but the conditioning pathway trains on
(prompt, types) agreement, which substitution preserves exactly.

Applied on the host in the dataloader's prefetch thread (zero TPU cost);
per-(epoch, index) seeding keeps runs reproducible.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from chemeleon_tpu.chem.elements import COVALENT_RADII, symbol_of, z_of

# Isovalent substitution families: same group, common oxidation states.
# Restricted to main-group + d-block columns + lanthanides; crossing a
# family is never allowed, so formal charge balance is preserved.
FAMILIES: List[List[str]] = [
    ["Li", "Na", "K", "Rb", "Cs"],
    ["Be", "Mg", "Ca", "Sr", "Ba"],
    ["B", "Al", "Ga", "In", "Tl"],
    ["C", "Si", "Ge", "Sn", "Pb"],
    ["N", "P", "As", "Sb", "Bi"],
    ["O", "S", "Se", "Te"],
    ["F", "Cl", "Br", "I"],
    ["Sc", "Y"],
    ["Ti", "Zr", "Hf"],
    ["V", "Nb", "Ta"],
    ["Cr", "Mo", "W"],
    ["Mn", "Tc", "Re"],
    ["Fe", "Ru", "Os"],
    ["Co", "Rh", "Ir"],
    ["Ni", "Pd", "Pt"],
    ["Cu", "Ag", "Au"],
    ["Zn", "Cd", "Hg"],
    ["La", "Ce", "Pr", "Nd", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er",
     "Tm", "Yb", "Lu"],
]

FAMILY_OF: Dict[str, List[str]] = {}
for _fam in FAMILIES:
    for _el in _fam:
        FAMILY_OF[_el] = _fam


def composition_text(atom_types: Sequence[int]) -> str:
    """The mp-40 ``composition`` column format: reduced counts, explicit
    multiplicity, alphabetical symbols — e.g. ``"Ca1 O10"``."""
    counts: Dict[str, int] = {}
    for z in atom_types:
        s = symbol_of(int(z))
        counts[s] = counts.get(s, 0) + 1
    g = np.gcd.reduce(list(counts.values()))
    return " ".join(f"{s}{counts[s] // g}" for s in sorted(counts))


def symbol_mapping(old_types: np.ndarray,
                   new_types: np.ndarray) -> Dict[str, str]:
    """Element-symbol rename implied by a substitution (old -> new)."""
    out: Dict[str, str] = {}
    for o, n in zip(np.asarray(old_types), np.asarray(new_types)):
        if int(o) != int(n):
            out[symbol_of(int(o))] = symbol_of(int(n))
    return out


def rewrite_formula_tokens(text: str, mapping: Dict[str, str]) -> str:
    """Rewrite every formula-looking token in free text under an element
    rename ("CaO10" with Ca->Sr, O->S becomes "SrS10"). Isovalent
    substitution is a pure 1:1 symbol rename, so prompts stay label-correct
    — this is what lets substitution augmentation apply to the free-form
    ``prompt`` column (the embedded formula is the only prompt content the
    substitution invalidates)."""
    import re as _re
    from chemeleon_tpu.chem.composition import parse_composition

    def _plausible_formula(tok: str) -> bool:
        try:
            comp = parse_composition(tok)
        except (ValueError, RecursionError):
            return False
        return bool(comp) and (any(ch.isdigit() for ch in tok)
                               or len(comp) >= 2)

    def _rewrite(m: "_re.Match") -> str:
        body = m.group(0)
        if not _plausible_formula(body):
            return body
        return _re.sub(r"[A-Z][a-z]?",
                       lambda mm: mapping.get(mm.group(0), mm.group(0)),
                       body)

    # rewrite every maximal formula-shaped run, not whitespace tokens: a
    # formula attached to ANY joiner ("TiO2-based", "TiO2/anatase",
    # "(TiO2)") must still be renamed, else augmentation trains substituted
    # structures against the original prose. '.' joins a run only BETWEEN
    # alphanumerics so decimal stoichiometries ("Li0.5CoO2") rename
    # atomically while sentence-final periods stay outside the run — a
    # split run half-renamed the formula ("Na0.5CoO2") because the "5CoO2"
    # fragment failed parse_composition and kept its old symbols
    return _re.sub(r"[A-Za-z0-9()]+(?:\.[A-Za-z0-9()]+)*", _rewrite, text)


def substitute_types(atom_types: np.ndarray, rng: np.random.Generator,
                     p_species: float) -> Optional[np.ndarray]:
    """Per-species isovalent substitution with probability ``p_species``.

    Returns the new atom-type array, or None if nothing changed. A swap is
    skipped when the candidate element is already present (merging two
    species would change the reduced formula's support, not just its
    labels).
    """
    types = np.asarray(atom_types)
    present = {symbol_of(int(z)) for z in types}
    mapping: Dict[int, int] = {}
    taken = set(present)
    for sym in sorted(present):  # sorted: determinism under set ordering
        fam = FAMILY_OF.get(sym)
        if fam is None or rng.random() >= p_species:
            continue
        candidates = [e for e in fam if e != sym and e not in taken]
        if not candidates:
            continue
        new = candidates[int(rng.integers(len(candidates)))]
        taken.add(new)
        taken.discard(sym)
        mapping[z_of(sym)] = z_of(new)
    if not mapping:
        return None
    return np.vectorize(lambda z: mapping.get(int(z), int(z)),
                        otypes=[types.dtype])(types)


def lattice_scale(old_types: np.ndarray, new_types: np.ndarray) -> float:
    """Isotropic cell rescale: cube root of the summed covalent-volume
    ratio, so substituted cells keep a physical packing fraction."""
    def vol(ts):
        return sum(COVALENT_RADII.get(symbol_of(int(z)), 1.0) ** 3
                   for z in ts)
    return float(vol(new_types) / max(vol(old_types), 1e-9)) ** (1.0 / 3.0)


class SupercellView:
    """Deterministic Z-factor expansion (augmentation round 2).

    Every row whose doubled cell still fits ``max_atoms`` ALSO appears as a
    2x supercell along its shortest axis — the same structure trained at
    Z and 2Z (reference data has natural Z variety from the full MP corpus;
    this is the 596-row substitute). The expansion is FIXED (not per-epoch):
    natoms must be static so the bucketed batch plan stays compile-stable
    on TPU. Reduced-composition text targets are invariant under a
    supercell, so all text passes through unchanged.
    """

    def __init__(self, dataset, max_atoms: int = 40, max_z: int = 2):
        self.dataset = dataset
        self.text_targets = getattr(dataset, "text_targets", None)
        base_n = np.asarray(dataset.natoms())
        # index entries are (row, factor): factor 1 = the original cell,
        # factor k>=2 = k-fold expansion along the shortest axis
        self.index = [(i, 1) for i in range(len(dataset))]
        for z in range(2, max(2, int(max_z)) + 1):
            self.index += [(i, z) for i in range(len(dataset))
                           if z * int(base_n[i]) <= max_atoms]
        if hasattr(dataset, "rows"):
            self.rows = [dataset.rows[i] for i, _ in self.index]
        self._natoms = np.asarray(
            [int(base_n[i]) * z for i, z in self.index])

    def __len__(self) -> int:
        return len(self.index)

    def natoms(self) -> np.ndarray:
        return self._natoms

    def __getitem__(self, idx: int) -> Dict:
        i, z = self.index[idx]
        item = dict(self.dataset[i])
        if z == 1:
            return item
        lat = np.asarray(item["lattice"], dtype=np.float32)
        axis = int(np.argmin(np.linalg.norm(lat, axis=1)))
        new_lat = lat.copy()
        new_lat[axis] *= float(z)
        frac = np.asarray(item["frac_coords"], dtype=np.float32)
        base = frac.copy()
        base[:, axis] /= float(z)
        copies = [base + np.eye(3, dtype=np.float32)[axis] * (k / float(z))
                  for k in range(z)]
        item["lattice"] = new_lat
        item["frac_coords"] = np.concatenate(copies, axis=0)
        item["atom_types"] = np.concatenate([item["atom_types"]] * z, axis=0)
        return item


class LatticeNoiseView:
    """Per-epoch lattice-strain jitter (augmentation round 2).

    Applies a small random symmetric strain to the cell (atoms co-move
    affinely: frac coords unchanged) and re-canonicalizes to the training
    frame's zero pattern. Teaches the lattice denoiser the neighborhood of
    each relaxed cell instead of a single point — the 596-row substitute
    for MP's natural near-duplicate spread.
    """

    def __init__(self, dataset, amplitude: float, seed: int = 0):
        self.dataset = dataset
        self.amplitude = float(amplitude)
        self.seed = int(seed)
        self.text_targets = getattr(dataset, "text_targets", None)
        if hasattr(dataset, "rows"):
            self.rows = dataset.rows

    def __len__(self) -> int:
        return len(self.dataset)

    def natoms(self) -> np.ndarray:
        return self.dataset.natoms()

    def __getitem__(self, idx: int) -> Dict:
        from chemeleon_tpu.chem.lattice import canonicalize_lattice
        item = dict(self.dataset[idx])
        rng = np.random.default_rng((self.seed, idx, 7))
        e = rng.normal(0.0, self.amplitude / np.sqrt(2.0), (3, 3))
        strain = np.eye(3) + (e + e.T) / 2.0
        lat = np.asarray(item["lattice"], dtype=np.float64) @ strain
        item["lattice"] = canonicalize_lattice(lat).astype(np.float32)
        return item


class AugmentedView:
    """Dataset wrapper applying substitution augmentation on access.

    Mirrors the MPDataset item/bucketing API (``__len__``, ``__getitem__``,
    ``natoms`` — substitution preserves atom count, so bucket plans are
    unchanged). Augmentation is keyed by (seed, index): one fixed
    substitution draw per item per epoch, a fresh one next epoch when the
    dataloader reseeds.
    """

    # text targets whose value survives substitution + isotropic rescale
    INVARIANT_TARGETS = {"crystal_system", "space_group_symbol",
                         "space_group_number"}

    def __init__(self, dataset, p_species: float, seed: int = 0):
        self.dataset = dataset
        self.p_species = float(p_species)
        self.seed = int(seed)
        targets = set(getattr(dataset, "text_targets", []) or [])
        # composition columns are rebuilt from the substituted types; the
        # free-form "prompt" column is rewritten token-wise (substitution is
        # a 1:1 symbol rename, rewrite_formula_tokens) — only targets
        # outside this set would train prompt/structure DISAGREEMENT
        self.enabled = targets <= ({"composition", "prompt"}
                                   | self.INVARIANT_TARGETS)

    def __len__(self) -> int:
        return len(self.dataset)

    def natoms(self) -> np.ndarray:
        return self.dataset.natoms()

    def __getitem__(self, idx: int) -> Dict:
        item = dict(self.dataset[idx])
        if not self.enabled:
            return item
        rng = np.random.default_rng((self.seed, idx))
        new_types = substitute_types(item["atom_types"], rng, self.p_species)
        if new_types is None:
            return item
        s = lattice_scale(item["atom_types"], new_types)
        mapping = symbol_mapping(item["atom_types"], new_types)
        item["atom_types"] = new_types
        item["lattice"] = np.asarray(item["lattice"], dtype=np.float32) * s
        if "text" in item:
            item["text"] = self._rewrite_text(idx, new_types, mapping)
        return item

    def _rewrite_text(self, idx: int, new_types: np.ndarray,
                      mapping: Dict[str, str]) -> str:
        """Rebuild the conditioning text for the substituted structure:
        composition columns from the new types, the free-form prompt by
        renaming its formula tokens; invariant targets (crystal_system, ...)
        pass through unchanged."""
        targets = list(getattr(self.dataset, "text_targets", []) or [])
        row = dict(self.dataset.rows[idx])
        row["composition"] = composition_text(new_types)
        if "prompt" in targets:
            row["prompt"] = rewrite_formula_tokens(
                str(row.get("prompt", "")), mapping)
        if len(targets) <= 1:
            return str(row[targets[0]]) if targets else ""
        return ", ".join(f"{t}: {row[t]}" for t in targets)
