"""Rebuild the mp-40 dataset from a raw structure dump — the offline analog
of the reference's data-preparation pipeline (reference
data/mp-40/data_preparation.ipynb, cells 8-29).

The reference notebook queries the Materials Project API (zero egress in
this image) and leans on pymatgen/pandas/pandarallel; this script consumes
a LOCAL dump — a CSV with at minimum ``material_id`` and ``cif`` columns
(``energy_above_hull``, ``band_gap``, ``created_at`` used when present) —
and reproduces the published pipeline end to end with the in-repo chem
stack:

1. **Filters** (notebook cells 11-13): ≤ ``--max-sites`` sites (40),
   ``energy_above_hull`` ≤ 0.25 eV when the column exists, drop
   single-element compositions of the excluded-gas list, drop cells with
   any lattice length > 20 Å.
2. **Property columns** (cell 14): ``composition`` (reduced counts,
   alphabetical, explicit multiplicity — the mp-40 column format),
   ``volume``, ``density`` (g/cm³ from chem.elements.ATOMIC_MASS),
   ``atomic_density`` (the published CSVs duplicate ``density`` here; kept
   byte-compatible), ``crystal_system`` via in-repo symmetry-operation
   detection (chem/symmetry.py, symprec=0.1 semantics);
   ``space_group_symbol``/``space_group_number`` require full space-group
   identification — filled from pymatgen when installed, else passed
   through from the dump or left empty (documented deviation, PARITY.md).
3. **Time split** (cells 16-20): merge ``created_at`` from
   data/mp-40/mp-created-at.csv when the dump lacks it; rows created
   before the cutoff (2018-08-04) are shuffled into train/val (90/10,
   seed 42), the rest become test.
4. **Prompt column** (cells 23-25): deterministic template captions via
   scripts/generate_text_prompt.py (an OpenAI-compatible endpoint is used
   when configured there).
5. **Lattice stats** (cells 27-29): train-set mean/std of the 6 lattice
   parameters → ``lattice_params.txt``.

Usage:
    python -m chemeleon_tpu.scripts.prepare_dataset \
        --dump raw_dump.csv --out-dir data/my-mp40
"""

from __future__ import annotations

import argparse
import csv
import random
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from chemeleon_tpu.chem.cif import parse_cif, write_cif
from chemeleon_tpu.chem.elements import ATOMIC_MASS
from chemeleon_tpu.chem.lattice import crystal_system_from_lattice
from chemeleon_tpu.chem.symmetry import crystal_system as detect_system
from chemeleon_tpu.data.augment import composition_text

REPO = Path(__file__).resolve().parents[2]
CREATED_AT_CSV = REPO / "data" / "mp-40" / "mp-created-at.csv"

# single-element compositions excluded upstream (notebook cell 12)
EXCLUDED_GAS = {"H", "He", "N", "O", "F", "Ne", "Cl", "Ar", "Kr", "Xe",
                "Rn", "Fr", "Og"}

AMU_PER_A3_TO_G_PER_CM3 = 1.66053906892

CUTOFF = "2018-08-04"


def passes_filters(crystal, row: Dict[str, str], max_sites: int = 40,
                   max_e_hull: float = 0.25,
                   max_lattice: float = 20.0) -> bool:
    """The mp-40 selection filters (notebook cells 11-13)."""
    if len(crystal) > max_sites:
        return False
    e_hull = row.get("energy_above_hull")
    if e_hull not in (None, ""):
        if float(e_hull) > max_e_hull:
            return False
    symbols = set(crystal.symbols)
    if len(symbols) == 1 and next(iter(symbols)) in EXCLUDED_GAS:
        return False
    a, b, c = crystal.lattice_params[:3]
    if max(a, b, c) > max_lattice:
        return False
    return True


def density_g_cm3(crystal) -> float:
    mass = sum(ATOMIC_MASS[s] for s in crystal.symbols)
    return mass / crystal.volume * AMU_PER_A3_TO_G_PER_CM3


def _space_group(crystal) -> Optional[Dict[str, str]]:
    """Space-group symbol/number with SpacegroupAnalyzer(symprec=0.1)
    semantics (reference data_preparation.ipynb cell 14). pymatgen when
    installed; otherwise the in-repo identifier (chem/spacegroup.py:
    analytic op fingerprint + the mp-40-calibrated table — measured
    agreement in results/spacegroup_calibration.json). Returns None only
    when neither resolves, and the caller falls back to the input row's
    existing columns."""
    try:
        from pymatgen.core import Structure
        from pymatgen.symmetry.analyzer import SpacegroupAnalyzer
    except ImportError:
        from chemeleon_tpu.chem.spacegroup import identify
        out = identify(crystal, symprec=0.1)
        return out if out["space_group_number"] else None
    st = Structure.from_str(crystal.to_cif(), fmt="cif")
    sg = SpacegroupAnalyzer(st, symprec=0.1)
    return {"space_group_symbol": sg.get_space_group_symbol(),
            "space_group_number": str(sg.get_space_group_number())}


def property_columns(crystal, row: Dict[str, str]) -> Dict[str, str]:
    """Notebook cell 14's calculate_property, via the in-repo chem stack."""
    try:
        system = detect_system(crystal)
    except Exception:  # degenerate cells: geometric fallback
        system = crystal_system_from_lattice(crystal.lattice)
    dens = density_g_cm3(crystal)
    out = {
        "composition": composition_text(crystal.atom_types),
        "volume": repr(crystal.volume),
        "density": repr(dens),
        # the published mp-40 CSVs carry density twice (cell 14 assigns
        # st.density to both columns); byte-compatible schema kept
        "atomic_density": repr(dens),
        "crystal_system": system,
    }
    sg = _space_group(crystal)
    if sg is not None:
        out.update(sg)
    else:
        out.setdefault("space_group_symbol",
                       row.get("space_group_symbol", ""))
        out.setdefault("space_group_number",
                       row.get("space_group_number", ""))
    return out


def _parse_created_at(s: str) -> datetime:
    # accept both "YYYY-mm-dd HH:MM:SS" and ISO "T"-separated timestamps
    # (Materials Project API exports use the latter)
    return datetime.strptime(s.split(".")[0].replace("T", " "),
                             "%Y-%m-%d %H:%M:%S")


def load_created_at(path: Path = CREATED_AT_CSV) -> Dict[str, str]:
    if not path.exists():
        return {}
    with open(path) as f:
        return {r["material_id"]: r["created_at"] for r in csv.DictReader(f)}


def prepare(dump: str, out_dir: str, max_sites: int = 40,
            max_e_hull: float = 0.25, max_lattice: float = 20.0,
            cutoff: str = CUTOFF, val_frac: float = 0.1,
            seed: int = 42, limit: Optional[int] = None) -> Dict[str, int]:
    csv.field_size_limit(10 ** 9)
    with open(dump) as f:
        raw = list(csv.DictReader(f))
    if limit:
        raw = raw[:limit]
    created = load_created_at()

    rows: List[Dict[str, str]] = []
    n_dropped = n_unparsed = 0
    for r in raw:
        try:
            crystal = parse_cif(r["cif"])
        except Exception:
            n_unparsed += 1
            continue
        if not passes_filters(crystal, r, max_sites, max_e_hull,
                              max_lattice):
            n_dropped += 1
            continue
        row = {"material_id": r["material_id"],
               "energy_above_hull": r.get("energy_above_hull", ""),
               "band_gap": r.get("band_gap", ""),
               "cif": r.get("cif") or write_cif(crystal)}
        row.update(property_columns(crystal, r))
        ca = r.get("created_at") or created.get(r["material_id"], "")
        row["created_at"] = ca
        row["created_at_datetime"] = (
            _parse_created_at(ca).strftime("%Y-%m-%d %H:%M:%S") if ca
            else "")
        rows.append(row)

    # de-dup + deterministic shuffle (notebook cell 13: drop_duplicates +
    # sample(frac=1, random_state=42))
    seen = set()
    rows = [r for r in rows
            if not (r["material_id"] in seen or seen.add(r["material_id"]))]
    random.Random(seed).shuffle(rows)

    cutoff_dt = datetime.strptime(cutoff, "%Y-%m-%d")
    dated = [r for r in rows if r["created_at"]]
    undated = len(rows) - len(dated)
    # undated rows cannot leak future structures into train, so route them
    # to the train side of the time split instead of dropping them
    train_val = [r for r in dated
                 if _parse_created_at(r["created_at"]) < cutoff_dt]
    train_val += [r for r in rows if not r["created_at"]]
    # re-shuffle so the appended undated rows don't all land in the
    # tail-sliced val split
    random.Random(seed + 1).shuffle(train_val)
    test = [r for r in dated
            if _parse_created_at(r["created_at"]) >= cutoff_dt]
    n_val = int(len(train_val) * val_frac)
    splits = {"train": train_val[:-n_val] if n_val else train_val,
              "val": train_val[-n_val:] if n_val else [],
              "test": test}

    # prompt captions (template engine; LLM endpoint when configured)
    from chemeleon_tpu.scripts.generate_text_prompt import template_prompt
    rng = random.Random(seed)
    for split_rows in splits.values():
        for i, r in enumerate(split_rows):
            r["index"] = str(i)
            r["prompt"] = template_prompt(r, rng)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    fieldnames = ["index", "material_id", "energy_above_hull", "band_gap",
                  "cif", "composition", "volume", "density",
                  "atomic_density", "crystal_system", "space_group_symbol",
                  "space_group_number", "created_at", "created_at_datetime",
                  "prompt"]
    for split, split_rows in splits.items():
        with open(out / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(split_rows)

    # train-set lattice statistics (notebook cells 27-29)
    if splits["train"]:
        params = np.array([parse_cif(r["cif"]).lattice_params
                           for r in splits["train"]], np.float64)
        with open(out / "lattice_params.txt", "w") as f:
            f.write(f"mean: {params.mean(axis=0).tolist()}\n")
            f.write(f"std: {params.std(axis=0).tolist()}\n")

    stats = {"input": len(raw), "kept": len(rows), "filtered": n_dropped,
             "unparsed": n_unparsed, "undated": undated,
             **{k: len(v) for k, v in splits.items()}}
    print(stats)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", required=True,
                    help="raw CSV with material_id + cif columns")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--max-sites", type=int, default=40)
    ap.add_argument("--max-e-hull", type=float, default=0.25)
    ap.add_argument("--max-lattice", type=float, default=20.0)
    ap.add_argument("--cutoff", default=CUTOFF,
                    help="test split = rows created on/after this date")
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()
    prepare(args.dump, args.out_dir, args.max_sites, args.max_e_hull,
            args.max_lattice, args.cutoff, args.val_frac, args.seed,
            args.limit)


if __name__ == "__main__":
    main()
