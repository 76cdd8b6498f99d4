"""Minimal CIF reader/writer (standalone — no pymatgen in this environment).

Writer emits P1 CIFs in the same style pymatgen's CifWriter produces (what the
reference pipeline writes, sample_prompt.py:38-43). Reader handles the mp-40
dataset CIFs (pymatgen-generated, P1) and general symmetry-op CIFs via
``_symmetry_equiv_pos_as_xyz`` expansion.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from chemeleon_tpu.chem.elements import Z_BY_SYMBOL, symbol_of
from chemeleon_tpu.chem.lattice import lattice_from_parameters, lattice_parameters


def write_cif(crystal, name: Optional[str] = None) -> str:
    a, b, c, alpha, beta, gamma = crystal.lattice_params
    name = name or crystal.reduced_formula()
    comp = crystal.composition
    formula_sum = " ".join(f"{el}{n}" for el, n in sorted(comp.items()))
    lines = [
        "# generated using chemeleon-tpu",
        f"data_{name}",
        "_symmetry_space_group_name_H-M   'P 1'",
        f"_cell_length_a   {a:.8f}",
        f"_cell_length_b   {b:.8f}",
        f"_cell_length_c   {c:.8f}",
        f"_cell_angle_alpha   {alpha:.8f}",
        f"_cell_angle_beta   {beta:.8f}",
        f"_cell_angle_gamma   {gamma:.8f}",
        "_symmetry_Int_Tables_number   1",
        f"_chemical_formula_structural   {name}",
        f"_chemical_formula_sum   '{formula_sum}'",
        f"_cell_volume   {crystal.volume:.8f}",
        "_cell_formula_units_Z   1",
        "loop_",
        " _symmetry_equiv_pos_site_id",
        " _symmetry_equiv_pos_as_xyz",
        "  1  'x, y, z'",
        "loop_",
        " _atom_site_type_symbol",
        " _atom_site_label",
        " _atom_site_symmetry_multiplicity",
        " _atom_site_fract_x",
        " _atom_site_fract_y",
        " _atom_site_fract_z",
        " _atom_site_occupancy",
    ]
    for i, (z, fc) in enumerate(zip(crystal.atom_types, crystal.frac_coords)):
        s = symbol_of(int(z))
        lines.append(f"  {s}  {s}{i}  1  {fc[0]:.8f}  {fc[1]:.8f}  "
                     f"{fc[2]:.8f}  1")
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_NUM_RE = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def _parse_number(tok: str) -> float:
    """CIF numbers may carry uncertainties like 1.234(5)."""
    m = _NUM_RE.match(tok)
    if not m:
        raise ValueError(f"not a number: {tok!r}")
    return float(m.group(0))


def _tokenize_line(line: str) -> List[str]:
    """Split a CIF data line respecting quotes."""
    toks, cur, q = [], "", None
    for ch in line:
        if q:
            if ch == q:
                q = None
            else:
                cur += ch
        elif ch in "'\"":
            q = ch
        elif ch.isspace():
            if cur:
                toks.append(cur)
                cur = ""
        else:
            cur += ch
    if cur:
        toks.append(cur)
    return toks


def _parse_symmetry_op(op: str):
    """'x, y, z' style op -> (rot [3,3], trans [3])."""
    rot = np.zeros((3, 3))
    trans = np.zeros(3)
    for i, part in enumerate(op.split(",")):
        part = part.strip().lower().replace(" ", "")
        # terms like -x, +1/2, 0.5, y
        for m in re.finditer(r"([+-]?)(\d+/\d+|\d*\.?\d+)?\*?([xyz])?", part):
            sign, num, var = m.groups()
            if num is None and var is None:
                continue
            s = -1.0 if sign == "-" else 1.0
            if num is not None and "/" in num:
                p, q = num.split("/")
                val = float(p) / float(q)
            elif num is not None and num != "":
                val = float(num)
            else:
                val = 1.0
            if var is not None:
                rot[i, "xyz".index(var)] += s * val
            else:
                trans[i] += s * val
    return rot, trans


def parse_cif(text: str):
    """Parse the first data block of a CIF into a Crystal."""
    from chemeleon_tpu.chem.structure import Crystal

    scalars: Dict[str, str] = {}
    loops: List[Tuple[List[str], List[List[str]]]] = []

    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.lower().startswith("loop_"):
            i += 1
            headers = []
            while i < len(lines) and lines[i].strip().startswith("_"):
                headers.append(lines[i].strip().split()[0].lower())
                i += 1
            rows = []
            while i < len(lines):
                row_line = lines[i].strip()
                if (not row_line or row_line.startswith("_")
                        or row_line.lower().startswith(("loop_", "data_"))
                        or row_line.startswith("#")):
                    break
                toks = _tokenize_line(row_line)
                # multi-line rows: accumulate until enough tokens
                while len(toks) < len(headers) and i + 1 < len(lines):
                    i += 1
                    toks += _tokenize_line(lines[i].strip())
                rows.append(toks)
                i += 1
            loops.append((headers, rows))
            continue
        if line.startswith("_"):
            toks = _tokenize_line(line)
            key = toks[0].lower()
            if len(toks) > 1:
                scalars[key] = " ".join(toks[1:])
            elif i + 1 < len(lines) and lines[i + 1].strip().startswith(";"):
                # multi-line text field
                i += 1
                val = []
                i += 1
                while i < len(lines) and not lines[i].strip().startswith(";"):
                    val.append(lines[i])
                    i += 1
                scalars[key] = "\n".join(val)
            i += 1
            continue
        i += 1

    def need(key):
        if key not in scalars:
            raise ValueError(f"CIF missing {key}")
        return _parse_number(scalars[key])

    a = need("_cell_length_a")
    b = need("_cell_length_b")
    c = need("_cell_length_c")
    alpha = need("_cell_angle_alpha")
    beta = need("_cell_angle_beta")
    gamma = need("_cell_angle_gamma")
    lattice = lattice_from_parameters(a, b, c, alpha, beta, gamma)

    # symmetry ops
    ops = [("x, y, z")]
    for headers, rows in loops:
        if any("_symmetry_equiv_pos_as_xyz" in h or
               "_space_group_symop_operation_xyz" in h for h in headers):
            col = next(j for j, h in enumerate(headers)
                       if "as_xyz" in h or "operation_xyz" in h)
            ops = [r[col] for r in rows if len(r) > col]
            break

    # atom sites
    species: List[int] = []
    coords: List[List[float]] = []
    for headers, rows in loops:
        if "_atom_site_fract_x" not in headers:
            continue
        ix = headers.index("_atom_site_fract_x")
        iy = headers.index("_atom_site_fract_y")
        iz = headers.index("_atom_site_fract_z")
        if "_atom_site_type_symbol" in headers:
            isym = headers.index("_atom_site_type_symbol")
        else:
            isym = headers.index("_atom_site_label")
        for r in rows:
            if len(r) <= max(ix, iy, iz, isym):
                continue
            sym = re.match(r"[A-Z][a-z]?", r[isym])
            if not sym or sym.group(0) not in Z_BY_SYMBOL:
                continue
            species.append(Z_BY_SYMBOL[sym.group(0)])
            coords.append([_parse_number(r[ix]), _parse_number(r[iy]),
                           _parse_number(r[iz])])
        break
    if not species:
        raise ValueError("CIF has no atom sites")

    base_coords = np.asarray(coords) % 1.0
    base_species = np.asarray(species)

    # expand symmetry ops, deduplicating overlapping sites
    all_coords: List[np.ndarray] = []
    all_species: List[int] = []
    for op in ops:
        rot, trans = _parse_symmetry_op(op)
        new = (base_coords @ rot.T + trans) % 1.0
        for sp, fc in zip(base_species, new):
            dup = False
            for j, existing in enumerate(all_coords):
                if all_species[j] != sp:
                    continue
                d = np.abs(existing - fc)
                d = np.minimum(d, 1.0 - d)
                if (d < 1e-4).all():
                    dup = True
                    break
            if not dup:
                all_coords.append(fc)
                all_species.append(int(sp))

    return Crystal(lattice, np.asarray(all_coords), np.asarray(all_species))
