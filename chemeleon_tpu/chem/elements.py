"""Periodic-table data (standalone — this environment has no pymatgen/ase).

Atom-type convention follows the reference: index 0 is the dummy/absorbing
D3PM class, 1..103 are elements H..Lr (reference config.py:31 ``max_atoms =
103 + 1``; schema.py:60-62 clamps types > 103 to 0).
"""

from __future__ import annotations

from typing import Dict, List

# Z = 1..103 (H..Lr)
SYMBOLS: List[str] = [
    "X",  # 0: dummy / absorbing state
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca",
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr", "Y", "Zr",
    "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn",
    "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd",
    "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb",
    "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
    "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm",
    "Md", "No", "Lr",
]

Z_BY_SYMBOL: Dict[str, int] = {s: z for z, s in enumerate(SYMBOLS)}

MAX_Z = 103

# Pauling electronegativities (None where undefined). Used by the SMACT-style
# validity screen (reference navigate_chemical_system.py uses smact).
ELECTRONEGATIVITY: Dict[str, float] = {
    "H": 2.20, "He": 0.0, "Li": 0.98, "Be": 1.57, "B": 2.04, "C": 2.55,
    "N": 3.04, "O": 3.44, "F": 3.98, "Ne": 0.0, "Na": 0.93, "Mg": 1.31,
    "Al": 1.61, "Si": 1.90, "P": 2.19, "S": 2.58, "Cl": 3.16, "Ar": 0.0,
    "K": 0.82, "Ca": 1.00, "Sc": 1.36, "Ti": 1.54, "V": 1.63, "Cr": 1.66,
    "Mn": 1.55, "Fe": 1.83, "Co": 1.88, "Ni": 1.91, "Cu": 1.90, "Zn": 1.65,
    "Ga": 1.81, "Ge": 2.01, "As": 2.18, "Se": 2.55, "Br": 2.96, "Kr": 3.00,
    "Rb": 0.82, "Sr": 0.95, "Y": 1.22, "Zr": 1.33, "Nb": 1.60, "Mo": 2.16,
    "Tc": 1.90, "Ru": 2.20, "Rh": 2.28, "Pd": 2.20, "Ag": 1.93, "Cd": 1.69,
    "In": 1.78, "Sn": 1.96, "Sb": 2.05, "Te": 2.10, "I": 2.66, "Xe": 2.60,
    "Cs": 0.79, "Ba": 0.89, "La": 1.10, "Ce": 1.12, "Pr": 1.13, "Nd": 1.14,
    "Pm": 1.13, "Sm": 1.17, "Eu": 1.20, "Gd": 1.20, "Tb": 1.10, "Dy": 1.22,
    "Ho": 1.23, "Er": 1.24, "Tm": 1.25, "Yb": 1.10, "Lu": 1.27, "Hf": 1.30,
    "Ta": 1.50, "W": 2.36, "Re": 1.90, "Os": 2.20, "Ir": 2.20, "Pt": 2.28,
    "Au": 2.54, "Hg": 2.00, "Tl": 1.62, "Pb": 2.33, "Bi": 2.02, "Po": 2.00,
    "At": 2.20, "Rn": 2.20, "Fr": 0.70, "Ra": 0.90, "Ac": 1.10, "Th": 1.30,
    "Pa": 1.50, "U": 1.38, "Np": 1.36, "Pu": 1.28, "Am": 1.30, "Cm": 1.30,
    "Bk": 1.30, "Cf": 1.30, "Es": 1.30, "Fm": 1.30, "Md": 1.30, "No": 1.30,
    "Lr": 1.30,
}

# Common oxidation states per element (curated, SMACT-style). Used for the
# charge-neutrality screen in chemical-system navigation.
OXIDATION_STATES: Dict[str, List[int]] = {
    "H": [-1, 1], "He": [], "Li": [1], "Be": [2], "B": [3], "C": [-4, -3, -2, -1, 1, 2, 3, 4],
    "N": [-3, 3, 5], "O": [-2], "F": [-1], "Ne": [],
    "Na": [1], "Mg": [2], "Al": [3], "Si": [-4, 4], "P": [-3, 3, 5],
    "S": [-2, 2, 4, 6], "Cl": [-1, 1, 3, 5, 7], "Ar": [], "K": [1], "Ca": [2],
    "Sc": [3], "Ti": [2, 3, 4], "V": [2, 3, 4, 5], "Cr": [2, 3, 6],
    "Mn": [2, 3, 4, 6, 7], "Fe": [2, 3], "Co": [2, 3], "Ni": [2, 3],
    "Cu": [1, 2], "Zn": [2], "Ga": [3], "Ge": [-4, 2, 4], "As": [-3, 3, 5],
    "Se": [-2, 2, 4, 6], "Br": [-1, 1, 3, 5, 7], "Kr": [2], "Rb": [1], "Sr": [2],
    "Y": [3], "Zr": [4], "Nb": [3, 5], "Mo": [2, 3, 4, 5, 6], "Tc": [4, 7],
    "Ru": [2, 3, 4, 8], "Rh": [3], "Pd": [2, 4], "Ag": [1], "Cd": [2],
    "In": [1, 3], "Sn": [2, 4], "Sb": [-3, 3, 5], "Te": [-2, 2, 4, 6],
    "I": [-1, 1, 3, 5, 7], "Xe": [2, 4, 6, 8], "Cs": [1], "Ba": [2],
    "La": [3], "Ce": [3, 4], "Pr": [3, 4], "Nd": [3], "Pm": [3], "Sm": [2, 3],
    "Eu": [2, 3], "Gd": [3], "Tb": [3, 4], "Dy": [3], "Ho": [3], "Er": [3],
    "Tm": [2, 3], "Yb": [2, 3], "Lu": [3], "Hf": [4], "Ta": [5],
    "W": [2, 3, 4, 5, 6], "Re": [2, 4, 6, 7], "Os": [2, 3, 4, 6, 8],
    "Ir": [3, 4], "Pt": [2, 4], "Au": [1, 3], "Hg": [1, 2], "Tl": [1, 3],
    "Pb": [2, 4], "Bi": [3, 5], "Po": [-2, 2, 4], "At": [-1, 1], "Rn": [2],
    "Fr": [1], "Ra": [2], "Ac": [3], "Th": [4], "Pa": [4, 5], "U": [3, 4, 5, 6],
    "Np": [3, 4, 5, 6, 7], "Pu": [3, 4, 5, 6], "Am": [3, 4, 5, 6], "Cm": [3],
    "Bk": [3, 4], "Cf": [3], "Es": [3], "Fm": [3], "Md": [2, 3], "No": [2, 3],
    "Lr": [3],
}

# Covalent radii in Angstrom (Cordero et al. 2008; approximate where data is
# sparse). Used for visualization and optional overlap checks.
COVALENT_RADII: Dict[str, float] = {
    "H": 0.31, "He": 0.28, "Li": 1.28, "Be": 0.96, "B": 0.84, "C": 0.76,
    "N": 0.71, "O": 0.66, "F": 0.57, "Ne": 0.58, "Na": 1.66, "Mg": 1.41,
    "Al": 1.21, "Si": 1.11, "P": 1.07, "S": 1.05, "Cl": 1.02, "Ar": 1.06,
    "K": 2.03, "Ca": 1.76, "Sc": 1.70, "Ti": 1.60, "V": 1.53, "Cr": 1.39,
    "Mn": 1.39, "Fe": 1.32, "Co": 1.26, "Ni": 1.24, "Cu": 1.32, "Zn": 1.22,
    "Ga": 1.22, "Ge": 1.20, "As": 1.19, "Se": 1.20, "Br": 1.20, "Kr": 1.16,
    "Rb": 2.20, "Sr": 1.95, "Y": 1.90, "Zr": 1.75, "Nb": 1.64, "Mo": 1.54,
    "Tc": 1.47, "Ru": 1.46, "Rh": 1.42, "Pd": 1.39, "Ag": 1.45, "Cd": 1.44,
    "In": 1.42, "Sn": 1.39, "Sb": 1.39, "Te": 1.38, "I": 1.39, "Xe": 1.40,
    "Cs": 2.44, "Ba": 2.15, "La": 2.07, "Ce": 2.04, "Pr": 2.03, "Nd": 2.01,
    "Pm": 1.99, "Sm": 1.98, "Eu": 1.98, "Gd": 1.96, "Tb": 1.94, "Dy": 1.92,
    "Ho": 1.92, "Er": 1.89, "Tm": 1.90, "Yb": 1.87, "Lu": 1.87, "Hf": 1.75,
    "Ta": 1.70, "W": 1.62, "Re": 1.51, "Os": 1.44, "Ir": 1.41, "Pt": 1.36,
    "Au": 1.36, "Hg": 1.32, "Tl": 1.45, "Pb": 1.46, "Bi": 1.48, "Po": 1.40,
    "At": 1.50, "Rn": 1.50, "Fr": 2.60, "Ra": 2.21, "Ac": 2.15, "Th": 2.06,
    "Pa": 2.00, "U": 1.96, "Np": 1.90, "Pu": 1.87, "Am": 1.80, "Cm": 1.69,
    "Bk": 1.68, "Cf": 1.68, "Es": 1.65, "Fm": 1.67, "Md": 1.73, "No": 1.76,
    "Lr": 1.61,
}

# JMOL CPK-style colors for visualization (hex), subset; fallback gray.
JMOL_COLORS: Dict[str, str] = {
    "H": "#FFFFFF", "He": "#D9FFFF", "Li": "#CC80FF", "Be": "#C2FF00",
    "B": "#FFB5B5", "C": "#909090", "N": "#3050F8", "O": "#FF0D0D",
    "F": "#90E050", "Ne": "#B3E3F5", "Na": "#AB5CF2", "Mg": "#8AFF00",
    "Al": "#BFA6A6", "Si": "#F0C8A0", "P": "#FF8000", "S": "#FFFF30",
    "Cl": "#1FF01F", "Ar": "#80D1E3", "K": "#8F40D4", "Ca": "#3DFF00",
    "Ti": "#BFC2C7", "Cr": "#8A99C7", "Mn": "#9C7AC7", "Fe": "#E06633",
    "Co": "#F090A0", "Ni": "#50D050", "Cu": "#C88033", "Zn": "#7D80B0",
    "Ga": "#C28F8F", "Ge": "#668F8F", "As": "#BD80E3", "Se": "#FFA100",
    "Br": "#A62929", "Sr": "#00FF00", "Y": "#94FFFF", "Zr": "#94E0E0",
    "Nb": "#73C2C9", "Mo": "#54B5B5", "Ag": "#C0C0C0", "Cd": "#FFD98F",
    "In": "#A67573", "Sn": "#668080", "Sb": "#9E63B5", "Te": "#D47A00",
    "I": "#940094", "Cs": "#57178F", "Ba": "#00C900", "La": "#70D4FF",
    "Ce": "#FFFFC7", "W": "#2194D6", "Pt": "#D0D0E0", "Au": "#FFD123",
    "Hg": "#B8B8D0", "Pb": "#575961", "Bi": "#9E4FB5", "U": "#008FFF",
}


# Standard atomic weights (IUPAC 2021 abridged; amu). Radioactive elements
# without a standard weight use their most stable isotope's mass number.
# Used for the density column in dataset preparation (reference
# data_preparation.ipynb cell 14 gets it from pymatgen's Structure.density).
ATOMIC_MASS: Dict[str, float] = {
    "H": 1.008, "He": 4.0026, "Li": 6.94, "Be": 9.0122, "B": 10.81,
    "C": 12.011, "N": 14.007, "O": 15.999, "F": 18.998, "Ne": 20.180,
    "Na": 22.990, "Mg": 24.305, "Al": 26.982, "Si": 28.085, "P": 30.974,
    "S": 32.06, "Cl": 35.45, "Ar": 39.95, "K": 39.098, "Ca": 40.078,
    "Sc": 44.956, "Ti": 47.867, "V": 50.942, "Cr": 51.996, "Mn": 54.938,
    "Fe": 55.845, "Co": 58.933, "Ni": 58.693, "Cu": 63.546, "Zn": 65.38,
    "Ga": 69.723, "Ge": 72.630, "As": 74.922, "Se": 78.971, "Br": 79.904,
    "Kr": 83.798, "Rb": 85.468, "Sr": 87.62, "Y": 88.906, "Zr": 91.224,
    "Nb": 92.906, "Mo": 95.95, "Tc": 98.0, "Ru": 101.07, "Rh": 102.91,
    "Pd": 106.42, "Ag": 107.87, "Cd": 112.41, "In": 114.82, "Sn": 118.71,
    "Sb": 121.76, "Te": 127.60, "I": 126.90, "Xe": 131.29, "Cs": 132.91,
    "Ba": 137.33, "La": 138.91, "Ce": 140.12, "Pr": 140.91, "Nd": 144.24,
    "Pm": 145.0, "Sm": 150.36, "Eu": 151.96, "Gd": 157.25, "Tb": 158.93,
    "Dy": 162.50, "Ho": 164.93, "Er": 167.26, "Tm": 168.93, "Yb": 173.05,
    "Lu": 174.97, "Hf": 178.49, "Ta": 180.95, "W": 183.84, "Re": 186.21,
    "Os": 190.23, "Ir": 192.22, "Pt": 195.08, "Au": 196.97, "Hg": 200.59,
    "Tl": 204.38, "Pb": 207.2, "Bi": 208.98, "Po": 209.0, "At": 210.0,
    "Rn": 222.0, "Fr": 223.0, "Ra": 226.0, "Ac": 227.0, "Th": 232.04,
    "Pa": 231.04, "U": 238.03, "Np": 237.0, "Pu": 244.0, "Am": 243.0,
    "Cm": 247.0, "Bk": 247.0, "Cf": 251.0, "Es": 252.0, "Fm": 257.0,
    "Md": 258.0, "No": 259.0, "Lr": 266.0,
}


def symbol_of(z: int) -> str:
    if 0 <= z < len(SYMBOLS):
        return SYMBOLS[z]
    return "X"


def z_of(symbol: str) -> int:
    return Z_BY_SYMBOL[symbol]
