"""Element data: symbols, masses, default valences.

First-party replacement for the slices of RDKit the reference leans on
(`dataloaders_pl_v15_4.py:438-443`: CalcMolFormula / CalcExactMolWt;
`helper_functions_pl_v15_4.py:211-216`: Descriptors.MolWt). Monoisotopic
masses from CODATA/NIST; average atomic weights from IUPAC 2021.
"""

from __future__ import annotations

# symbol -> (monoisotopic mass, average atomic weight)
MASSES: dict[str, tuple[float, float]] = {
    "H": (1.00782503207, 1.008),
    "He": (4.002603254, 4.002602),
    "Li": (7.01600455, 6.94),
    "Be": (9.0121822, 9.0121831),
    "B": (11.0093054, 10.81),
    "C": (12.0, 12.011),
    "N": (14.0030740048, 14.007),
    "O": (15.99491461956, 15.999),
    "F": (18.99840322, 18.998403163),
    "Ne": (19.9924401754, 20.1797),
    "Na": (22.9897692809, 22.98976928),
    "Mg": (23.9850417, 24.305),
    "Al": (26.98153863, 26.9815385),
    "Si": (27.9769265325, 28.085),
    "P": (30.97376163, 30.973761998),
    "S": (31.972071, 32.06),
    "Cl": (34.96885268, 35.45),
    "Ar": (39.9623831225, 39.948),
    "K": (38.96370668, 39.0983),
    "Ca": (39.96259098, 40.078),
    "Ti": (47.9479463, 47.867),
    "Cr": (51.9405075, 51.9961),
    "Mn": (54.9380451, 54.938044),
    "Fe": (55.9349375, 55.845),
    "Co": (58.933195, 58.933194),
    "Ni": (57.9353429, 58.6934),
    "Cu": (62.9295975, 63.546),
    "Zn": (63.9291422, 65.38),
    "Ga": (68.9255736, 69.723),
    "Ge": (73.9211778, 72.63),
    "As": (74.9215965, 74.921595),
    "Se": (79.9165213, 78.971),
    "Br": (78.9183371, 79.904),
    "Kr": (83.911507, 83.798),
    "Rb": (84.911789738, 85.4678),
    "Sr": (87.9056121, 87.62),
    "Zr": (89.9047044, 91.224),
    "Mo": (97.9054082, 95.95),
    "Ru": (101.9043493, 101.07),
    "Rh": (102.905504, 102.9055),
    "Pd": (105.903486, 106.42),
    "Ag": (106.905097, 107.8682),
    "Cd": (113.9033585, 112.414),
    "In": (114.903878, 114.818),
    "Sn": (119.9021947, 118.71),
    "Sb": (120.9038157, 121.76),
    "Te": (129.9062244, 127.6),
    "I": (126.904473, 126.90447),
    "Xe": (131.9041535, 131.293),
    "Cs": (132.905451933, 132.90545196),
    "Ba": (137.9052472, 137.327),
    "W": (183.9509312, 183.84),
    "Pt": (194.9647911, 195.084),
    "Au": (196.9665687, 196.966569),
    "Hg": (201.970643, 200.592),
    "Tl": (204.9744275, 204.38),
    "Pb": (207.9766521, 207.2),
    "Bi": (208.9803987, 208.9804),
    "U": (238.0507882, 238.02891),
}

# Default valences for implicit-H assignment (organic subset + common
# heteroatoms). Multiple entries = allowed valence states in order.
DEFAULT_VALENCES: dict[str, tuple[int, ...]] = {
    "B": (3,),
    "C": (4,),
    "N": (3,),
    "O": (2,),
    "P": (3, 5),
    "S": (2, 4, 6),
    "F": (1,),
    "Cl": (1,),
    "Br": (1,),
    "I": (1,),
    "H": (1,),
}

# Atoms the SMILES "organic subset" allows outside brackets.
ORGANIC_SUBSET: frozenset[str] = frozenset({"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"})

# Elements that may be written lowercase (aromatic) in SMILES.
AROMATIC_OK: frozenset[str] = frozenset({"b", "c", "n", "o", "p", "s", "se", "as"})
