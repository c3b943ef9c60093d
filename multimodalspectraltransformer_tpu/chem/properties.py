"""Molecular formula and weights (first-party RDKit-descriptor equivalents).

Reference touchpoints: ``rdMolDescriptors.CalcMolFormula`` and
``CalcExactMolWt`` feed the MF tokens and the MW conditioning token in the
dataloader (`dataloaders_pl_v15_4.py:439-443`); ``Descriptors.MolWt`` feeds
the MW candidate filter (`helper_functions_pl_v15_4.py:211-216`,
`mmt_result_test_functions_15_4.py:1083`).
"""

from __future__ import annotations

from collections import Counter

from .elements import MASSES
from .smiles import Mol, parse_smiles


def element_counts(mol: Mol) -> Counter:
    counts: Counter = Counter()
    for i, a in enumerate(mol.atoms):
        counts[a.symbol] += 1
        counts["H"] += mol.total_h(i)
    if counts["H"] == 0:
        del counts["H"]
    return counts


def mol_formula(mol: Mol) -> str:
    """Hill-order molecular formula with net-charge suffix, matching
    CalcMolFormula's format (e.g. ``C9H11NO2``, ``C6H5O-``, ``CH6N+2``... we
    use RDKit's style ``+``/``-``/``+2``)."""
    counts = element_counts(mol)
    charge = sum(a.charge for a in mol.atoms)

    def fmt(sym: str) -> str:
        c = counts[sym]
        return f"{sym}{c if c > 1 else ''}"

    parts = []
    if counts.get("C"):
        parts.append(fmt("C"))
        if counts.get("H"):
            parts.append(fmt("H"))
        rest = sorted(k for k in counts if k not in ("C", "H"))
    else:
        rest = sorted(counts)
    parts.extend(fmt(s) for s in rest)
    if charge:
        sign = "+" if charge > 0 else "-"
        mag = abs(charge)
        parts.append(sign if mag == 1 else f"{sign}{mag}")
    return "".join(parts)


def exact_mol_wt(mol: Mol) -> float:
    """Monoisotopic mass (CalcExactMolWt equivalent)."""
    total = 0.0
    for i, a in enumerate(mol.atoms):
        mono, _avg = MASSES[a.symbol]
        total += mono
        if a.isotope:
            # approximate a labeled isotope by its nominal-mass offset from
            # the principal isotope (adequate for D/T and 13C labels)
            total += a.isotope - round(mono)
        total += mol.total_h(i) * MASSES["H"][0]
    return total


def mol_wt(mol: Mol) -> float:
    """Average molecular weight (Descriptors.MolWt equivalent)."""
    total = 0.0
    for i, a in enumerate(mol.atoms):
        total += MASSES[a.symbol][1]
        total += mol.total_h(i) * MASSES["H"][1]
    return total


def smiles_formula(smiles: str) -> str | None:
    try:
        return mol_formula(parse_smiles(smiles))
    except Exception:
        return None


def smiles_exact_wt(smiles: str) -> float | None:
    try:
        return exact_mol_wt(parse_smiles(smiles))
    except Exception:
        return None


def smiles_mol_wt(smiles: str) -> float | None:
    try:
        return mol_wt(parse_smiles(smiles))
    except Exception:
        return None
