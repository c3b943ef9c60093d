"""High-level chemistry API (the RDKit-shaped surface the rest of the
framework uses). Every function is total: invalid input returns None/False
rather than raising, mirroring how the reference treats MolFromSmiles=None."""

from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np

from . import canonical, fingerprint, properties, smiles


def is_valid(s: str) -> bool:
    return smiles.is_valid(s)


def canonicalize(s: str) -> Optional[str]:
    return canonical.canonical_smiles(s)


def randomize(s: str, rng: Optional[random.Random] = None) -> Optional[str]:
    return canonical.randomize_smiles(s, rng)


def mol_formula(s: str) -> Optional[str]:
    return properties.smiles_formula(s)


def exact_mol_wt(s: str) -> Optional[float]:
    return properties.smiles_exact_wt(s)


def mol_wt(s: str) -> Optional[float]:
    return properties.smiles_mol_wt(s)


def morgan_fp(s: str, radius: int = 2, n_bits: int = 512) -> Optional[np.ndarray]:
    return fingerprint.smiles_fingerprint(s, radius, n_bits)


def tanimoto(s1: str, s2: str) -> Optional[float]:
    return fingerprint.smiles_tanimoto(s1, s2)


def validity_fraction(smiles_list: Sequence[str]) -> float:
    """Fraction of parseable SMILES (reference get_validity_term)."""
    if not smiles_list:
        return 0.0
    return sum(1 for s in smiles_list if is_valid(s)) / len(smiles_list)


def exact_match(gen: str, target: str) -> bool:
    """Structure identity = equal canonical SMILES (stronger and cheaper
    than the reference's tanimoto==1.0 criterion)."""
    cg, ct = canonicalize(gen), canonicalize(target)
    return cg is not None and cg == ct
