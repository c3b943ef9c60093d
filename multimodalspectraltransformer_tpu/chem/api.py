"""High-level chemistry API (the RDKit-shaped surface the rest of the
framework uses). Every function is total: invalid input returns None/False
rather than raising, mirroring how the reference treats MolFromSmiles=None."""

from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np

from . import canonical, fingerprint, properties, smiles


def _native():
    """The C++ chemistry runtime (bit-identical mirror of this package; see
    native/chemkernel.cpp). None when no compiler is available."""
    try:
        from .. import native

        return native if native.available() else None
    except Exception:
        return None


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


def batch_is_valid(smiles_list: Sequence[str]) -> np.ndarray:
    """Validity flags for a batch (native multithreaded path when built)."""
    nat = _native()
    if nat is not None:
        return nat.batch_validity(smiles_list).astype(bool)
    return np.array([is_valid(s) for s in smiles_list], dtype=bool)


def batch_canonicalize(smiles_list: Sequence[str]) -> list[Optional[str]]:
    """Canonical SMILES per item, None where invalid. This is the accept-loop
    hot path of fan-out sampling (reference
    `mmt_result_test_functions_15_4.py:1051`); the native kernel is ~30x the
    Python implementation with identical output."""
    nat = _native()
    if nat is not None:
        return nat.batch_canonicalize(smiles_list)
    return [canonicalize(s) for s in smiles_list]


def batch_morgan_fp(
    smiles_list: Sequence[str], radius: int = 2, n_bits: int = 512
) -> tuple[np.ndarray, np.ndarray]:
    """(fps [n, n_bits] uint8, valid [n] bool); invalid rows zeroed."""
    nat = _native()
    if nat is not None:
        fps, valid = nat.batch_morgan_fp(smiles_list, radius, n_bits)
        return fps, valid.astype(bool)
    fps = np.zeros((len(smiles_list), n_bits), dtype=np.uint8)
    valid = np.zeros(len(smiles_list), dtype=bool)
    for i, s in enumerate(smiles_list):
        fp = morgan_fp(s, radius, n_bits)
        if fp is not None:
            fps[i] = fp
            valid[i] = True
    return fps, valid


def batch_mol_formula(smiles_list: Sequence[str]) -> list[Optional[str]]:
    """Molecular formula per item, None where invalid (native when built)."""
    nat = _native()
    if nat is not None:
        return nat.batch_formula(smiles_list)
    return [mol_formula(s) for s in smiles_list]


def batch_exact_mol_wt(smiles_list: Sequence[str]) -> np.ndarray:
    """Exact MW per item; NaN where invalid."""
    nat = _native()
    if nat is not None:
        return nat.batch_exact_mol_wt(smiles_list)
    return np.array(
        [w if (w := exact_mol_wt(s)) is not None else np.nan for s in smiles_list],
        dtype=np.float64,
    )


def validity_fraction(smiles_list: Sequence[str]) -> float:
    """Fraction of parseable SMILES (reference get_validity_term)."""
    if not smiles_list:
        return 0.0
    return float(np.mean(batch_is_valid(smiles_list)))


def exact_match(gen: str, target: str) -> bool:
    """Structure identity = equal canonical SMILES (stronger and cheaper
    than the reference's tanimoto==1.0 criterion)."""
    cg, ct = canonicalize(gen), canonicalize(target)
    return cg is not None and cg == ct
