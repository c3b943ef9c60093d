"""Morgan (ECFP-style) circular fingerprints + Tanimoto similarity.

First-party replacement for ``AllChem.GetMorganFingerprintAsBitVect(mol, 2,
nBits=512)`` (`dataloaders_pl_v15_4.py:652`) and the Tanimoto ranking used
throughout evaluation (`helper_functions_pl_v15_4.py` /
`mmt_result_test_functions_15_4.py:1250`). Standard ECFP construction:
per-atom invariants, radius-r neighborhood hashing with bond orders,
duplicate-environment removal, fold into nBits. Bit values are
self-consistent, not RDKit-bit-identical; tanimoto(a, a) == 1.0 and
identical molecules (any atom order) produce identical fingerprints.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .smiles import Mol, parse_smiles

_MASK = (1 << 63) - 1


def _h(*vals: int) -> int:
    acc = 1469598103934665603
    for v in vals:
        acc ^= v & 0xFFFFFFFFFFFFFFFF
        acc = (acc * 1099511628211) & _MASK
    return acc


def _atom_invariant(mol: Mol, i: int) -> int:
    a = mol.atoms[i]
    sym_code = ord(a.symbol[0]) * 256 + (ord(a.symbol[1]) if len(a.symbol) > 1 else 0)
    # ECFP-style invariant: (heavy degree, element, charge, #H, in-ring, aromatic)
    return _h(mol.degree(i), sym_code, a.charge + 16, mol.total_h(i), int(a.in_ring), int(a.aromatic))


def morgan_bits(mol: Mol, radius: int = 2, n_bits: int = 512) -> np.ndarray:
    """Binary fingerprint as a uint8 array of length n_bits."""
    n = mol.num_atoms
    ids = [_atom_invariant(mol, i) for i in range(n)]
    fp = np.zeros(n_bits, dtype=np.uint8)
    # environment tracking for duplicate removal: bond-set -> first id
    seen_envs: dict[frozenset, int] = {}
    env_bonds: list[frozenset] = [frozenset() for _ in range(n)]

    for i in range(n):
        fp[ids[i] % n_bits] = 1

    for _r in range(radius):
        new_ids = list(ids)
        new_envs = list(env_bonds)
        # ECFP duplicate-environment dedup must be ATOM-ORDER INDEPENDENT:
        # collect each bond-set's MINIMUM env id for this round (RDKit's
        # tie-break), then set bits — first-seen-wins made the fingerprint
        # depend on the SMILES atom ordering
        round_envs: dict[frozenset, int] = {}
        for i in range(n):
            neigh = []
            bonds = frozenset()
            for bi in mol.adjacency[i]:
                b = mol.bonds[bi]
                j = b.other(i)
                order_code = 4 if b.aromatic else b.order
                neigh.append((order_code, ids[j]))
                bonds = bonds | env_bonds[j] | {bi}
            neigh.sort()
            nid = _h(_r + 1, ids[i], *[x for pair in neigh for x in pair])
            new_ids[i] = nid
            new_envs[i] = bonds
            cur = round_envs.get(bonds)
            if cur is None or nid < cur:
                round_envs[bonds] = nid
        for bonds, nid in round_envs.items():
            if bonds in seen_envs:
                # environment already hashed in an earlier round -> no new
                # bit (the smaller-radius bit represents it)
                continue
            seen_envs[bonds] = nid
            fp[nid % n_bits] = 1
        ids = new_ids
        env_bonds = new_envs
    return fp


def smiles_fingerprint(smiles: str, radius: int = 2, n_bits: int = 512) -> Optional[np.ndarray]:
    try:
        return morgan_bits(parse_smiles(smiles), radius, n_bits)
    except Exception:
        return None


def tanimoto(a: np.ndarray, b: np.ndarray) -> float:
    inter = int(np.sum((a > 0) & (b > 0)))
    union = int(np.sum((a > 0) | (b > 0)))
    return inter / union if union else 0.0


def smiles_tanimoto(s1: str, s2: str, radius: int = 2, n_bits: int = 512) -> Optional[float]:
    f1 = smiles_fingerprint(s1, radius, n_bits)
    f2 = smiles_fingerprint(s2, radius, n_bits)
    if f1 is None or f2 is None:
        return None
    return tanimoto(f1, f2)


def batch_tanimoto(fps_a: np.ndarray, fps_b: np.ndarray) -> np.ndarray:
    """Pairwise tanimoto for [N, bits] x [M, bits] -> [N, M] (vectorized;
    suitable for the fingerprint vector-DB retrieval path,
    `experiment_function_v15_4.py:292-340`)."""
    a = fps_a.astype(np.float32)
    b = fps_b.astype(np.float32)
    inter = a @ b.T
    na = a.sum(axis=1, keepdims=True)
    nb = b.sum(axis=1, keepdims=True)
    union = na + nb.T - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out
