"""Molecule -> dense padded graph tensors for on-device GNNs.

The reference round-trips every molecule through disk (mol -> SDF -> npz ->
DGL sparse graph -> GPU) per prediction batch (`sgnn_code_pl_v15_4.py:
458-573`). Here featurization is pure in-memory numpy producing *static
shapes*: one [N_max, F] node-feature block plus per-bond-type dense
adjacency [T, N_max, N_max], so message passing on TPU is a handful of
batched matmuls on the MXU — no scatter/gather, no disk.

Node features follow the same chemistry signals as the reference's
sparsified SGNN featurization (`sgnn_code_pl_v15_4.py:52-61,294`): element
one-hot, degree, total H count, formal charge, aromaticity, ring membership.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..chem.smiles import Mol, parse_smiles

ELEMENTS = ("C", "N", "O", "S", "F", "Cl", "Br", "I", "P", "B")  # + other
N_ELEM = len(ELEMENTS) + 1
MAX_DEGREE = 5
MAX_H = 4
NODE_FEATURES = N_ELEM + (MAX_DEGREE + 1) + (MAX_H + 1) + 3  # charge, aromatic, ring
BOND_TYPES = 4  # single, double, triple, aromatic


@dataclass
class DenseGraph:
    nodes: np.ndarray  # [N_max, NODE_FEATURES] float32
    adj: np.ndarray  # [BOND_TYPES, N_max, N_max] float32 (symmetric 0/1)
    node_mask: np.ndarray  # [N_max] float32
    n_atoms: int


def featurize_mol(mol: Mol, max_nodes: int = 64) -> Optional[DenseGraph]:
    n = mol.num_atoms
    if n > max_nodes:
        return None
    nodes = np.zeros((max_nodes, NODE_FEATURES), np.float32)
    adj = np.zeros((BOND_TYPES, max_nodes, max_nodes), np.float32)
    mask = np.zeros(max_nodes, np.float32)
    for i, a in enumerate(mol.atoms):
        f = nodes[i]
        idx = ELEMENTS.index(a.symbol) if a.symbol in ELEMENTS else N_ELEM - 1
        f[idx] = 1.0
        f[N_ELEM + min(mol.degree(i), MAX_DEGREE)] = 1.0
        f[N_ELEM + MAX_DEGREE + 1 + min(mol.total_h(i), MAX_H)] = 1.0
        base = N_ELEM + MAX_DEGREE + 1 + MAX_H + 1
        f[base] = float(a.charge)
        f[base + 1] = float(a.aromatic)
        f[base + 2] = float(a.in_ring)
        mask[i] = 1.0
    for b in mol.bonds:
        t = 3 if b.aromatic else b.order - 1
        adj[t, b.a1, b.a2] = 1.0
        adj[t, b.a2, b.a1] = 1.0
    return DenseGraph(nodes, adj, mask, n)


def featurize_smiles(smiles: str, max_nodes: int = 64) -> Optional[DenseGraph]:
    try:
        return featurize_mol(parse_smiles(smiles), max_nodes)
    except Exception:
        return None


def batch_graphs(graphs: Sequence[DenseGraph]) -> dict:
    """Stack graphs into a device-ready batch dict."""
    return {
        "nodes": np.stack([g.nodes for g in graphs]),
        "adj": np.stack([g.adj for g in graphs]),
        "node_mask": np.stack([g.node_mask for g in graphs]),
    }
