"""Molecular descriptors: H-bond donors/acceptors, rotatable bonds, Murcko
scaffold. Used by the generation-augmentation filters
(reference ``follows_lipinski`` / scaffold caps,
`molformer_functions_v15_4.py:99-125, 126-484`).
"""

from __future__ import annotations

from typing import Optional

from .canonical import canonical_ranks, write_smiles
from .smiles import Mol, parse_smiles


def h_bond_donors(mol: Mol) -> int:
    """N-H / O-H count (Lipinski HBD)."""
    return sum(
        1
        for i, a in enumerate(mol.atoms)
        if a.symbol in ("N", "O") and mol.total_h(i) > 0
    )


def h_bond_acceptors(mol: Mol) -> int:
    """N + O count (Lipinski HBA)."""
    return sum(1 for a in mol.atoms if a.symbol in ("N", "O"))


def rotatable_bonds(mol: Mol) -> int:
    """Non-ring single bonds between two non-terminal heavy atoms."""
    n = 0
    for b in mol.bonds:
        if b.order != 1 or b.aromatic:
            continue
        if mol.degree(b.a1) < 2 or mol.degree(b.a2) < 2:
            continue
        # ring membership: both atoms in a ring AND the bond itself in a
        # ring -> approximate via both-endpoint in_ring + shared ring; use
        # the conservative check (skip if both endpoints are ring atoms and
        # adjacent in a ring): a bond is a ring bond iff removing it keeps
        # endpoints connected — approximated by both in_ring & bond aromatic
        # or order handled above; use simple heuristic: skip if both in ring
        if mol.atoms[b.a1].in_ring and mol.atoms[b.a2].in_ring and _bond_in_ring(mol, b):
            continue
        n += 1
    return n


def _bond_in_ring(mol: Mol, bond) -> bool:
    """BFS from a1 to a2 avoiding the bond itself."""
    from collections import deque

    start, goal = bond.a1, bond.a2
    seen = {start}
    dq = deque([start])
    while dq:
        v = dq.popleft()
        for bi in mol.adjacency[v]:
            b2 = mol.bonds[bi]
            if b2 is bond:
                continue
            w = b2.other(v)
            if w == goal:
                return True
            if w not in seen:
                seen.add(w)
                dq.append(w)
    return False


def lipinski_ok(smiles: str, mw_limit: float = 500.0, hbd_limit: int = 5, hba_limit: int = 10) -> bool:
    """Rule-of-five check (reference follows_lipinski,
    `molformer_functions_v15_4.py:99`; the reference also checks Crippen
    logP <= 5 — logP is omitted here, documented deviation)."""
    from .properties import mol_wt

    try:
        mol = parse_smiles(smiles)
    except Exception:
        return False
    if mol_wt(mol) > mw_limit:
        return False
    if h_bond_donors(mol) > hbd_limit:
        return False
    if h_bond_acceptors(mol) > hba_limit:
        return False
    return True


def murcko_scaffold(smiles: str) -> Optional[str]:
    """Murcko framework: iteratively strip terminal (degree-1, non-ring)
    atoms; canonical SMILES of what remains. Acyclic molecules -> ''."""
    try:
        mol = parse_smiles(smiles)
    except Exception:
        return None
    keep = set(range(mol.num_atoms))
    changed = True
    while changed:
        changed = False
        for i in sorted(keep):
            if mol.atoms[i].in_ring:
                continue
            deg = sum(1 for j in mol.neighbors(i) if j in keep)
            if deg <= 1:
                keep.discard(i)
                changed = True
    if not keep:
        return ""
    # build the induced subgraph as a new Mol
    from .smiles import Atom, Mol as MolCls, finalize

    sub = MolCls()
    remap = {}
    for i in sorted(keep):
        a = mol.atoms[i]
        remap[i] = sub.add_atom(Atom(a.symbol, a.aromatic, a.charge, -1, a.isotope))
    for b in mol.bonds:
        if b.a1 in keep and b.a2 in keep:
            sub.add_bond(remap[b.a1], remap[b.a2], b.order, b.aromatic)
    try:
        finalize(sub, strict=False)
        return write_smiles(sub, ranks=canonical_ranks(sub))
    except Exception:
        return None
