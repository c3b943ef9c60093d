"""Canonical SMILES: Morgan-style rank refinement + deterministic DFS writer.

Replaces the reference's ``Chem.MolToSmiles(mol, canonical=True,
isomericSmiles=False)`` (`dataloaders_pl_v15_4.py:442`) for dedup and
exact-match comparison. Canonical strings are self-consistent across input
atom orderings of the same molecule (property-tested) but use this
framework's own algorithm, not RDKit's.

Also provides ``randomize_smiles`` — the training-augmentation equivalent of
the reference's SMILESAugmenter (`smi_augmenter_v15_4.py:97`): rewrite the
molecule from a random root with a randomly permuted DFS.
"""

from __future__ import annotations

import random as _random
import sys
from typing import Optional, Sequence

from .elements import DEFAULT_VALENCES, ORGANIC_SUBSET
from .smiles import Mol, SmilesError, parse_smiles

sys.setrecursionlimit(20000)

_PRIME = (1 << 61) - 1


def _hash(*vals: int) -> int:
    h = 1469598103934665603
    for v in vals:
        h ^= v & 0xFFFFFFFFFFFFFFFF
        h = (h * 1099511628211) % _PRIME
    return h


def _initial_invariants(mol: Mol) -> list[int]:
    inv = []
    for i, a in enumerate(mol.atoms):
        sym_code = ord(a.symbol[0]) * 256 + (ord(a.symbol[1]) if len(a.symbol) > 1 else 0)
        inv.append(
            _hash(
                mol.degree(i),
                int(round(mol.bond_order_sum(i) * 2)),
                sym_code,
                a.charge + 16,
                mol.total_h(i),
                int(a.aromatic),
                int(a.in_ring),
                a.isotope,
            )
        )
    return inv


def _ranks_from_invariants(inv: Sequence[int]) -> list[int]:
    rank_of = {v: r for r, v in enumerate(sorted(set(inv)))}
    return [rank_of[v] for v in inv]


def canonical_ranks(mol: Mol) -> list[int]:
    """Iterative neighborhood refinement; residual (automorphic) ties are
    broken by promoting one member of the lowest tied class and re-refining
    until the ranking is discrete."""
    n = mol.num_atoms

    def refine(ranks: list[int]) -> list[int]:
        # Refine with (old_rank, neighborhood_hash) keys: classes can only
        # split within old classes and label order is anchored to the old
        # ranks, so the vector converges (comparing raw hash-order labels
        # instead oscillates forever on symmetric molecules).
        while True:
            keys = []
            for i in range(n):
                neigh = sorted(
                    _hash(ranks[mol.bonds[bi].other(i)], mol.bonds[bi].order, int(mol.bonds[bi].aromatic))
                    for bi in mol.adjacency[i]
                )
                keys.append((ranks[i], _hash(*neigh)))
            rank_of = {k: r for r, k in enumerate(sorted(set(keys)))}
            new_ranks = [rank_of[k] for k in keys]
            if new_ranks == ranks or len(set(new_ranks)) == n:
                return new_ranks
            ranks = new_ranks

    ranks = refine(_ranks_from_invariants(_initial_invariants(mol)))
    while len(set(ranks)) < n:
        classes: dict[int, list[int]] = {}
        for i, r in enumerate(ranks):
            classes.setdefault(r, []).append(i)
        tied = min(r for r, atoms in classes.items() if len(atoms) > 1)
        chosen = min(classes[tied])
        ranks = [r * 2 + (0 if i == chosen else 1) for i, r in enumerate(ranks)]
        ranks = refine(_ranks_from_invariants(ranks))
    return ranks


def symmetry_classes(mol: Mol) -> Sequence[int]:
    """Topological equivalence classes: Morgan refinement WITHOUT the
    tie-breaking pass, so automorphic atoms (e.g. the two ortho carbons of a
    mono-substituted benzene) share a class id. This is the first-party
    replacement for the reference's canonical-rank symmetry detection
    (`data_generation_v15_4.py:765-796` find_symmetric_positions).

    Memoized on the Mol instance: the four spectrum reconstructions each
    need the classes 2-3x per molecule, and refinement dominates
    simulate_records without the cache (Mol objects are treated as
    immutable once parsed)."""
    cached = getattr(mol, "_symmetry_classes", None)
    if cached is not None:
        return cached
    n = mol.num_atoms

    def refine(ranks: list[int]) -> list[int]:
        while True:
            keys = []
            for i in range(n):
                neigh = sorted(
                    _hash(ranks[mol.bonds[bi].other(i)], mol.bonds[bi].order, int(mol.bonds[bi].aromatic))
                    for bi in mol.adjacency[i]
                )
                keys.append((ranks[i], _hash(*neigh)))
            rank_of = {k: r for r, k in enumerate(sorted(set(keys)))}
            new_ranks = [rank_of[k] for k in keys]
            if new_ranks == ranks:
                return new_ranks
            ranks = new_ranks

    result = tuple(refine(_ranks_from_invariants(_initial_invariants(mol))))
    try:
        mol._symmetry_classes = result  # tuple: immune to caller mutation
    except AttributeError:
        pass  # Mol may use __slots__ without the cache slot
    return result


def _bare_bond_order_sum(mol: Mol, i: int) -> float:
    """bond_order_sum as a RE-PARSER sees the atom when written WITHOUT
    brackets: explicit_h is then unset, so the pyrrole-type aromatic-N/P
    branch triggers only on degree 3. Using mol.bond_order_sum here (which
    consults the CURRENT atom's explicit_h) wrongly concluded a bare 'n'
    reproduces pyrrole's NH — the re-parse actually takes the pyridine
    branch and drops the hydrogen (c1cc[nH]c1 -> 'c1cccn1', MF/MW/FP of
    every NH-aromatic molecule off by one H)."""
    a = mol.atoms[i]
    total = 0.0
    n_arom = 0
    has_exo_double = False
    for bi in mol.adjacency[i]:
        b = mol.bonds[bi]
        if b.aromatic:
            n_arom += 1
        else:
            total += b.order
            if b.order == 2:
                has_exo_double = True
    if n_arom:
        if a.aromatic and a.symbol in ("O", "S", "Se", "Te"):
            total += n_arom
        elif a.aromatic and a.symbol in ("N", "P") and mol.degree(i) == 3:
            total += n_arom
        elif a.aromatic and has_exo_double:
            # exocyclic double bond carries the pi electron (pyridinone
            # c(=O) etc.) — ring bonds count single; mirrors
            # Mol.bond_order_sum
            total += n_arom
        else:
            total += n_arom + 1
    return total


def _needs_brackets(mol: Mol, i: int) -> bool:
    a = mol.atoms[i]
    if a.symbol not in ORGANIC_SUBSET or a.charge != 0 or a.isotope:
        return True
    if a.explicit_h >= 0:
        # bracket-specified H: write brackets unless a bare atom would get
        # the same implicit count back from the re-parser's valence rules
        vals = DEFAULT_VALENCES.get(a.symbol, ())
        bos = _bare_bond_order_sum(mol, i)
        default_h = 0
        for v in vals:
            if bos <= v:
                default_h = int(v - bos)
                break
        return a.explicit_h != default_h
    return False


def _atom_token(mol: Mol, i: int) -> str:
    a = mol.atoms[i]
    sym = a.symbol.lower() if a.aromatic else a.symbol
    if not _needs_brackets(mol, i):
        return sym
    parts = ["["]
    if a.isotope:
        parts.append(str(a.isotope))
    parts.append(sym)
    h = mol.total_h(i)
    if h == 1:
        parts.append("H")
    elif h > 1:
        parts.append(f"H{h}")
    if a.charge:
        sign = "+" if a.charge > 0 else "-"
        mag = abs(a.charge)
        parts.append(sign if mag == 1 else f"{sign}{mag}")
    parts.append("]")
    return "".join(parts)


_ORDER_TOKEN = {1: "", 2: "=", 3: "#"}


def _bond_token(mol: Mol, b) -> str:
    """Bond prefix such that the emitted string re-parses to this bond.

    The implicit (empty) token reads back as aromatic iff BOTH endpoint
    atoms are aromatic (and the bond sits in a ring), so:
    - aromatic bond, both atoms aromatic -> implicit
    - aromatic bond, an endpoint not aromatic -> explicit ':' (else the
      bond silently degrades to single and the H count changes)
    - single bond between two aromatic atoms -> explicit '-' (else an
      in-ring biaryl link, e.g. biphenylene, reads back as aromatic);
      this is also RDKit's output convention for biaryls
    """
    a1_ar = mol.atoms[b.a1].aromatic
    a2_ar = mol.atoms[b.a2].aromatic
    if b.aromatic:
        return "" if (a1_ar and a2_ar) else ":"
    if b.order == 1 and a1_ar and a2_ar:
        return "-"
    return _ORDER_TOKEN[b.order]


def write_smiles(
    mol: Mol,
    ranks: Optional[Sequence[int]] = None,
    rng: Optional[_random.Random] = None,
) -> str:
    """Write SMILES via a two-pass DFS.

    Pass 1 classifies every bond as tree or ring (back) edge under the
    chosen visit order; pass 2 emits text, attaching each ring bond's digit
    to both endpoints (opened at the first endpoint emitted).

    With ``ranks``: deterministic canonical order (fragment root = lowest
    rank, neighbors visited by ascending rank). With ``rng``: random root
    and neighbor shuffle (augmentation).
    """
    n = mol.num_atoms
    if ranks is None and rng is None:
        ranks = list(range(n))

    visited = [False] * n
    tree_children: list[list[tuple[int, int]]] = [[] for _ in range(n)]  # v -> [(bond, child)]
    ring_at: list[list[int]] = [[] for _ in range(n)]  # v -> [bond]
    ring_bonds: set[int] = set()

    def order_bonds(v: int, exclude: int) -> list[int]:
        bonds = [bi for bi in mol.adjacency[v] if bi != exclude]
        if rng is not None:
            rng.shuffle(bonds)
        else:
            bonds.sort(key=lambda bi: ranks[mol.bonds[bi].other(v)])
        return bonds

    def dfs(v: int, pb: int) -> None:
        visited[v] = True
        for bi in order_bonds(v, pb):
            w = mol.bonds[bi].other(v)
            if visited[w]:
                if bi not in ring_bonds:
                    ring_bonds.add(bi)
                    ring_at[v].append(bi)
                    ring_at[w].append(bi)
            else:
                tree_children[v].append((bi, w))
                dfs(w, bi)

    fragment_roots: list[int] = []
    remaining = set(range(n))
    while remaining:
        if rng is not None:
            root = rng.choice(sorted(remaining))
        else:
            root = min(remaining, key=lambda i: ranks[i])
        fragment_roots.append(root)
        dfs(root, -1)
        remaining -= {i for i in remaining if visited[i]}

    # pass 2 -------------------------------------------------------------
    out: list[str] = []
    ring_label: dict[int, int] = {}
    free_labels: list[int] = []
    next_label = [1]

    def fmt_ring(lbl: int) -> str:
        if lbl >= 100:
            # '%100' would re-parse as ring 10 + ring 0 — fail loudly
            raise SmilesError("more than 99 simultaneously open ring closures")
        return str(lbl) if lbl < 10 else f"%{lbl:02d}"

    def emit(v: int, pb: int) -> None:
        if pb >= 0:
            out.append(_bond_token(mol, mol.bonds[pb]))
        out.append(_atom_token(mol, v))
        digits = ring_at[v]
        if rng is None:
            digits = sorted(digits, key=lambda bi: ranks[mol.bonds[bi].other(v)])
        for bi in digits:
            if bi not in ring_label:
                lbl = min(free_labels) if free_labels else next_label[0]
                if free_labels and lbl in free_labels:
                    free_labels.remove(lbl)
                else:
                    next_label[0] += 1
                ring_label[bi] = lbl
                out.append(_bond_token(mol, mol.bonds[bi]) + fmt_ring(lbl))
            else:
                lbl = ring_label.pop(bi)
                out.append(fmt_ring(lbl))
                free_labels.append(lbl)
        kids = tree_children[v]
        for k, (bi, w) in enumerate(kids):
            last = k == len(kids) - 1
            if not last:
                out.append("(")
            emit(w, bi)
            if not last:
                out.append(")")

    for fi, root in enumerate(fragment_roots):
        if fi:
            out.append(".")
        emit(root, -1)
    return "".join(out)


def canonical_smiles(smiles: str) -> Optional[str]:
    """Parse + canonicalize; None if invalid (mirrors the reference's
    MolFromSmiles->MolToSmiles None-propagation)."""
    try:
        mol = parse_smiles(smiles)
        return write_smiles(mol, ranks=canonical_ranks(mol))
    except SmilesError:
        return None
    except RecursionError:
        return None


def randomize_smiles(smiles: str, rng: Optional[_random.Random] = None) -> Optional[str]:
    """Random restructuring of a valid SMILES (training augmentation;
    reference `smi_augmenter_v15_4.py:97`)."""
    try:
        mol = parse_smiles(smiles)
        return write_smiles(mol, ranks=None, rng=rng or _random.Random())
    except (SmilesError, RecursionError):
        # same None-propagation contract as canonical_smiles: a too-deep
        # DFS skips the record instead of crashing corpus augmentation
        return None
