"""First-party SMILES parser and molecular graph.

The environment provides no RDKit, so this framework carries its own
chemistry kernel for everything the reference did through RDKit on the hot
path: validity checking of generated SMILES, canonicalization for dedup,
molecular formula / exact molecular weight, fingerprints and tanimoto
(reference touchpoints: `dataloaders_pl_v15_4.py:436-443`,
`helper_functions_pl_v15_4.py:421-520`, `mmt_result_test_functions_15_4.py:1051`).

Scope: the organic subset + bracket atoms (isotope, charge, explicit H,
chirality parsed-and-recorded), ring closures incl. %nn, branches, double/
triple/aromatic bonds, dot-disconnected fragments. Stereochemistry is
parsed but not canonicalized (the reference strips stereo anyway:
`isomericSmiles=False` in `config_V8.json`, stereo removal in
`execution_function_v15_4.py:224-275`).

Canonical SMILES here are *self-consistent* (any atom ordering of the same
molecule yields the same string) but intentionally NOT byte-identical to
RDKit's algorithm; all dedup/exact-match logic in this framework compares
within this canonicalization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .elements import AROMATIC_OK, DEFAULT_VALENCES, MASSES


class SmilesError(ValueError):
    pass


@dataclass
class Atom:
    symbol: str  # capitalized element symbol, e.g. "C", "Cl"
    aromatic: bool = False
    charge: int = 0
    explicit_h: int = -1  # -1 = derive implicit H from valence rules
    isotope: int = 0
    chirality: str = ""  # "@", "@@" (recorded, not canonicalized)
    # filled in by finalize():
    implicit_h: int = 0
    in_ring: bool = False


@dataclass
class Bond:
    a1: int
    a2: int
    order: int  # 1, 2, 3
    aromatic: bool = False
    stereo: str = ""  # "/" or "\\" (recorded only)
    # filled in by finalize():
    in_ring: bool = False

    def other(self, i: int) -> int:
        return self.a2 if i == self.a1 else self.a1


@dataclass
class Mol:
    """Molecular graph. Treated as IMMUTABLE once finalized: downstream
    code memoizes derived data on the instance (e.g. `canonical.
    symmetry_classes`), so in-place edits after finalize would serve stale
    caches. Build modified molecules as new instances (see
    `data.molrandom._graft`)."""

    atoms: list[Atom] = field(default_factory=list)
    bonds: list[Bond] = field(default_factory=list)
    adjacency: list[list[int]] = field(default_factory=list)  # atom -> bond indices

    def add_atom(self, atom: Atom) -> int:
        self.atoms.append(atom)
        self.adjacency.append([])
        return len(self.atoms) - 1

    def add_bond(self, a1: int, a2: int, order: int, aromatic: bool = False, stereo: str = "") -> int:
        b = Bond(a1, a2, order, aromatic, stereo)
        self.bonds.append(b)
        idx = len(self.bonds) - 1
        self.adjacency[a1].append(idx)
        self.adjacency[a2].append(idx)
        return idx

    def degree(self, i: int) -> int:
        return len(self.adjacency[i])

    def neighbors(self, i: int) -> list[int]:
        return [self.bonds[b].other(i) for b in self.adjacency[i]]

    def bond_between(self, a1: int, a2: int) -> Optional[Bond]:
        for bi in self.adjacency[a1]:
            if self.bonds[bi].other(a1) == a2:
                return self.bonds[bi]
        return None

    def total_h(self, i: int) -> int:
        a = self.atoms[i]
        return a.explicit_h if a.explicit_h >= 0 else a.implicit_h

    @property
    def num_atoms(self) -> int:
        return len(self.atoms)

    def bond_order_sum(self, i: int) -> float:
        """Valence-consumption of explicit bonds at atom i, with the
        aromatic-system convention used for implicit-H assignment."""
        a = self.atoms[i]
        total = 0.0
        n_arom = 0
        has_exo_double = False
        for bi in self.adjacency[i]:
            b = self.bonds[bi]
            if b.aromatic:
                n_arom += 1
            else:
                total += b.order
                if b.order == 2:
                    has_exo_double = True
        if n_arom:
            if a.aromatic and a.symbol in ("O", "S", "Se", "Te"):
                # aromatic o/s donate a lone pair: both ring bonds count 1
                total += n_arom
            elif a.aromatic and a.symbol in ("N", "P") and (
                (a.explicit_h is not None and a.explicit_h > 0) or self.degree(i) == 3
            ):
                # pyrrole-type n ([nH] or 3-connected n): lone pair is the
                # aromatic contribution, ring bonds count single
                total += n_arom
            elif a.aromatic and has_exo_double:
                # aromatic atom with an exocyclic double bond (pyridinone
                # c(=O), 2H-tautomer c(=N)): the pi electron lives in that
                # exocyclic bond, so every ring bond counts single — the
                # Daylight reading RDKit accepts for O=c1cccc[nH]1 etc.
                total += n_arom
            else:
                # one of the aromatic bonds carries the extra pi electron
                total += n_arom + 1
        return total


def _effective_valences(symbol: str, charge: int) -> tuple[int, ...]:
    base = DEFAULT_VALENCES.get(symbol)
    if base is None:
        return ()
    if charge == 0:
        return base
    # common charge adjustments for organic chemistry
    if symbol in ("N", "P") and charge == 1:
        return (4,)
    if symbol in ("N", "P") and charge == -1:
        return (2,)
    if symbol in ("O", "S") and charge == 1:
        return (3,)
    if symbol in ("O", "S") and charge == -1:
        return (1,)
    if symbol == "C" and charge in (1, -1):
        return (3,)
    if symbol == "B" and charge == -1:
        return (4,)
    return tuple(max(0, v + charge) for v in base)


def finalize(mol: Mol, strict: bool = True) -> Mol:
    """Assign implicit hydrogens and ring flags; valence-check if strict."""
    # ring detection: an edge is in a ring iff removing it keeps its ends
    # connected; cheaper: find all edges in cycles via DFS back-edges union.
    _mark_rings(mol)
    for i, a in enumerate(mol.atoms):
        bos = mol.bond_order_sum(i)
        if a.explicit_h >= 0:
            total = bos + a.explicit_h
            vals = _effective_valences(a.symbol, a.charge)
            if strict and vals and total > max(vals):
                raise SmilesError(
                    f"valence {total} too large for {a.symbol}{'+' if a.charge>0 else '-' if a.charge<0 else ''} at atom {i}"
                )
            a.implicit_h = 0
            continue
        vals = _effective_valences(a.symbol, a.charge)
        if not vals:
            a.implicit_h = 0
            continue
        h = None
        for v in vals:
            if bos <= v:
                h = int(v - bos)
                break
        if h is None:
            if strict:
                raise SmilesError(f"valence {bos} exceeds max for {a.symbol} at atom {i}")
            h = 0
        a.implicit_h = h
    return mol


def _mark_rings(mol: Mol) -> None:
    """Mark ring bonds/atoms via DFS back-edge + cycle-path marking."""
    n = mol.num_atoms
    visited = [False] * n
    parent_bond = [-1] * n
    parent = [-1] * n
    depth = [0] * n
    in_ring_bond = [False] * len(mol.bonds)

    for root in range(n):
        if visited[root]:
            continue
        stack = [(root, -1)]
        order = []
        while stack:
            v, pb = stack.pop()
            if visited[v]:
                continue
            visited[v] = True
            parent_bond[v] = pb
            parent[v] = mol.bonds[pb].other(v) if pb >= 0 else -1
            depth[v] = depth[parent[v]] + 1 if parent[v] >= 0 else 0
            order.append(v)
            for bi in mol.adjacency[v]:
                w = mol.bonds[bi].other(v)
                if not visited[w]:
                    stack.append((w, bi))
        # back edges: any bond whose two ends are both visited but is not a
        # parent bond introduces a cycle; walk up to mark the path.
        for bi, b in enumerate(mol.bonds):
            if parent_bond[b.a1] == bi or parent_bond[b.a2] == bi:
                continue
            u, v = b.a1, b.a2
            if not (visited[u] and visited[v]):
                continue
            in_ring_bond[bi] = True
            # walk both ends up to their LCA
            uu, vv = u, v
            while uu != vv:
                if depth[uu] >= depth[vv]:
                    pb = parent_bond[uu]
                    if pb < 0:
                        break
                    in_ring_bond[pb] = True
                    uu = parent[uu]
                else:
                    pb = parent_bond[vv]
                    if pb < 0:
                        break
                    in_ring_bond[pb] = True
                    vv = parent[vv]
    for bi, flag in enumerate(in_ring_bond):
        b = mol.bonds[bi]
        b.in_ring = flag
        if flag:
            mol.atoms[b.a1].in_ring = True
            mol.atoms[b.a2].in_ring = True
        elif b.aromatic:
            # Daylight semantics: a bond between two aromatic atoms that
            # lies in no ring is a SINGLE bond — an implicitly-written
            # biaryl link (c1ccccc1c1ccccc1) must not read as aromatic
            b.aromatic = False
            b.order = 1


_TWO_LETTER_ORGANIC = ("Cl", "Br")
_BOND_ORDERS = {"-": 1, "=": 2, "#": 3, ":": 1}


def parse_smiles(smiles: str, strict: bool = True) -> Mol:
    """Parse a SMILES string into a Mol. Raises SmilesError on malformed
    input or (if strict) valence violations."""
    mol = Mol()
    prev: list[int] = []  # branch stack of previous-atom indices
    last = -1
    pending_bond: Optional[str] = None
    ring_open: dict[int, tuple[int, Optional[str]]] = {}
    i = 0
    n = len(smiles)

    def attach(new_idx: int):
        nonlocal pending_bond, last
        if last >= 0:
            a1, a2 = last, new_idx
            sym = pending_bond
            if sym is None:
                arom = mol.atoms[a1].aromatic and mol.atoms[a2].aromatic
                mol.add_bond(a1, a2, 1, aromatic=arom)
            elif sym in ("/", "\\"):
                mol.add_bond(a1, a2, 1, stereo=sym)
            elif sym == ":":
                mol.add_bond(a1, a2, 1, aromatic=True)
            else:
                mol.add_bond(a1, a2, _BOND_ORDERS[sym])
        pending_bond = None
        last = new_idx

    while i < n:
        c = smiles[i]
        if c == "(":
            if last < 0:
                raise SmilesError("branch before any atom")
            prev.append(last)
            i += 1
        elif c == ")":
            if not prev:
                raise SmilesError("unmatched ')'")
            last = prev.pop()
            i += 1
        elif c in "-=#:/\\":
            if pending_bond is not None:
                raise SmilesError("two bond symbols in a row")
            pending_bond = c
            i += 1
        elif c == ".":
            last = -1
            pending_bond = None
            i += 1
        elif c.isdigit() or c == "%":
            if c == "%":
                if i + 2 >= n or not (smiles[i + 1].isdigit() and smiles[i + 2].isdigit()):
                    raise SmilesError("malformed %nn ring closure")
                num = int(smiles[i + 1 : i + 3])
                i += 3
            else:
                num = int(c)
                i += 1
            if last < 0:
                raise SmilesError("ring closure before any atom")
            if num in ring_open:
                a1, sym1 = ring_open.pop(num)
                sym = pending_bond or sym1
                if a1 == last:
                    raise SmilesError("ring bond to self")
                if mol.bond_between(a1, last) is not None:
                    raise SmilesError("duplicate ring bond")
                if sym is None:
                    arom = mol.atoms[a1].aromatic and mol.atoms[last].aromatic
                    mol.add_bond(a1, last, 1, aromatic=arom)
                elif sym in ("/", "\\"):
                    mol.add_bond(a1, last, 1, stereo=sym)
                elif sym == ":":
                    mol.add_bond(a1, last, 1, aromatic=True)
                else:
                    mol.add_bond(a1, last, _BOND_ORDERS[sym])
                pending_bond = None
            else:
                ring_open[num] = (last, pending_bond)
                pending_bond = None
        elif c == "[":
            j = smiles.find("]", i)
            if j < 0:
                raise SmilesError("unclosed bracket atom")
            atom = _parse_bracket(smiles[i + 1 : j])
            attach(mol.add_atom(atom))
            i = j + 1
        else:
            # organic subset atom
            matched = None
            for two in _TWO_LETTER_ORGANIC:
                if smiles.startswith(two, i):
                    matched = two
                    break
            if matched:
                attach(mol.add_atom(Atom(matched)))
                i += 2
            elif c in "BCNOPSFI":
                attach(mol.add_atom(Atom(c)))
                i += 1
            elif c in "bcnops":
                attach(mol.add_atom(Atom(c.upper(), aromatic=True)))
                i += 1
            else:
                raise SmilesError(f"unexpected character {c!r} at {i}")

    if prev:
        raise SmilesError("unmatched '('")
    if ring_open:
        raise SmilesError(f"unclosed ring bonds: {sorted(ring_open)}")
    if pending_bond is not None:
        raise SmilesError("dangling bond symbol")
    if mol.num_atoms == 0:
        raise SmilesError("empty SMILES")
    return finalize(mol, strict=strict)


def _parse_bracket(body: str) -> Atom:
    i = 0
    n = len(body)
    isotope = 0
    while i < n and body[i].isdigit():
        isotope = isotope * 10 + int(body[i])
        i += 1
    if i >= n:
        raise SmilesError(f"bracket atom missing symbol: [{body}]")
    # element symbol (one upper + optional lower, or aromatic lowercase)
    aromatic = False
    if body[i].isupper():
        sym = body[i]
        i += 1
        if i < n and body[i].islower() and sym + body[i] in MASSES:
            sym += body[i]
            i += 1
    elif body[i].islower():
        # aromatic lowercase, possibly two letters (se, as)
        two = body[i : i + 2]
        if two in AROMATIC_OK:
            sym = two.capitalize()
            i += 2
        elif body[i] in "bcnops":
            sym = body[i].upper()
            i += 1
        else:
            raise SmilesError(f"bad aromatic symbol in [{body}]")
        aromatic = True
    else:
        raise SmilesError(f"bad bracket atom [{body}]")

    chirality = ""
    while i < n and body[i] == "@":
        chirality += "@"
        i += 1
    if i < n and chirality and body[i : i + 2] in ("TH", "AL", "SP", "TB", "OH"):
        chirality += body[i : i + 2]
        i += 2
        while i < n and body[i].isdigit():
            chirality += body[i]
            i += 1

    h = 0
    if i < n and body[i] == "H":
        i += 1
        h = 1
        cnt = ""
        while i < n and body[i].isdigit():
            cnt += body[i]
            i += 1
        if cnt:
            h = int(cnt)

    charge = 0
    while i < n and body[i] in "+-":
        sign = 1 if body[i] == "+" else -1
        i += 1
        cnt = ""
        while i < n and body[i].isdigit():
            cnt += body[i]
            i += 1
        charge += sign * (int(cnt) if cnt else 1)

    if i < n and body[i] == ":":
        i += 1
        while i < n and body[i].isdigit():
            i += 1  # atom-map class: parsed and dropped

    if i != n:
        raise SmilesError(f"trailing characters in bracket atom [{body}]")
    if sym not in MASSES:
        raise SmilesError(f"unknown element {sym!r}")
    return Atom(sym, aromatic=aromatic, charge=charge, explicit_h=h, isotope=isotope, chirality=chirality)


def is_valid(smiles: str) -> bool:
    """Validity in the sense the reference uses Chem.MolFromSmiles != None
    (`helper_functions_pl_v15_4.py` get_validity_term)."""
    try:
        parse_smiles(smiles, strict=True)
        return True
    except SmilesError:
        return False
    except Exception:
        return False
