"""Drug-like random molecule generation for the synthetic training corpus.

The reference trains on ZINC/PubChem slices (`scripts/script_PC_0_250.py`)
that are not available in this environment. This module synthesizes a
comparable corpus: ring scaffolds (carbo-/heteroaromatic, saturated
heterocycles, fused systems) joined by short linkers and decorated with
common medicinal-chemistry substituents, plus purely acyclic chains.
Everything is built by graph grafting on the first-party `chem.Mol` and
validated/canonicalized through the same parser the rest of the framework
uses, so every emitted SMILES round-trips.

Replaces `data.pipeline.random_smiles` (naive fragment concatenation) as
the corpus source for accuracy training; the old helper remains for cheap
test fixtures.
"""

from __future__ import annotations

import random
from dataclasses import replace
from typing import Optional

from ..chem import api as chem
from ..chem.canonical import write_smiles
from ..chem.smiles import Mol, SmilesError, finalize, parse_smiles

# scaffold SMILES: rings commonly seen in drug-like sets
SCAFFOLDS = [
    "c1ccccc1", "c1ccncc1", "c1ccnnc1", "c1cncnc1", "c1ccoc1", "c1ccsc1",
    "c1cc[nH]c1", "c1cnc[nH]1", "c1cn[nH]c1", "c1csc(n1)C", "c1ocnc1",
    "C1CCCCC1", "C1CCCC1", "C1CCNCC1", "C1CCOCC1", "C1CNCCN1", "C1COCCN1",
    "C1CCOC1", "C1CCNC1", "C1CCSCC1",
    "c1ccc2ccccc2c1", "c1ccc2[nH]ccc2c1", "c1ccc2ncccc2c1",
    "c1ccc2occc2c1", "c1ccc2sccc2c1", "c1ccc2OCOc2c1",
    "c1ccc2CCCCc2c1", "c1ccc2OCCOc2c1", "c1ccc2NC(=O)Cc2c1",
]

# substituents, attached through atom 0 of the fragment
SUBSTITUENTS = [
    "C", "CC", "CCC", "C(C)C", "C(C)(C)C", "O", "OC", "OCC", "N", "NC",
    "N(C)C", "F", "Cl", "Br", "C#N", "C(F)(F)F", "C(=O)O", "C(=O)OC",
    "C(=O)C", "C(=O)N", "C(=O)NC", "NC(=O)C", "NC(=O)", "S", "SC",
    "S(=O)(=O)C", "S(=O)(=O)N", "CO", "CN", "C=C", "CC=C", "CC#N",
    "COC", "CCO", "CCN", "OC(F)F", "C(C)O", "C(C)N",
]

# linkers joining two ring systems; attachment through atoms 0 and last
LINKERS = ["", "C", "CC", "CCC", "O", "N", "S", "OC", "NC", "C(=O)",
           "C(=O)N", "C(=O)O", "NC(=O)", "OCC", "C=C", "S(=O)(=O)"]

# chain backbone pieces for acyclic molecules
CHAIN_ATOMS = ["C", "C", "C", "C", "O", "N"]
CHAIN_CAPS = ["C", "CC", "O", "OC", "N", "C(=O)O", "C(=O)OC", "C(=O)N",
              "C#N", "Cl", "C=C", "C(C)C"]

_parse_cache: dict[str, Mol] = {}


def _template(smi: str) -> Mol:
    m = _parse_cache.get(smi)
    if m is None:
        m = parse_smiles(smi)
        _parse_cache[smi] = m
    return m


def _copy_into(dst: Mol, src: Mol) -> int:
    """Append a copy of src's graph to dst; returns the index offset."""
    offset = dst.num_atoms
    for a in src.atoms:
        dst.add_atom(replace(a, implicit_h=0, in_ring=False))
    for b in src.bonds:
        dst.add_bond(b.a1 + offset, b.a2 + offset, b.order, b.aromatic, b.stereo)
    return offset


def _consume_h(mol: Mol, i: int) -> None:
    a = mol.atoms[i]
    if a.explicit_h > 0:
        a.explicit_h -= 1


def _attach_sites(mol: Mol, rng: random.Random, allow_n: bool = True) -> list[int]:
    """Atoms that can accept one more single bond (have >=1 H)."""
    out = []
    for i, a in enumerate(mol.atoms):
        if a.symbol == "C" or (allow_n and a.symbol == "N"):
            if mol.total_h(i) >= 1:
                out.append(i)
    return out


def _graft(base: Mol, site: int, frag: Mol, frag_site: int) -> Optional[Mol]:
    """New molecule = base + frag joined by a single bond; None on valence
    failure."""
    m = Mol()
    _copy_into(m, base)
    offset = _copy_into(m, frag)
    m.add_bond(site, frag_site + offset, 1)
    _consume_h(m, site)
    _consume_h(m, frag_site + offset)
    try:
        return finalize(m, strict=True)
    except SmilesError:
        return None


def _decorate(mol: Mol, rng: random.Random, n_subs: int) -> Mol:
    for _ in range(n_subs):
        sites = _attach_sites(mol, rng)
        if not sites:
            break
        sub = _template(rng.choice(SUBSTITUENTS))
        out = _graft(mol, rng.choice(sites), sub, 0)
        if out is not None:
            mol = out
    return mol


def _linked_rings(rng: random.Random) -> Mol:
    a = _template(rng.choice(SCAFFOLDS))
    b = _template(rng.choice(SCAFFOLDS))
    link = rng.choice(LINKERS)
    sites_a = _attach_sites(a, rng)
    sites_b = _attach_sites(b, rng)
    if not sites_a or not sites_b:
        return a
    if not link:
        out = _graft(a, rng.choice(sites_a), b, rng.choice(sites_b))
        return out if out is not None else a
    lm = _template(link)
    step1 = _graft(a, rng.choice(sites_a), lm, 0)
    if step1 is None:
        return a
    # link fragment occupies the tail of step1; bond b to the last linker
    # atom that still has an H to give (for "C(=O)" / "NC(=O)" /
    # "S(=O)(=O)" the final atom is a double-bonded O with no H — the
    # attachment point is the carbonyl C / sulfonyl S before it)
    link_start = step1.num_atoms - lm.num_atoms
    link_last = next(
        (i for i in range(step1.num_atoms - 1, link_start - 1, -1) if step1.total_h(i) >= 1),
        None,
    )
    if link_last is None:
        return step1
    out = _graft(step1, link_last, b, rng.choice(sites_b))
    return out if out is not None else step1


def _chain(rng: random.Random) -> Mol:
    n = rng.randint(3, 8)
    smi = "".join(rng.choice(CHAIN_ATOMS) for _ in range(n)) + rng.choice(CHAIN_CAPS)
    try:
        return parse_smiles(smi)
    except SmilesError:
        return _template("CCCCC")


def random_molecule(
    rng: random.Random, min_mw: float = 80.0, max_mw: float = 550.0
) -> Optional[str]:
    """One random drug-like canonical SMILES, or None if this draw failed
    the MW/validity gates (caller retries)."""
    kind = rng.random()
    if kind < 0.45:  # single ring system
        mol = _decorate(_template(rng.choice(SCAFFOLDS)), rng, rng.randint(1, 4))
    elif kind < 0.80:  # two linked ring systems
        mol = _decorate(_linked_rings(rng), rng, rng.randint(0, 3))
    else:  # acyclic
        mol = _decorate(_chain(rng), rng, rng.randint(0, 2))
    try:
        smi = write_smiles(mol)
    except (SmilesError, RecursionError):
        return None
    can = chem.canonicalize(smi)
    if can is None or "." in can:
        return None
    mw = chem.mol_wt(can)
    if mw is None or not (min_mw <= mw <= max_mw):
        return None
    return can


def random_corpus(
    n: int, seed: int = 0, min_mw: float = 80.0, max_mw: float = 550.0
) -> list[str]:
    """n unique canonical SMILES (deterministic in seed)."""
    rng = random.Random(seed)
    seen: set[str] = set()
    out: list[str] = []
    attempts = 0
    while len(out) < n and attempts < n * 60:
        attempts += 1
        smi = random_molecule(rng, min_mw, max_mw)
        if smi is not None and smi not in seen:
            seen.add(smi)
            out.append(smi)
    return out
