"""Constrained molecular neighbor generation (the MolFormer-bridge
replacement).

The reference drives an external seq2seq model (deep-molecular-optimization)
to sample molecules around each target until ``MF_generations`` candidates
pass the filters: molecular weight within ``MF_delta_weight``, tanimoto above
``MF_tanimoto_filter``, Lipinski rule-of-five, and a per-Murcko-scaffold cap
``max_scaffold_generations`` (`molformer_functions_v15_4.py:126-484,
697-791`, config keys in `config_V8.json`).

This first-party generator produces structural neighbors by graph mutation
(substituent attach/detach, heteroatom swap, halogen swap) + canonical
dedup, applying exactly the same filter semantics. It is deterministic
given a seed, needs no external checkpoint, and its output feeds the same
improvement-cycle blending path.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from typing import Optional

from ..chem import api as chem
from ..chem.descriptors import lipinski_ok, murcko_scaffold
from ..chem.smiles import Atom, Mol, SmilesError, finalize, parse_smiles
from ..chem.canonical import canonical_ranks, write_smiles

# fragments as chains of (symbol, bond_order_to_previous); the first
# element bonds to the attachment site
ATTACH_FRAGMENTS: list[list[tuple[str, int]]] = [
    [("C", 1)],
    [("N", 1)],
    [("O", 1)],
    [("F", 1)],
    [("Cl", 1)],
    [("C", 1), ("C", 1)],
    [("C", 1), ("O", 2)],  # aldehyde/ketone C=O
    [("C", 1), ("O", 1)],  # CH2-OH
    [("C", 1), ("N", 1)],  # CH2-NH2
]
HETERO_SWAPS = {"C": ["N", "O"], "N": ["C", "O"], "O": ["C", "N"]}
HALOGENS = ["F", "Cl", "Br"]


@dataclass
class MolGenConfig:
    generations_per_target: int = 30  # MF_generations
    max_trials: int = 500  # MF_max_trails
    mw_delta: float = 5.0  # MF_delta_weight
    tanimoto_min: float = 0.1  # MF_tanimoto_filter
    filter_higher_mw: bool = True  # MF_filter_higher
    max_per_scaffold: int = 10  # max_scaffold_generations
    lipinski: bool = True
    seed: int = 0


def _clone(mol: Mol) -> Mol:
    out = Mol()
    for a in mol.atoms:
        out.add_atom(Atom(a.symbol, a.aromatic, a.charge, a.explicit_h, a.isotope))
    for b in mol.bonds:
        out.add_bond(b.a1, b.a2, b.order, b.aromatic)
    return out


def _to_smiles(mol: Mol) -> Optional[str]:
    try:
        finalize(mol, strict=True)
        return write_smiles(mol, ranks=canonical_ranks(mol))
    except (SmilesError, Exception):
        return None


def mutate(mol: Mol, rng: random.Random) -> Optional[str]:
    """One random structural edit; returns canonical SMILES or None."""
    op = rng.random()
    m = _clone(mol)
    n = m.num_atoms
    if op < 0.45:
        # attach a small fragment to a random H-bearing atom
        finalize(m, strict=False)
        sites = [i for i in range(n) if m.total_h(i) > 0 and not m.atoms[i].aromatic]
        sites = sites or [i for i in range(n) if m.total_h(i) > 0]
        if not sites:
            return None
        site = rng.choice(sites)
        frag = rng.choice(ATTACH_FRAGMENTS)
        prev = site
        for sym, order in frag:
            idx = m.add_atom(Atom(sym))
            m.add_bond(prev, idx, order)
            prev = idx
    elif op < 0.7:
        # delete a random terminal non-ring atom
        finalize(m, strict=False)
        terminals = [i for i in range(n) if m.degree(i) == 1 and not m.atoms[i].in_ring]
        if len(terminals) == 0 or n <= 3:
            return None
        victim = rng.choice(terminals)
        keep = [i for i in range(n) if i != victim]
        m2 = Mol()
        remap = {}
        for i in keep:
            a = m.atoms[i]
            remap[i] = m2.add_atom(Atom(a.symbol, a.aromatic, a.charge, -1, a.isotope))
        for b in m.bonds:
            if b.a1 in remap and b.a2 in remap:
                m2.add_bond(remap[b.a1], remap[b.a2], b.order, b.aromatic)
        m = m2
    else:
        # swap one atom's element (heteroatom or halogen swap)
        finalize(m, strict=False)
        cands = [
            i for i in range(n)
            if (m.atoms[i].symbol in HETERO_SWAPS and not m.atoms[i].aromatic)
            or m.atoms[i].symbol in HALOGENS
        ]
        if not cands:
            return None
        i = rng.choice(cands)
        sym = m.atoms[i].symbol
        if sym in HALOGENS:
            new = rng.choice([h for h in HALOGENS if h != sym])
        else:
            new = rng.choice(HETERO_SWAPS[sym])
        m.atoms[i].symbol = new
        m.atoms[i].explicit_h = -1
    return _to_smiles(m)


def generate_neighbors(target_smiles: str, cfg: MolGenConfig = MolGenConfig()) -> list[str]:
    """Generate up to ``generations_per_target`` filtered neighbors."""
    can = chem.canonicalize(target_smiles)
    if can is None:
        return []
    target_mw = chem.mol_wt(can)
    # process-stable seed: Python's str hash is salted per interpreter
    # (PYTHONHASHSEED), which would make generation non-reproducible
    digest = hashlib.sha256(f"{cfg.seed}|{can}".encode()).digest()
    rng = random.Random(int.from_bytes(digest[:8], "little"))
    try:
        base = parse_smiles(can)
    except SmilesError:
        return []

    accepted: list[str] = []
    pool = [can]
    seen = {can}
    scaffold_counts: dict[str, int] = {}
    for _trial in range(cfg.max_trials):
        if len(accepted) >= cfg.generations_per_target:
            break
        src = parse_smiles(rng.choice(pool))
        smi = mutate(src, rng)
        if smi is None or smi in seen:
            continue
        seen.add(smi)
        mw = chem.mol_wt(smi)
        if mw is None:
            continue
        if cfg.filter_higher_mw and mw > target_mw + cfg.mw_delta:
            continue
        if abs(mw - target_mw) > max(cfg.mw_delta * 10, 100):
            continue  # hard sanity bound
        t = chem.tanimoto(smi, can)
        if t is None or t < cfg.tanimoto_min:
            continue
        if cfg.lipinski and not lipinski_ok(smi):
            continue
        scaf = murcko_scaffold(smi) or ""
        if scaffold_counts.get(scaf, 0) >= cfg.max_per_scaffold:
            continue
        scaffold_counts[scaf] = scaffold_counts.get(scaf, 0) + 1
        accepted.append(smi)
        pool.append(smi)  # allow multi-step walks
    return accepted


def generate_for_targets(targets: list[str], cfg: MolGenConfig = MolGenConfig()) -> dict[str, list[str]]:
    return {t: generate_neighbors(t, cfg) for t in targets}
