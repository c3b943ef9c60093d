"""Spectrum reconstruction: per-atom shifts -> 1H/13C/HSQC/COSY peak lists.

Reference counterparts in `data_generation_v15_4.py`:
- 1H (`:120-330, 689-757`): group protons by parent heavy atom, average
  shifts over symmetric positions, synthesize multiplets via the n+1 rule
  with Pascal's-triangle intensities (J_aromatic = 8 Hz; aliphatic J ~ 6-7
  Hz from a rule table), peak positions shift + J/spectrometer_frequency
  (400 MHz), intensities scaled by proton count, dedup via symmetry.
- 13C (`:765-881`): average shifts over symmetric carbons, dedup.
- HSQC (`hsqc_nmr_reconstruction_v15_4.py`): (delta_C, delta_H) per
  H-bearing carbon, symmetry-deduplicated.
- COSY (`cosy_nmr_reconstruction_v15_4.py`): (delta_H, delta_H') cross
  peaks for adjacent H-bearing carbons (+ diagonal), symmetry-averaged.

Symmetry comes from the chem kernel's Morgan equivalence classes instead of
RDKit canonical ranks; the aliphatic J rule table is collapsed to a single
J_aliphatic constant (the reference's table encodes special cases around
6 Hz; the trained MMT consumes peak positions, not J fine structure).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from ..chem.canonical import symmetry_classes
from ..chem.smiles import Mol

J_AROMATIC = 8.0
J_ALIPHATIC = 7.0
SPECTROMETER_MHZ = 400.0


def _pascal(n: int) -> list[int]:
    row = [1]
    for _ in range(n):
        row = [1] + [row[i] + row[i + 1] for i in range(len(row) - 1)] + [1]
    return row


def multiplet(shift: float, n_coupled: int, j_hz: float, n_protons: int) -> list[tuple[float, float]]:
    """(position, intensity) components of an (n+1)-line multiplet centred
    at `shift` (ppm), couplings in Hz converted at SPECTROMETER_MHZ."""
    if n_coupled <= 0:
        return [(shift, float(n_protons))]
    coeffs = _pascal(n_coupled)
    total = sum(coeffs)
    k0 = n_coupled / 2.0
    out = []
    for k, c in enumerate(coeffs):
        pos = shift + (k - k0) * j_hz / SPECTROMETER_MHZ
        out.append((pos, n_protons * c / total))
    return out


@dataclass
class AtomShifts:
    """Per-atom predicted shifts for one molecule (ppm).
    shift_c[i]: 13C shift of atom i (used when atom i is carbon);
    shift_h[i]: mean 1H shift of protons attached to heavy atom i."""

    shift_c: np.ndarray
    shift_h: np.ndarray


def _sym_averaged(mol: Mol, values: np.ndarray, atom_ids: Sequence[int]) -> dict[int, float]:
    """Average `values` over symmetry classes; returns atom -> averaged value."""
    classes = symmetry_classes(mol)
    sums: dict[int, list[float]] = {}
    for i in atom_ids:
        sums.setdefault(classes[i], []).append(float(values[i]))
    means = {c: float(np.mean(v)) for c, v in sums.items()}
    return {i: means[classes[i]] for i in atom_ids}


def reconstruct_13c(mol: Mol, shifts: AtomShifts) -> list[float]:
    carbons = [i for i, a in enumerate(mol.atoms) if a.symbol == "C"]
    avg = _sym_averaged(mol, shifts.shift_c, carbons)
    classes = symmetry_classes(mol)
    seen = set()
    out = []
    for i in carbons:
        if classes[i] in seen:
            continue
        seen.add(classes[i])
        out.append(round(avg[i], 2))
    return sorted(out)


def _h_bearing_carbons(mol: Mol) -> list[int]:
    return [i for i, a in enumerate(mol.atoms) if a.symbol == "C" and mol.total_h(i) > 0]


def _coupled_h_count(mol: Mol, i: int) -> tuple[int, float]:
    """(# coupled protons, J) for the protons on heavy atom i — the n+1
    rule over adjacent carbons' protons; aromatic ring protons couple to
    adjacent aromatic protons with J_AROMATIC."""
    a = mol.atoms[i]
    n = 0
    if a.aromatic:
        for j in mol.neighbors(i):
            if mol.atoms[j].aromatic and mol.atoms[j].symbol == "C":
                n += mol.total_h(j)
        return n, J_AROMATIC
    for j in mol.neighbors(i):
        if mol.atoms[j].symbol == "C":
            n += mol.total_h(j)
    return n, J_ALIPHATIC


def reconstruct_1h(mol: Mol, shifts: AtomShifts) -> list[tuple[float, float]]:
    """Peak list [(shift, intensity), ...] with multiplet fine structure."""
    carbons = _h_bearing_carbons(mol)
    if not carbons:
        return []
    avg = _sym_averaged(mol, shifts.shift_h, carbons)
    classes = symmetry_classes(mol)
    # symmetric groups emit once with multiplied proton count
    group_protons: dict[int, int] = {}
    group_repr: dict[int, int] = {}
    for i in carbons:
        c = classes[i]
        group_protons[c] = group_protons.get(c, 0) + mol.total_h(i)
        group_repr.setdefault(c, i)
    peaks: list[tuple[float, float]] = []
    for c, i in group_repr.items():
        n_coupled, j = _coupled_h_count(mol, i)
        peaks.extend(multiplet(avg[i], n_coupled, j, group_protons[c]))
    # dedup identical components (reference uses a set, `:738`)
    uniq = sorted({(round(p, 4), round(x, 4)) for p, x in peaks})
    return [(float(p), float(x)) for p, x in uniq]


def reconstruct_hsqc(mol: Mol, shifts: AtomShifts) -> list[tuple[float, float]]:
    """[(delta_H, delta_C)] per symmetry-distinct H-bearing carbon, matching
    the dataloader's HSQC column order (H first: `dataloaders_pl_v15_4.py:
    348-366`)."""
    carbons = _h_bearing_carbons(mol)
    if not carbons:
        return []
    avg_h = _sym_averaged(mol, shifts.shift_h, carbons)
    avg_c = _sym_averaged(mol, shifts.shift_c, carbons)
    classes = symmetry_classes(mol)
    seen = set()
    out = []
    for i in carbons:
        if classes[i] in seen:
            continue
        seen.add(classes[i])
        out.append((round(avg_h[i], 2), round(avg_c[i], 2)))
    return sorted(out)


def reconstruct_cosy(mol: Mol, shifts: AtomShifts) -> list[tuple[float, float]]:
    """[(delta_H, delta_H')] cross peaks for adjacent H-bearing carbons plus
    the diagonal, symmetry-deduplicated."""
    carbons = set(_h_bearing_carbons(mol))
    if not carbons:
        return []
    avg_h = _sym_averaged(mol, shifts.shift_h, sorted(carbons))
    classes = symmetry_classes(mol)
    pairs = set()
    for i in sorted(carbons):
        pairs.add((classes[i], classes[i]))  # diagonal
        for j in mol.neighbors(i):
            if j in carbons:
                pairs.add((classes[i], classes[j]))
    repr_of = {}
    for i in sorted(carbons):
        repr_of.setdefault(classes[i], i)
    out = set()
    for c1, c2 in pairs:
        h1 = round(avg_h[repr_of[c1]], 2)
        h2 = round(avg_h[repr_of[c2]], 2)
        out.add((h1, h2))
    return sorted(out)
