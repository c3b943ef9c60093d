"""Spectrum reconstruction: per-atom shifts -> 1H/13C/HSQC/COSY peak lists.

Reference counterparts:
- 1H (`data_generation_v15_4.py:122-561, 674-757`): group protons by parent
  heavy atom (N-H/O-H skipped), average shifts over symmetric positions,
  synthesize multiplet fine structure from a rule table keyed on the H
  counts of the parent's carbon neighbors and the bond types between them
  (J constants 3.5-18 Hz — ported case by case in `_coupling_pattern`),
  peak positions shift + J/spectrometer_frequency (400 MHz), single-line
  patterns emitted at the raw shift (`create_shift_intensity_label_data`,
  `:674-686`), dedup via a set. Lorentzian line-shape rendering
  (`lorentzian`/`simulate_splitting`, `:122-134`) is exposed as
  `render_lorentzian`.
- 13C (`data_generation_v15_4.py:765-881`): average shifts over symmetric
  carbons, dedup.
- HSQC (`hsqc_nmr_reconstruction_v15_4.py:533-635`): (delta_H, delta_C) per
  H-bearing carbon, symmetry-deduplicated, with chirality-driven
  diastereotopic splitting: CH2 carbons near a stereocenter (see
  `sim.stereo`) emit TWO peaks with distinct proton shifts
  (`selecting_shifts`, `:533-560`).
- COSY (`cosy_nmr_reconstruction_v15_4.py:18-218`): (delta_H, delta_H')
  cross peaks for adjacent H-bearing carbons (+ diagonal); where either
  carbon is a stereocenter or a diastereotopic CH2, the full cross product
  of per-proton shifts is emitted (`plot_and_save_cosy_spectrum_with_zoom_
  no_duplicates`, `:165-207`).

Intensity semantics in the 1H rule table follow the reference as written —
they are deliberately NOT normalized to proton counts (e.g. an N-CH3
singlet carries intensity 3, a CH2-CH2 triplet sums to 2): the trained
model consumes the same distribution the reference's did. Cases the
reference leaves uncovered (it silently reuses the previous molecule's
pattern — a latent bug) fall back to a Pascal's-triangle multiplet at
J = 7 Hz scaled to the parent's proton count.

The per-atom shift source is `AtomShifts` (one 13C + one averaged 1H value
per heavy atom). Diastereotopic proton pairs are emitted at
avg -/+ DIASTEREOTOPIC_DELTA_H/2 unless the shift model supplies a second
per-atom proton shift (`shift_h2`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..chem.canonical import symmetry_classes
from ..chem.smiles import Mol
from .stereo import diastereotopic_ch2, potential_stereocenters

J_AROMATIC = 8.0
SPECTROMETER_MHZ = 400.0
DIASTEREOTOPIC_DELTA_H = 0.2  # ppm between geminal diastereotopic protons


def _pascal(n: int) -> list[int]:
    row = [1]
    for _ in range(n):
        row = [1] + [row[i] + row[i + 1] for i in range(len(row) - 1)] + [1]
    return row


def _sym_lines(j_hz: float, intensities: Sequence[float]) -> list[tuple[float, float]]:
    """Symmetric multiplet: line k at offset (k - (n-1)/2) * J Hz."""
    n = len(intensities)
    return [((k - (n - 1) / 2.0) * j_hz, float(v)) for k, v in enumerate(intensities)]


def _dd(j1: float, j2: float, intensity: float) -> list[tuple[float, float]]:
    """Doublet of doublets (reference vinyl cases, `:303-311,360-367`)."""
    return [
        (-0.5 * j1 - 0.5 * j2, intensity),
        (-0.5 * j1 + 0.5 * j2, intensity),
        (0.5 * j1 - 0.5 * j2, intensity),
        (0.5 * j1 + 0.5 * j2, intensity),
    ]


@dataclass
class AtomShifts:
    """Per-atom predicted shifts for one molecule (ppm).
    shift_c[i]: 13C shift of atom i (used when atom i is carbon);
    shift_h[i]: mean 1H shift of protons attached to heavy atom i;
    shift_h2[i] (optional): second proton shift for diastereotopic CH2 —
    when absent, split peaks use mean -/+ DIASTEREOTOPIC_DELTA_H/2."""

    shift_c: np.ndarray
    shift_h: np.ndarray
    shift_h2: Optional[np.ndarray] = None


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


# ---------------------------------------------------------------------------
# 1H multiplet rule table (reference `calculate_couplings_constants`,
# `data_generation_v15_4.py:237-561`)
# ---------------------------------------------------------------------------

def _coupling_pattern(mol: Mol, i: int) -> list[tuple[float, float]]:
    """(J offset in Hz, intensity) lines for the protons on carbon i."""
    a = mol.atoms[i]
    nh = mol.total_h(i)

    if a.aromatic:
        # couple to protons on adjacent aromatic atoms (reference
        # `get_adjacent_aromatic_hydrogens`, `:136-141`); an isolated
        # aromatic H is the `[(J_aromatic, 1)]` single-line case, emitted
        # at the raw shift
        n = sum(mol.total_h(j) for j in mol.neighbors(i) if mol.atoms[j].aromatic)
        if n == 0:
            return [(0.0, 1.0)]
        coeffs = _pascal(n)
        scale = float(2 ** n)
        return _sym_lines(J_AROMATIC, [c / scale for c in coeffs])

    carbon_nbrs = [j for j in mol.neighbors(i) if mol.atoms[j].symbol == "C"]
    hc = tuple(sorted(mol.total_h(j) for j in carbon_nbrs))
    orders = []
    for j in carbon_nbrs:
        b = mol.bond_between(i, j)
        orders.append(1 if (b is None or b.aromatic) else b.order)
    has_double = 2 in orders
    n_single = orders.count(1)

    # --- no carbon neighbors / only quaternary neighbors (`:275-301`) ---
    if hc == ():
        return [(0.0, {3: 3.0, 2: 2.0}.get(nh, 0.0))]
    if hc == (0,):
        return [(0.0, float(min(nh, 3)))]
    if hc == (0, 0):
        return [(0.0, float(min(nh, 3)))]
    if hc == (0, 0, 0):
        return [(0.0, 1.0)]

    # --- one protonated carbon neighbor ---
    if hc == (1,):
        if has_double and nh == 2:
            return _dd(16.0, 10.0, 0.5)  # CH2=CH- (`:303-311`)
        if nh == 3:
            return _sym_lines(6.1, [1.5, 1.5])  # CH3-CH (`:319-323`)
        if nh == 1:
            return _sym_lines(6.1, [0.5, 0.5])  # lone CH-CH (`:325-329`)
        return _sym_lines(5.9, [1.0, 1.0])  # CH2-CH (`:313-317`)
    if hc == (2,):
        return _sym_lines(6.3, [0.5, 1.0, 0.5])  # CH2-CH2 (`:338-343`)
    if hc == (3,):
        return _sym_lines(7.0, [2 / 6, 4 / 6, 4 / 6, 2 / 6])  # CH2-CH3 (`:345-351`)

    # --- two carbon neighbors ---
    if hc == (0, 1):
        return _sym_lines(6.9, [1.0, 1.0])  # CO-CH2-CH (`:353-357`)
    if hc == (0, 2):
        if has_double:
            return _dd(18.0, 10.0, 0.25)  # CO-CH=CH2 (`:360-367`)
        return _sym_lines(6.7, [0.5, 1.0, 0.5])  # CO-CH2-CH2 (`:369-374`)
    if hc == (0, 3):
        return _sym_lines(7.0, [1 / 6, 2 / 6, 2 / 6, 1 / 6])  # CO-CH(-CH3) (`:376-382`)
    if hc == (1, 1):
        if has_double:
            return _dd(13.0, 6.06, 0.25)  # CH-CH=CH (`:384-391`)
        return _sym_lines(6.0, [0.5, 1.0, 0.5])  # CH-CH2-CH (`:393-398`)
    if hc == (1, 2):
        if has_double and n_single == 1:
            return _sym_lines(7.4, [1 / 6, 2 / 6, 2 / 6, 1 / 6])  # CH=CH-CH2 (`:400-406`)
        if n_single == 2:
            return _sym_lines(7.4, [2 / 6, 4 / 6, 4 / 6, 2 / 6])  # CH-CH2-CH2 (`:408-415`)
    if hc == (2, 2) and n_single == 2:
        return _sym_lines(6.57, [2 / 9, 4 / 9, 6 / 9, 4 / 9, 2 / 9])  # CH2-CH2-CH2 (`:417-424`)
    if hc == (1, 3):
        if has_double:
            return _sym_lines(7.0, [1 / 9, 2 / 9, 3 / 9, 2 / 9, 1 / 9])  # CH3-CH=CH (`:426-434`)
        return _sym_lines(
            3.5, [1 / 12, 1 / 12, 2 / 12, 2 / 12, 2 / 12, 2 / 12, 1 / 12, 1 / 12]
        )  # CH3-CH-CH (`:436-447`)
    if hc == (2, 3) and n_single == 2:
        return _sym_lines(7.0, [2 / 12, 4 / 12, 6 / 12, 6 / 12, 4 / 12, 2 / 12])  # CH3-CH2-CH2 (`:450-459`)
    if hc == (3, 3):
        return _sym_lines(6.4, [1 / 16, 2 / 16, 3 / 16, 4 / 16, 3 / 16, 2 / 16, 1 / 16])  # (CH3)2-CH (`:461-470`)

    # --- three carbon neighbors ---
    if hc == (0, 0, 1):
        return _sym_lines(6.1, [0.5, 0.5])  # (`:474-478`)
    if hc == (0, 1, 1):
        return _sym_lines(7.0, [0.25, 0.5, 0.25])  # (`:480-485`)
    if hc == (0, 2, 2):
        return _sym_lines(7.5, [1 / 9, 2 / 9, 3 / 9, 2 / 9, 1 / 9])  # (`:487-494`)
    if hc == (0, 0, 2):
        return _sym_lines(7.0, [0.25, 0.5, 0.25])  # (`:495-502`)
    if hc == (0, 1, 2):
        return _sym_lines(7.0, [1 / 6, 2 / 6, 2 / 6, 1 / 6])  # (`:504-516`)
    if hc == (1, 2, 2):
        return _sym_lines(
            3.0,
            [1 / 42, 2 / 42, 3 / 42, 4 / 42, 5 / 42, 6 / 42, 6 / 42, 5 / 42, 4 / 42, 3 / 42, 2 / 42, 1 / 42],
        )  # CH-CH-(CH2)2 (`:518-535`)
    if hc == (2, 2, 2):
        return _sym_lines(6.2, [1 / 16, 2 / 16, 3 / 16, 4 / 16, 3 / 16, 2 / 16, 1 / 16])  # (`:537-546`)

    # --- fallback for cases the reference leaves uncovered ---
    n = sum(hc)
    if n == 0:
        return [(0.0, float(nh))]
    coeffs = _pascal(n)
    scale = float(2 ** n)
    return _sym_lines(7.0, [nh * c / scale for c in coeffs])


def reconstruct_1h(mol: Mol, shifts: AtomShifts) -> list[tuple[float, float]]:
    """Peak list [(shift, intensity), ...] with multiplet fine structure.
    Symmetric carbons emit once (the reference's set-dedup, `:737`);
    single-line patterns sit at the raw shift (`:680-683`)."""
    carbons = _h_bearing_carbons(mol)
    if not carbons:
        return []
    avg = _sym_averaged(mol, shifts.shift_h, carbons)
    classes = symmetry_classes(mol)
    group_repr: dict[int, int] = {}
    for i in carbons:
        group_repr.setdefault(classes[i], i)
    peaks: list[tuple[float, float]] = []
    for i in group_repr.values():
        pattern = _coupling_pattern(mol, i)
        if len(pattern) > 1:
            peaks.extend((avg[i] + j / SPECTROMETER_MHZ, v) for j, v in pattern)
        else:
            peaks.append((avg[i], pattern[0][1]))
    uniq = sorted({(round(p, 4), round(x, 4)) for p, x in peaks})
    return [(float(p), float(x)) for p, x in uniq]


def lorentzian(x: np.ndarray, x0: float, gamma: float) -> np.ndarray:
    """Reference `lorentzian` (`data_generation_v15_4.py:122-123`)."""
    return (1.0 / np.pi) * (0.5 * gamma) / ((x - x0) ** 2 + (0.5 * gamma) ** 2)


def render_lorentzian(
    peaks: Sequence[tuple[float, float]],
    gamma: float = 0.01,
    n_points: int = 1000,
    pad_ppm: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Render a (shift, intensity) peak list to a continuous Lorentzian
    spectrum (reference `simulate_splitting`, `:126-134`). Returns (x, y)."""
    if not peaks:
        x = np.linspace(0.0, 10.0, n_points)
        return x, np.zeros_like(x)
    pos = np.array([p for p, _ in peaks])
    x = np.linspace(pos.min() - pad_ppm, pos.max() + pad_ppm, n_points)
    y = np.zeros_like(x)
    for p, v in peaks:
        y += v * lorentzian(x, p, gamma)
    return x, y


# ---------------------------------------------------------------------------
# 2D spectra with diastereotopic splitting
# ---------------------------------------------------------------------------

def _proton_shift_lists(
    mol: Mol, shifts: AtomShifts, carbons: Sequence[int]
) -> dict[int, list[float]]:
    """atom -> per-proton shift list: one entry normally, two for
    diastereotopic CH2 (reference `selecting_shifts`,
    `hsqc_nmr_reconstruction_v15_4.py:533-560`)."""
    split = diastereotopic_ch2(mol)
    avg = _sym_averaged(mol, shifts.shift_h, carbons)
    out: dict[int, list[float]] = {}
    for i in carbons:
        if i in split:
            if shifts.shift_h2 is not None:
                out[i] = [float(shifts.shift_h[i]), float(shifts.shift_h2[i])]
            else:
                d = DIASTEREOTOPIC_DELTA_H / 2.0
                out[i] = [avg[i] - d, avg[i] + d]
        else:
            out[i] = [avg[i]]
    return out


def reconstruct_hsqc(mol: Mol, shifts: AtomShifts) -> list[tuple[float, float]]:
    """[(delta_H, delta_C)] per symmetry-distinct H-bearing carbon, matching
    the dataloader's HSQC column order (H first: `dataloaders_pl_v15_4.py:
    348-366`). Diastereotopic CH2 carbons contribute two rows."""
    carbons = _h_bearing_carbons(mol)
    if not carbons:
        return []
    h_lists = _proton_shift_lists(mol, shifts, carbons)
    avg_c = _sym_averaged(mol, shifts.shift_c, carbons)
    classes = symmetry_classes(mol)
    seen = set()
    out = set()
    for i in carbons:
        if classes[i] in seen:
            continue
        seen.add(classes[i])
        for h in h_lists[i]:
            out.add((round(h, 2), round(avg_c[i], 2)))
    return sorted(out)


def reconstruct_cosy(mol: Mol, shifts: AtomShifts) -> list[tuple[float, float]]:
    """[(delta_H, delta_H')] cross peaks for adjacent H-bearing carbons plus
    the diagonal, symmetry-deduplicated (reference
    `cosy_nmr_reconstruction_v15_4.py:165-207`).

    DELIBERATE DEVIATION: the reference emits the full per-proton cross
    product only for carbons whose RDKit chiral TAG is set
    (`find_chiral_centers`, `:18-35` — CHI_UNSPECIFIED excluded). Factory
    SMILES carry no stereo tags, so that gate would never fire here;
    instead pairs touching a POTENTIAL stereocenter or a diastereotopic
    CH2 (sim.stereo) get the cross product — the peaks a real spectrum of
    either enantiomer would show."""
    carbons = set(_h_bearing_carbons(mol))
    if not carbons:
        return []
    h_lists = _proton_shift_lists(mol, shifts, sorted(carbons))
    split = diastereotopic_ch2(mol)
    centers = set(potential_stereocenters(mol))
    out = set()
    for i in sorted(carbons):
        out.add((round(h_lists[i][0], 2), round(h_lists[i][0], 2)))  # diagonal
        for j in mol.neighbors(i):
            if j not in carbons:
                continue
            if i in centers or j in centers or i in split or j in split:
                for h1 in h_lists[i]:
                    for h2 in h_lists[j]:
                        out.add((round(h1, 2), round(h2, 2)))
                        out.add((round(h2, 2), round(h1, 2)))
            else:
                out.add((round(h_lists[i][0], 2), round(h_lists[j][0], 2)))
                out.add((round(h_lists[j][0], 2), round(h_lists[i][0], 2)))
    return sorted(out)
