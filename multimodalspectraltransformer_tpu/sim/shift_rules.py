"""First-party empirical NMR shift prediction (additivity increment rules).

Replaces the reference's external SGNN MPNN (`sgnn_code_pl_v15_4.py:
427-454,559-690`, pretrained on proprietary data not available in this
environment) as the factory's shift teacher. The rules are classic
Pretsch/Shoolery/Grant-Paul increment systems from the open literature:

- sp3 13C: Grant-Paul base -2.3 ppm + alpha/beta/gamma increments per
  heavy-atom neighbor by element and hybridization.
- alkene 13C: 123.3 base + same-carbon / far-carbon substituent increments.
- aromatic 13C: 128.5 base + (ipso, ortho, meta, para) increments per ring
  substituent + ring-heteroatom increments by ring distance
  (pyridine/pyrrole/furan/thiophene-calibrated).
- carbonyl/nitrile/alkyne 13C by functional class.
- 1H: CH3/CH2/CH bases + same-carbon and beta substituent increments;
  alkene 5.25 + gem/vicinal increments; aromatic 7.26 + (ortho, meta,
  para) substituent increments + ring-heteroatom increments; CHO 9.8.

Accuracy is a few ppm for 13C and a few tenths for 1H on common organics —
far better separated than the previous ~6-bucket rule (`factory.
empirical_shifts`), which is what matters for training data whose spectra
must discriminate between similar structures.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from ..chem.smiles import Mol
from .reconstruct import AtomShifts

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _bfs_paths(mol: Mol, start: int, cutoff: int) -> dict[int, tuple[int, int]]:
    """atom -> (distance, parent-on-shortest-path) within cutoff bonds."""
    dist: dict[int, tuple[int, int]] = {start: (0, -1)}
    q = deque([start])
    while q:
        v = q.popleft()
        d = dist[v][0]
        if d >= cutoff:
            continue
        for w in mol.neighbors(v):
            if w not in dist:
                dist[w] = (d + 1, v)
                q.append(w)
    return dist


def _is_carbonyl_c(mol: Mol, i: int) -> bool:
    if mol.atoms[i].symbol != "C":
        return False
    return any(
        mol.bonds[b].order == 2 and mol.atoms[mol.bonds[b].other(i)].symbol in ("O", "S")
        for b in mol.adjacency[i]
    )


def _is_nitrile_c(mol: Mol, i: int) -> bool:
    if mol.atoms[i].symbol != "C":
        return False
    return any(
        mol.bonds[b].order == 3 and mol.atoms[mol.bonds[b].other(i)].symbol == "N"
        for b in mol.adjacency[i]
    )


def _is_alkyne_c(mol: Mol, i: int) -> bool:
    return mol.atoms[i].symbol == "C" and any(
        mol.bonds[b].order == 3 and mol.atoms[mol.bonds[b].other(i)].symbol == "C"
        for b in mol.adjacency[i]
    )


def _is_imine_c(mol: Mol, i: int) -> bool:
    """Non-aromatic C double-bonded to N: imine / amidine / guanidine /
    oxime / hydrazone carbons (all ~150-170 ppm, NOT sp3)."""
    a = mol.atoms[i]
    return (
        a.symbol == "C"
        and not a.aromatic
        and any(
            mol.bonds[b].order == 2
            and not mol.bonds[b].aromatic
            and mol.atoms[mol.bonds[b].other(i)].symbol == "N"
            for b in mol.adjacency[i]
        )
    )


def _imine_shifts(mol: Mol, i: int) -> tuple[float, float]:
    """C=N carbon: aldimine/ketimine ~165 ppm; each single-bonded N/O
    substituent (amidine, guanidine, carbamimidate) pulls toward ~155; an
    O on the imine nitrogen (oxime) sits near ~150."""
    n_single_het = 0
    oxime = False
    for j in mol.neighbors(i):
        b = mol.bond_between(i, j)
        if b is None:
            continue
        aj = mol.atoms[j]
        if b.order == 1 and aj.symbol in ("N", "O"):
            n_single_het += 1
        if b.order == 2 and aj.symbol == "N":
            if any(mol.atoms[k].symbol == "O" for k in mol.neighbors(j) if k != i):
                oxime = True
    c13 = 165.0 - 5.0 * min(n_single_het, 2) - (15.0 if oxime else 0.0)
    h1 = 7.8 if mol.total_h(i) else 0.0
    return c13, h1


def _is_alkene_c(mol: Mol, i: int) -> bool:
    a = mol.atoms[i]
    return (
        a.symbol == "C"
        and not a.aromatic
        and any(
            mol.bonds[b].order == 2
            and not mol.bonds[b].aromatic
            and mol.atoms[mol.bonds[b].other(i)].symbol == "C"
            for b in mol.adjacency[i]
        )
    )


def _is_nitro_n(mol: Mol, i: int) -> bool:
    if mol.atoms[i].symbol != "N":
        return False
    o = sum(1 for j in mol.neighbors(i) if mol.atoms[j].symbol == "O" and mol.total_h(j) == 0)
    return o >= 2


def _is_ester_o(mol: Mol, i: int) -> bool:
    """SINGLE-bonded O whose other neighbor is a carbonyl carbon (the
    -O- of an ester/acid linkage). The carbonyl's own =O must NOT match:
    without the order-1 check every ketone/aldehyde/amide oxygen was
    classified as an ester O (phantom C-O bands in the IR teacher,
    'OC=O' aromatic increments for quinone-type substituents)."""
    a = mol.atoms[i]
    if a.symbol != "O" or mol.total_h(i) > 0:
        return False
    for j in mol.neighbors(i):
        b = mol.bond_between(i, j)
        if b is not None and b.order == 1 and not b.aromatic and _is_carbonyl_c(mol, j):
            return True
    return False


# ---------------------------------------------------------------------------
# substituent classification for aromatic increment tables
# ---------------------------------------------------------------------------

# (ipso, ortho, meta, para) 13C increments relative to benzene 128.5
_AR13C = {
    "CH3": (9.3, 0.7, -0.1, -2.9),
    "alkyl": (14.2, -0.2, -0.2, -2.8),
    "vinyl": (9.5, -2.0, 0.2, -0.5),
    "aryl": (13.1, -1.1, 0.4, -1.1),
    "CHO": (8.6, 1.3, 0.6, 5.5),
    "C=O": (9.1, 0.1, 0.0, 4.2),
    "COOR": (2.1, 1.1, 0.0, 4.5),
    "CN": (-15.4, 3.6, 0.6, 3.9),
    "OH": (26.9, -12.7, 1.4, -7.3),
    "OR": (31.4, -14.4, 1.0, -7.7),
    "OC=O": (23.0, -6.4, 1.3, -2.3),
    "NH2": (18.0, -13.3, 0.9, -9.8),
    "NR2": (22.4, -15.7, 0.8, -11.8),
    "NO2": (20.0, -4.8, 0.9, 5.8),
    "F": (34.8, -12.9, 1.4, -4.5),
    "Cl": (6.2, 0.4, 1.3, -1.9),
    "Br": (-5.5, 3.4, 1.7, -1.6),
    "I": (-34.3, 8.9, 1.6, -1.1),
    "S": (2.3, 0.6, 0.2, -3.3),
}

# (ortho, meta, para) 1H increments relative to benzene 7.26
_AR1H = {
    "CH3": (-0.20, -0.12, -0.22),
    "alkyl": (-0.14, -0.06, -0.17),
    "vinyl": (0.06, -0.03, -0.10),
    "aryl": (0.30, 0.12, 0.10),
    "CHO": (0.56, 0.22, 0.29),
    "C=O": (0.62, 0.14, 0.21),
    "COOR": (0.71, 0.11, 0.21),
    "CN": (0.36, 0.18, 0.28),
    "OH": (-0.56, -0.12, -0.45),
    "OR": (-0.48, -0.09, -0.44),
    "OC=O": (-0.25, 0.03, -0.13),
    "NH2": (-0.75, -0.25, -0.65),
    "NR2": (-0.66, -0.18, -0.67),
    "NO2": (0.95, 0.26, 0.38),
    "F": (-0.26, 0.00, -0.20),
    "Cl": (0.03, -0.02, -0.09),
    "Br": (0.18, -0.08, -0.04),
    "I": (0.39, -0.21, 0.00),
    "S": (-0.08, -0.10, -0.20),
}

# ring heteroatom increments by ring graph-distance (1, 2, 3), calibrated
# on pyridine (149.9/123.8/136.0; 8.60/7.25/7.64), pyrrole (118.4/108.0;
# 6.68/6.22), furan (142.8/109.6; 7.42/6.37), thiophene (125.4/127.2;
# 7.20/7.10)
_RING_HET_13C = {
    "N": (21.4, -4.7, 7.5),  # pyridine-like (no H on N)
    "NH": (-10.1, -20.5, 0.0),  # pyrrole-like
    "O": (14.3, -18.9, 0.0),
    "S": (-3.1, -1.3, 0.0),
}
_RING_HET_1H = {
    "N": (1.34, -0.01, 0.38),
    "NH": (-0.58, -1.04, 0.0),
    "O": (0.16, -0.89, 0.0),
    "S": (-0.06, -0.16, 0.0),
}


def _classify_substituent(mol: Mol, sub: int) -> str:
    """Map the first atom of an aromatic substituent to an increment key."""
    a = mol.atoms[sub]
    sym = a.symbol
    if sym == "C":
        if a.aromatic:
            return "aryl"
        if _is_nitrile_c(mol, sub):
            return "CN"
        if _is_carbonyl_c(mol, sub):
            has_o_single = any(
                mol.atoms[j].symbol == "O"
                and (mol.bond_between(sub, j) is not None and mol.bond_between(sub, j).order == 1)
                for j in mol.neighbors(sub)
            )
            if has_o_single:
                return "COOR"
            return "CHO" if mol.total_h(sub) > 0 else "C=O"
        if _is_alkene_c(mol, sub):
            return "vinyl"
        return "CH3" if mol.total_h(sub) == 3 else "alkyl"
    if sym == "O":
        if _is_ester_o(mol, sub):
            return "OC=O"
        return "OH" if mol.total_h(sub) > 0 else "OR"
    if sym == "N":
        if _is_nitro_n(mol, sub):
            return "NO2"
        return "NH2" if mol.total_h(sub) > 0 else "NR2"
    if sym in ("F", "Cl", "Br", "I"):
        return sym
    if sym == "S":
        return "S"
    return "alkyl"


# ---------------------------------------------------------------------------
# sp3 increments
# ---------------------------------------------------------------------------

# alpha (directly bonded) 13C increments by neighbor kind. C_co =
# ketone/aldehyde carbonyl (acetone CH3 30.8), C_coo = acid/ester/amide
# carbonyl (acetic acid CH3 20.8, methyl acetate 20.6, acetamide 22.1).
_SP3_ALPHA_13C = {
    "C": 9.1,
    "C_ar": 22.1,
    "C_co": 33.1,
    "C_coo": 23.5,
    "C_cn": 4.0,
    "C_alkene": 14.8,
    "C_alkyne": 4.5,
    "O": 52.6,
    "O_ester": 51.0,
    "N": 28.3,
    "N_no2": 64.0,
    "F": 70.1,
    "Cl": 31.0,
    "Br": 18.9,
    "I": -7.2,
    "S": 10.6,
    "P": 11.0,
}
_SP3_BETA_13C = {
    "C": 9.4, "C_ar": 9.3, "C_co": 3.0, "C_coo": 3.0, "C_cn": 3.0,
    "C_alkene": 6.9, "C_alkyne": 5.5, "O": 10.1, "O_ester": 6.5, "N": 11.3,
    "N_no2": 4.0, "F": 7.8, "Cl": 10.0, "Br": 11.0, "I": 10.9, "S": 11.4,
    "P": 5.0,
}
_SP3_GAMMA_13C = {
    "C": -2.5, "C_ar": -2.6, "C_co": -3.0, "C_coo": -3.0, "C_cn": -3.0,
    "C_alkene": -2.1, "C_alkyne": -3.5, "O": -6.2, "O_ester": -6.0,
    "N": -5.1, "N_no2": -4.0, "F": -6.8, "Cl": -5.1, "Br": -3.8, "I": -1.5,
    "S": -3.6, "P": -3.0,
}

# 1H same-carbon increments by neighbor kind (base CH3 0.86 / CH2 1.20 / CH 1.55)
_SP3_ALPHA_1H = {
    "C": 0.05,
    "C_ar": 1.40,
    "C_co": 1.20,
    "C_coo": 1.20,
    "C_cn": 1.10,
    "C_alkene": 0.75,
    "C_alkyne": 0.90,
    "O": 2.40,
    "O_ester": 2.90,
    "N": 1.55,
    "N_no2": 3.40,
    "F": 3.30,
    "Cl": 2.05,
    "Br": 1.85,
    "I": 1.30,
    "S": 1.20,
    "P": 0.80,
}
_SP3_BETA_1H = {
    "C": 0.0, "C_ar": 0.30, "C_co": 0.25, "C_coo": 0.25, "C_cn": 0.25,
    "C_alkene": 0.15, "C_alkyne": 0.20, "O": 0.25, "O_ester": 0.35,
    "N": 0.12, "N_no2": 0.55, "F": 0.40, "Cl": 0.35, "Br": 0.38, "I": 0.40,
    "S": 0.25, "P": 0.15,
}

# heteroatom kinds participating in the polyfunctional damping correction
_POLAR_KINDS = {"O", "O_ester", "N", "N_no2", "F", "Cl", "Br"}


def _neighbor_kind(mol: Mol, j: int) -> str:
    a = mol.atoms[j]
    sym = a.symbol
    if sym == "C":
        if a.aromatic:
            return "C_ar"
        if _is_nitrile_c(mol, j):
            return "C_cn"
        if _is_carbonyl_c(mol, j):
            hetero_single = any(
                mol.atoms[k].symbol in ("O", "N")
                and mol.bond_between(j, k) is not None
                and mol.bond_between(j, k).order == 1
                for k in mol.neighbors(j)
            )
            return "C_coo" if hetero_single else "C_co"
        if _is_alkyne_c(mol, j):
            return "C_alkyne"
        if _is_alkene_c(mol, j):
            return "C_alkene"
        return "C"
    if sym == "O":
        return "O_ester" if _is_ester_o(mol, j) else "O"
    if sym == "N":
        return "N_no2" if _is_nitro_n(mol, j) else "N"
    if sym in ("F", "Cl", "Br", "I", "S", "P"):
        return sym
    return "C"


# ---------------------------------------------------------------------------
# per-class predictors
# ---------------------------------------------------------------------------


def _path_blocked(mol: Mol, paths: dict[int, tuple[int, int]], j: int) -> bool:
    """True when the shortest path to j runs THROUGH a pi system (aromatic,
    carbonyl, or nitrile carbon): alpha increments for those neighbors are
    calibrated as whole-group effects, so atoms beyond them must not also
    contribute beta/gamma terms (fixes toluene CH3 19.8 not 33, acetone CH3
    30.8 not 50)."""
    v = paths[j][1]
    while v != -1:
        pd, parent = paths[v]
        if pd == 0:
            return False
        a = mol.atoms[v]
        if a.symbol == "C" and (
            a.aromatic or _is_carbonyl_c(mol, v) or _is_nitrile_c(mol, v)
        ):
            return True
        # carbonyl =O also shields anything past it
        if a.symbol == "O" and any(
            mol.bonds[b].order == 2 for b in mol.adjacency[v]
        ):
            return True
        v = parent
    return False


def _sp3_shifts(mol: Mol, i: int) -> tuple[float, float]:
    paths = _bfs_paths(mol, i, 3)
    c13 = -2.3
    nh = mol.total_h(i)
    h1 = {3: 0.86, 2: 1.20, 1: 1.55}.get(nh, 0.0)
    alpha_c_count = 0
    polar_near = 0  # polar groups within 2 bonds, for non-additivity damping
    pi_alpha = 0  # aromatic/carbonyl/alkene alpha neighbors
    polar_alpha = 0
    for j, (d, _) in paths.items():
        if j == i:
            continue
        if d >= 2 and _path_blocked(mol, paths, j):
            continue
        kind = _neighbor_kind(mol, j)
        if d == 1:
            c13 += _SP3_ALPHA_13C.get(kind, 9.1)
            if kind == "C":
                alpha_c_count += 1
            if kind in ("C_ar", "C_co", "C_coo", "C_alkene"):
                pi_alpha += 1
            h1 += _SP3_ALPHA_1H.get(kind, 0.05)
            if kind in _POLAR_KINDS:
                polar_near += 1
                polar_alpha += 1
        elif d == 2:
            c13 += _SP3_BETA_13C.get(kind, 9.4)
            h1 += _SP3_BETA_1H.get(kind, 0.0)
            if kind in _POLAR_KINDS:
                polar_near += 1
        elif d == 3:
            c13 += _SP3_GAMMA_13C.get(kind, -2.5)
    # polyfunctional non-additivity: each polar group beyond the first within
    # two bonds overshoots plain additivity (ethylene glycol 63.4 not 69.5,
    # glycerol C2 72.7 not 88.7)
    if polar_near >= 2:
        c13 -= 6.0 * (polar_near - 1)
        h1 -= 0.15 * (polar_near - 1)
    # benzylic/allylic polar centers also overshoot (PhCH2OH 65.1 not 72.4)
    c13 -= 5.0 * min(pi_alpha, 1) * min(polar_alpha, 1)
    # steric correction for branched centers (Grant-Paul pairing terms,
    # collapsed to a simple quadratic)
    if alpha_c_count >= 3:
        c13 -= 1.1 * (alpha_c_count - 2) * max(nh + alpha_c_count - 3, 0)
    return c13, min(h1, 9.9)


def _alkene_shifts(mol: Mol, i: int) -> tuple[float, float]:
    c13 = 123.3
    h1 = 5.25
    # partner carbon(s) across the double bond
    partners = [
        mol.bonds[b].other(i)
        for b in mol.adjacency[i]
        if mol.bonds[b].order == 2 and mol.atoms[mol.bonds[b].other(i)].symbol == "C"
    ]
    for j in mol.neighbors(i):
        if j in partners:
            continue
        kind = _neighbor_kind(mol, j)
        c13 += {"C": 10.6, "C_ar": 12.5, "C_co": 6.0, "C_alkene": 13.6,
                "O": 28.8, "O_ester": 18.0, "N": 16.0, "Cl": 2.6, "Br": -8.6,
                "F": 24.9, "S": 9.0}.get(kind, 10.0)
        h1 += {"C": 0.45, "C_ar": 1.38, "C_co": 1.10, "C_alkene": 1.00,
               "O": 1.22, "O_ester": 2.11, "N": 0.80, "Cl": 1.08, "Br": 1.07,
               "F": 1.54, "S": 1.11}.get(kind, 0.45)
    for p in partners:
        for j in mol.neighbors(p):
            if j == i:
                continue
            kind = _neighbor_kind(mol, j)
            c13 += {"C": -7.9, "C_ar": -11.0, "C_co": 5.0, "C_alkene": -7.0,
                    "O": -39.0, "O_ester": -27.0, "N": -29.0, "Cl": -6.1,
                    "Br": -0.6, "F": -34.3, "S": -13.0}.get(kind, -7.9)
            h1 += {"C": -0.25, "C_ar": 0.36, "C_co": 0.95, "C_alkene": 0.00,
                   "O": -1.10, "O_ester": -0.40, "N": -1.20, "Cl": 0.18,
                   "Br": 0.40, "F": -0.40, "S": -0.20}.get(kind, -0.25)
    return c13, min(max(h1, 3.8), 8.5)


def _carbonyl_shifts(mol: Mol, i: int) -> tuple[float, float]:
    nbr_syms = []
    has_oh, has_or, has_n = False, False, False
    conjugated = False
    for j in mol.neighbors(i):
        b = mol.bond_between(i, j)
        s = mol.atoms[j].symbol
        if b.order == 2 and s in ("O", "S"):
            continue
        nbr_syms.append(s)
        if s == "O":
            if mol.total_h(j) > 0:
                has_oh = True
            else:
                has_or = True
        elif s == "N":
            has_n = True
        elif s == "C" and (mol.atoms[j].aromatic or _is_alkene_c(mol, j)):
            conjugated = True
    nh = mol.total_h(i)
    if has_n:
        c13 = 170.0
    elif has_oh:
        c13 = 178.0
    elif has_or:
        c13 = 170.5
    elif nh > 0:
        c13 = 200.5
    else:
        c13 = 206.0
    if conjugated:
        c13 -= 8.0
    h1 = 9.8 if nh > 0 else 0.0  # aldehyde proton
    return c13, h1


def _aromatic_shifts(mol: Mol, i: int, aromatic_dist: dict[int, int]) -> tuple[float, float]:
    c13 = 128.5
    h1 = 7.26
    for j, d in aromatic_dist.items():
        aj = mol.atoms[j]
        if aj.symbol != "C":
            # ring heteroatom increment by distance
            key = aj.symbol
            if key == "N" and (mol.total_h(j) > 0 or aj.charge > 0):
                key = "NH"
            inc_c = _RING_HET_13C.get(key)
            inc_h = _RING_HET_1H.get(key)
            if inc_c and 1 <= d <= 3:
                c13 += inc_c[d - 1]
                h1 += inc_h[d - 1]
            continue
        # substituents hanging off ring carbon j
        for s in mol.neighbors(j):
            if s in aromatic_dist and mol.atoms[s].aromatic:
                continue
            key = _classify_substituent(mol, s)
            inc_c = _AR13C.get(key)
            inc_h = _AR1H.get(key)
            if inc_c and d <= 3:
                c13 += inc_c[min(d, 3)]
                if d >= 1 and inc_h:
                    h1 += inc_h[min(d, 3) - 1]
    return c13, min(max(h1, 5.5), 9.5)


def predict_shifts(mol: Mol) -> AtomShifts:
    """Per-heavy-atom (13C, attached-1H) shifts via increment rules."""
    n = mol.num_atoms
    c = np.zeros(n)
    h = np.zeros(n)

    # per-aromatic-atom distance maps restricted to the aromatic system
    def aromatic_distances(start: int) -> dict[int, int]:
        # traverse aromatic RING bonds only: following mere atom
        # aromaticity walks across biaryl single bonds, leaking one ring's
        # heteroatom increments into the other (and hiding the other ring
        # from the 'aryl' substituent increment)
        dist = {start: 0}
        q = deque([start])
        while q:
            v = q.popleft()
            if dist[v] >= 3:
                continue
            for w in mol.neighbors(v):
                if w in dist or not mol.atoms[w].aromatic:
                    continue
                b = mol.bond_between(v, w)
                if b is None or not b.aromatic:
                    continue
                dist[w] = dist[v] + 1
                q.append(w)
        return dist

    for i, a in enumerate(mol.atoms):
        if a.symbol != "C":
            # proton shifts for N-H/O-H are not emitted (reference skips
            # heteroatom protons, `data_generation_v15_4.py:250`), but give
            # heteroatoms plausible H values for completeness
            h[i] = {"O": 2.5, "N": 1.5, "S": 1.3}.get(a.symbol, 0.0) if mol.total_h(i) else 0.0
            continue
        if a.aromatic:
            c[i], h[i] = _aromatic_shifts(mol, i, aromatic_distances(i))
        elif _is_nitrile_c(mol, i):
            c[i], h[i] = 118.2, 0.0
        elif _is_carbonyl_c(mol, i):
            c[i], h[i] = _carbonyl_shifts(mol, i)
        elif _is_alkyne_c(mol, i):
            subs = sum(1 for j in mol.neighbors(i) if mol.atoms[j].symbol == "C")
            c[i] = 68.0 + 12.0 * (subs - 1)
            h[i] = 2.0 if mol.total_h(i) else 0.0
        elif _is_imine_c(mol, i):
            c[i], h[i] = _imine_shifts(mol, i)
        elif _is_alkene_c(mol, i):
            c[i], h[i] = _alkene_shifts(mol, i)
        else:
            c[i], h[i] = _sp3_shifts(mol, i)
    return AtomShifts(np.clip(c, -20.0, 230.0), np.clip(h, 0.0, 11.0))
