"""Stereocenter detection and diastereotopic-proton analysis.

Re-implements the behavior of the reference's chirality pipeline
(`hsqc_nmr_reconstruction_v15_4.py:13-63` run_chiral_and_symmetry_finder and
its helpers at `:120-287,363-375`): find (potential) stereocenters, walk out
to their first- and second-degree carbon neighbors, and keep the CH2 carbons
whose two geminal protons are diastereotopic (distinct chemical shifts).

Differences from the reference, by design:
- The reference detects stereocenters by enumerating stereoisomers with
  RDKit and string-scanning the isomeric SMILES for "@" (`:342-360`), which
  tags *potential* centers even on achiral-drawn input. Here a potential
  stereocenter is found directly on the graph: an sp3 carbon with <=1 H
  whose neighbor branches are pairwise distinct under the molecule's Morgan
  symmetry classes (`chem.canonical.symmetry_classes`). Explicit @/@@ tags
  are honored as centers regardless (covers the reference's N@ case,
  `:352-354`).
- The reference's `check_for_symmetric_substituents` / `remove_symmetric_
  centers` steps (`:229-268`) prune CH3-like candidates; the final
  exactly-two-protons filter (`check_for_two_H`, `:274-286`) subsumes them
  here.
"""

from __future__ import annotations

from ..chem.canonical import symmetry_classes
from ..chem.smiles import Mol


def _is_sp3_carbon(mol: Mol, i: int) -> bool:
    a = mol.atoms[i]
    if a.symbol != "C" or a.aromatic:
        return False
    return all(
        mol.bonds[b].order == 1 and not mol.bonds[b].aromatic for b in mol.adjacency[i]
    )


def potential_stereocenters(mol: Mol) -> list[int]:
    """Atoms that are (or could be) stereocenters: explicitly tagged @/@@
    atoms, plus sp3 carbons with <=1 H and pairwise-distinct neighbor
    branches (reference `get_chiral_carbons`, which sees "@" tags on the
    first enumerated stereoisomer — i.e. potential centers)."""
    classes = symmetry_classes(mol)
    out = []
    for i, a in enumerate(mol.atoms):
        if a.chirality:
            out.append(i)
            continue
        if not _is_sp3_carbon(mol, i):
            continue
        nh = mol.total_h(i)
        nbrs = mol.neighbors(i)
        if nh > 1 or nh + len(nbrs) != 4:
            continue
        ncls = [classes[j] for j in nbrs]
        if len(set(ncls)) == len(ncls):
            out.append(i)
    return out


def _is_terminal_center(mol: Mol, i: int) -> bool:
    """Reference `check_terminal_chiral_center` (`:363-375`): a center whose
    non-carbon substituents (implicit H included — the reference works on an
    AddHs mol) span exactly 3 distinct element symbols."""
    syms = {mol.atoms[j].symbol for j in mol.neighbors(i) if mol.atoms[j].symbol != "C"}
    if mol.total_h(i) > 0:
        syms.add("H")
    return len(syms) == 3


def _adjacent_to_aromatic_ring(mol: Mol, i: int) -> bool:
    """Reference `get_exclude_second_degree_list` (`:164-185`): a center with
    an aromatic ring carbon as direct neighbor does not split its
    second-degree shell."""
    return any(
        mol.atoms[j].symbol == "C" and mol.atoms[j].aromatic and mol.atoms[j].in_ring
        for j in mol.neighbors(i)
    )


def diastereotopic_ch2(mol: Mol) -> set[int]:
    """Carbon indices whose two geminal protons are diastereotopic and
    should emit two distinct HSQC/COSY peaks.

    Candidate shells around each potential stereocenter (reference
    `chiral_center_type` + `get_second_degree_neighbor` +
    `get_all_chiral_split_positions`, `:120-225`):
    - direct carbon neighbors (terminal and non-terminal centers alike);
    - second-degree carbon neighbors of non-terminal centers, unless the
      center sits next to an aromatic ring; second-degree atoms that are
      themselves centers or first-shell atoms are excluded.
    Candidates are kept only with exactly two attached protons
    (`check_for_two_H`, `:274-286`).
    """
    centers = potential_stereocenters(mol)
    if not centers:
        return set()
    center_set = set(centers)

    direct: dict[int, list[int]] = {}
    terminal: dict[int, list[int]] = {}
    for c in centers:
        c_nbrs = [j for j in mol.neighbors(c) if mol.atoms[j].symbol == "C"]
        (terminal if _is_terminal_center(mol, c) else direct)[c] = c_nbrs
    direct_all = {j for v in direct.values() for j in v}
    terminal_all = {j for v in terminal.values() for j in v}

    second: list[int] = []
    for c, nbrs in direct.items():
        if _adjacent_to_aromatic_ring(mol, c):
            continue
        for n in nbrs:
            for j in mol.neighbors(n):
                if (
                    mol.atoms[j].symbol == "C"
                    and j not in center_set
                    and j not in direct_all
                    and j not in terminal_all
                ):
                    second.append(j)

    candidates = list(direct_all) + second + list(terminal_all)
    return {i for i in candidates if mol.total_h(i) == 2}
