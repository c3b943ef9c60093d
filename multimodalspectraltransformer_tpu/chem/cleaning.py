"""Dataset cleaning filters.

Reference: ``filter_invalid_criteria`` / ``clean_dataset``
(`execution_function_v15_4.py:224-310`) — canonicalize, drop molecules the
SGNN/MMT stack can't treat (phosphorus, silicon, bare boron, charged
bracket atoms, [NH+], [SH]) and strip stereochemistry markers. Applied to
improvement-cycle targets and generated-molecule pools before blending.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from . import api as chem

_BARE_B = re.compile(r"\bB\b(?!r)")
_BRACKET_CHARGE = re.compile(r"\[[^\]]*[-+][^\]]*\]")


def remove_stereo(smiles: str) -> str:
    """The reference's literal stereo stripping (`:255-258`): common chiral
    carbon tokens -> plain C, plus directional bond markers."""
    for tok in ("[C@@H]", "[C@H]", "[C@@]", "[C@]"):
        smiles = smiles.replace(tok, "C")
    return smiles.replace("/", "").replace("\\", "")


def passes_filters(smiles: str) -> bool:
    """Element/charge criteria of filter_invalid_criteria (`:242-253`)."""
    if "P" in smiles:  # the reference's bare 'P' substring check — it has
        return False   # NO Pt exemption, and the vocab has no 'Pt' token
    if "Si" in smiles:
        return False
    if "[B]" in smiles or _BARE_B.search(smiles):
        return False
    if "[NH+]" in smiles or "[SH]" in smiles:
        return False
    if _BRACKET_CHARGE.search(smiles):
        return False
    return True


def _clean_canonical(can: Optional[str]) -> Optional[str]:
    """Shared tail of the cleaning pipeline: criteria filter -> de-stereo
    -> re-canonicalize. Input must already be canonical (or None)."""
    if can is None or not passes_filters(can):
        return None
    stripped = remove_stereo(can)
    if stripped == can:  # this framework's canonical output carries no
        return can       # stereo tokens, so re-canonicalizing is a no-op
    return chem.canonicalize(stripped)


def clean_smiles(smiles: str) -> Optional[str]:
    """Canonicalize -> criteria filter -> de-stereo -> re-canonicalize.
    None when invalid or filtered."""
    return _clean_canonical(chem.canonicalize(smiles))


def clean_smiles_list(smiles_list: Sequence[str]) -> list[str]:
    """Batch cleaning (the DataFrame pipeline of the reference), preserving
    order, dropping failures."""
    out = []
    for can in chem.batch_canonicalize(list(smiles_list)):
        cleaned = _clean_canonical(can)
        if cleaned is not None:
            out.append(cleaned)
    return out
