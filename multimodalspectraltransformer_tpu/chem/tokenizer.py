"""SMILES and molecular-formula tokenization.

Behavioral parity with the reference tokenizers:
- SMILES: greedy char scan with two-letter element lookahead
  (`helper_functions_pl_v15_4.py:188-209`, element table at `:177-186`).
- MF: regex ``([A-Z][a-z]*)(\\d{1,2})?`` over the Hill-format formula
  (`dataloaders_pl_v15_4.py:411-421`).
- Framing: ``<SOS> + tokens + <EOS>`` zero-padded to a fixed length
  (`dataloaders_pl_v15_4.py:631-649`). Note the reference frames the MF
  sequence with the *SMILES* vocab's SOS/EOS ids (3/2) even though the MF
  vocab has its own; we reproduce that.

Everything here is host-side Python producing fixed-shape numpy arrays; the
device pipeline only ever sees static [len] int32 buffers.
"""

from __future__ import annotations

import re

import numpy as np

from ..utils import vocab

# Two-letter element symbols recognized inside SMILES strings
# (same table the reference scans; order irrelevant, membership test only).
TWO_CHAR_SYMBOLS: frozenset[str] = frozenset({
    "He", "Li", "Be", "Ne", "Na", "Mg", "Al", "Si", "Cl", "Ar",
    "Ca", "Ti", "Cr", "Mn", "Fe", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr", "Zr", "Nb",
    "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sb",
    "Te", "I", "Xe", "Ba", "La", "Ce", "Pr", "Nd", "Pm",
    "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb", "Lu",
    "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg", "Tl",
    "Pb", "Bi", "Th", "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk",
    "Cf", "Es", "Fm", "Md", "No", "Lr", "Rf", "Db", "Sg", "Bh",
    "Hs", "Mt", "Ds", "Rg", "Nh", "Fl", "Mc", "Lv", "Ts", "Og",
})

_MF_PATTERN = re.compile(r"([A-Z][a-z]*)(\d{1,2})?")


def tokenize_smiles(smiles: str) -> list[str]:
    """Split a SMILES string into tokens, preferring two-letter elements."""
    tokens: list[str] = []
    i = 0
    n = len(smiles)
    while i < n:
        pair = smiles[i : i + 2]
        if i < n - 1 and pair in TWO_CHAR_SYMBOLS:
            tokens.append(pair)
            i += 2
        else:
            tokens.append(smiles[i])
            i += 1
    return tokens


def encode_smiles(smiles: str) -> list[int]:
    """Tokenize and map to ids (<UNK> for unknown tokens)."""
    return [vocab.SMILES_STOI.get(t, vocab.UNK_ID) for t in tokenize_smiles(smiles)]


def tokenize_mf(formula: str) -> list[str]:
    """Tokenize a molecular formula like ``C9H11NO2`` into
    ``['C','9','H','11','N','O','2']`` (counts capped at 2 digits, as in the
    reference regex)."""
    tokens: list[str] = []
    for element, count in _MF_PATTERN.findall(formula):
        if not element:
            continue
        tokens.append(element)
        if count:
            tokens.append(count)
    return tokens


def encode_mf(formula: str) -> list[int]:
    # Reference uses stoi_MF.get(token, stoi_MF.get('<UNK>')) and the MF
    # vocab has no '<UNK>' entry, so unknown tokens map to None -> crash.
    # We map unknowns to <MASK> instead (documented deviation; no token in
    # the reference data ever misses).
    return [vocab.MF_STOI.get(t, vocab.MF_STOI["<MASK>"]) for t in tokenize_mf(formula)]


def frame_and_pad(ids: list[int], length: int) -> tuple[np.ndarray, np.ndarray]:
    """``<SOS> + ids + <EOS>`` zero-padded to ``length``.

    Returns (tokens[int32], pad_mask[int32]) where pad_mask is 1 on padding
    positions and 0 on real tokens — the reference's inverted-mask
    convention (`dataloaders_pl_v15_4.py:633-637`).

    Sequences longer than ``length - 2`` are truncated (the reference would
    produce a negative pad range and crash; truncation is the safe superset).
    """
    framed = [vocab.SOS_ID] + list(ids[: length - 2]) + [vocab.EOS_ID]
    out = np.zeros(length, dtype=np.int32)
    out[: len(framed)] = framed
    mask = np.ones(length, dtype=np.int32)
    mask[: len(framed)] = 0
    return out, mask


def encode_smiles_framed(smiles: str, length: int = 64) -> tuple[np.ndarray, np.ndarray]:
    return frame_and_pad(encode_smiles(smiles), length)


def encode_mf_framed(formula: str, length: int = 64) -> tuple[np.ndarray, np.ndarray]:
    return frame_and_pad(encode_mf(formula), length)


def decode_smiles(ids) -> str:
    return vocab.ids_to_smiles(ids)


def one_hot_smiles(smiles: str, max_len: int = 64) -> "np.ndarray":
    """Legacy one-hot SMILES encoding [max_len, vocab] (reference
    SmilesEnumerator.transform, `dataloaders_pl_v15_4.py:31-114` — kept for
    compatibility with one-hot-consuming tooling; the model itself consumes
    token ids)."""
    ids, _ = encode_smiles_framed(smiles, max_len)
    out = np.zeros((max_len, vocab.SMILES_VOCAB_SIZE), dtype=np.float32)
    out[np.arange(max_len), np.asarray(ids)] = 1.0
    return out
