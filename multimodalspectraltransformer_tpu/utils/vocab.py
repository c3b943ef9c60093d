"""SMILES and molecular-formula vocabularies.

These token tables are *data* shared with the reference framework
(`/root/reference/stoi.json`, `/root/reference/stoi_MF.json`) — any model
checkpoint converted from (or evaluated against) the reference must use the
identical id assignment, so they are reproduced verbatim here.

SMILES vocab: 43 tokens, ids 0..42, specials <PAD>=0 <UNK>=1 <EOS>=2 <SOS>=3
<MASK>=4 then characters/two-letter elements. MF vocab: 212 tokens, ids
1..212 (id 0 is implicit padding — the reference's MF embedding uses
padding_idx=0 and no token maps to 0).
"""

from __future__ import annotations

from typing import Iterable

PAD_ID = 0
UNK_ID = 1
EOS_ID = 2
SOS_ID = 3
MASK_ID = 4

SMILES_STOI: dict[str, int] = {
    "<PAD>": 0, "<UNK>": 1, "<EOS>": 2, "<SOS>": 3, "<MASK>": 4,
    "C": 5, "[": 6, "@": 7, "H": 8, "]": 9, "1": 10, "(": 11, "N": 12,
    "c": 13, "2": 14, "n": 15, "-": 16, "3": 17, ")": 18, "#": 19,
    "O": 20, "=": 21, "S": 22, "Cl": 23, "O-": 24, "+": 25, "s": 26,
    "Br": 27, "/": 28, "F": 29, "4": 30, "o": 31, "N+": 32, "\\": 33,
    "5": 34, "n+": 35, "6": 36, "7": 37, "I": 38, "P": 39, "8": 40,
    "p": 41, "B": 42,
}

SMILES_ITOS: dict[int, str] = {v: k for k, v in SMILES_STOI.items()}

SMILES_VOCAB_SIZE = 43
assert len(SMILES_STOI) == SMILES_VOCAB_SIZE

# Molecular-formula vocabulary: specials, '|' separator, all element symbols,
# then counts in corpus-frequency order (ids 1..212; 0 = padding).
_MF_TOKENS_1_TO_212: tuple[str, ...] = (
    "<SOS>", "<EOS>", "<MASK>", "|", "H", "He", "Li", "Be", "Ne", "Na",
    "Mg", "Al", "Si", "Cl", "Ar", "Ca", "Sc", "Ti", "Cr", "Mn",
    "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br",
    "Kr", "Rb", "Sr", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd",
    "Ag", "Cd", "In", "Sn", "Sb", "Te", "I", "Xe", "Cs", "Ba",
    "La", "Ce", "Pr", "Nd", "Pm", "Sm", "Eu", "Gd", "Tb", "Dy",
    "Ho", "Er", "Tm", "Yb", "Lu", "Hf", "Ta", "W", "Re", "Os",
    "Ir", "Pt", "Au", "Hg", "Tl", "Pb", "Bi", "Th", "Pa", "U",
    "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm", "Md", "No",
    "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds", "Rg", "Cn",
    "Nh", "Fl", "Mc", "Lv", "Ts", "Og", "C", "10", "21", "N",
    "12", "22", "O", "9", "16", "2", "6", "8", "4", "15",
    "7", "17", "3", "14", "5", "11", "20", "13", "19", "18",
    "23", "24", "26", "25", "27", "28", "S", "F", "P", "1",
    "29", "30", "31", "32", "33", "34", "35", "36", "37", "38",
    "39", "40", "41", "42", "43", "44", "45", "46", "47", "48",
    "49", "50", "51", "52", "53", "54", "55", "56", "57", "58",
    "59", "60", "61", "62", "63", "64", "65", "66", "67", "68",
    "69", "B", "71", "72", "73", "74", "75", "76", "77", "78",
    "79", "80", "81", "82", "83", "84", "85", "86", "87", "88",
    "89", "90", "91", "92", "93", "94", "95", "96", "97", "98",
    "99", "100",
)

MF_STOI: dict[str, int] = {t: i + 1 for i, t in enumerate(_MF_TOKENS_1_TO_212)}
MF_ITOS: dict[int, str] = {v: k for k, v in MF_STOI.items()}
MF_VOCAB_SIZE = 212
assert len(MF_STOI) == MF_VOCAB_SIZE


def ids_to_smiles(ids: Iterable[int]) -> str:
    """Detokenize SMILES ids, stopping at the first <EOS>
    (reference: `helper_functions_pl_v15_4.py:239` tensor_to_smiles)."""
    out = []
    for i in ids:
        i = int(i)
        if i == EOS_ID:
            break
        out.append(SMILES_ITOS.get(i, "<UNK>"))
    return "".join(out)


def batch_ids_to_smiles(arr) -> list[str]:
    """Detokenize a [batch, seq] array of ids."""
    return [ids_to_smiles(row) for row in arr]
