"""Tokenizer/vocab golden tests against reference behavior
(`helper_functions_pl_v15_4.py:188`, `dataloaders_pl_v15_4.py:411,631-649`)."""

import numpy as np

from multimodalspectraltransformer_tpu.chem import tokenizer
from multimodalspectraltransformer_tpu.utils import vocab


def test_smiles_vocab_table():
    assert vocab.SMILES_VOCAB_SIZE == 43
    assert vocab.SMILES_STOI["<PAD>"] == 0
    assert vocab.SMILES_STOI["<SOS>"] == 3
    assert vocab.SMILES_STOI["Cl"] == 23
    assert vocab.SMILES_STOI["B"] == 42
    assert vocab.SMILES_ITOS[13] == "c"


def test_mf_vocab_table():
    assert vocab.MF_VOCAB_SIZE == 212
    assert vocab.MF_STOI["<SOS>"] == 1
    assert vocab.MF_STOI["C"] == 107
    assert vocab.MF_STOI["100"] == 212
    assert 0 not in vocab.MF_ITOS  # id 0 is padding


def test_tokenize_smiles_two_letter():
    assert tokenizer.tokenize_smiles("CCl") == ["C", "Cl"]
    assert tokenizer.tokenize_smiles("c1ccccc1Br") == ["c", "1", "c", "c", "c", "c", "c", "1", "Br"]
    # 'Sc' (scandium) is NOT in the reference's two-letter table, so 'Sc'
    # inside SMILES splits to S + c (thiophene-like aromatics keep working).
    assert tokenizer.tokenize_smiles("Sc1") == ["S", "c", "1"]


def test_tokenize_smiles_trailing_pair():
    # the i < len-1 guard still allows a pair ending at the last char
    assert tokenizer.tokenize_smiles("Cl") == ["Cl"]
    assert tokenizer.tokenize_smiles("C") == ["C"]


def test_encode_smiles_ids():
    ids = tokenizer.encode_smiles("CCO")
    assert ids == [5, 5, 20]
    # unknown char maps to <UNK>
    assert tokenizer.encode_smiles("Z") == [vocab.UNK_ID]


def test_tokenize_mf():
    assert tokenizer.tokenize_mf("C9H11NO2") == ["C", "9", "H", "11", "N", "O", "2"]
    assert tokenizer.tokenize_mf("CH4") == ["C", "H", "4"]
    # counts are capped at two digits by the reference regex; the orphan
    # third digit matches no token and is dropped (reference quirk):
    assert tokenizer.tokenize_mf("C123") == ["C", "12"]


def test_frame_and_pad():
    toks, mask = tokenizer.encode_smiles_framed("CCO", 10)
    assert toks.tolist() == [3, 5, 5, 20, 2, 0, 0, 0, 0, 0]
    assert mask.tolist() == [0, 0, 0, 0, 0, 1, 1, 1, 1, 1]
    # round-trip through detokenizer stops at EOS
    assert vocab.ids_to_smiles(toks[1:]) == "CCO"


def test_frame_and_pad_mf_uses_smiles_specials():
    toks, _ = tokenizer.encode_mf_framed("CH4", 8)
    # reference frames MF with the SMILES vocab's SOS(3)/EOS(2)
    assert toks[0] == 3
    assert toks[4] == 2
    assert toks[1] == vocab.MF_STOI["C"]


def test_batch_detokenize():
    arr = np.array([[3, 5, 2, 0], [3, 13, 10, 2]])
    # note: ids_to_smiles does not strip <SOS>; callers strip it (as the
    # reference does by slicing [1:])
    assert vocab.batch_ids_to_smiles(arr[:, 1:]) == ["C", "c1"]
