"""Property-based chemistry fuzzing over randomized molecules.

The canonicalizer's edge cases kept surfacing one hand-found bug at a time
(cf. commit 9813899, NH-aromatic hydrogen loss); these invariants sweep a
large randomized space every CI run instead:

- randomize/canonicalize round trip: any SMILES form of a molecule
  canonicalizes back to the same string,
- canonical idempotence,
- parse/write preserves molecular invariants (formula, exact MW, atom and
  ring-bond counts),
- the C++ chemkernel stays bit-identical to the Python spec on the same
  randomized corpus (canonicalize, Morgan fingerprints, exact MW),
- weird-but-legal bracket atom/ring syntax survives the round trip.

The molecule source is data.molrandom (drug-like graft generator) plus
randomize_smiles re-rolls, giving thousands of distinct forms per run with
a fixed seed (deterministic CI).
"""

import random

import numpy as np
import pytest

from multimodalspectraltransformer_tpu.chem import api as chem
from multimodalspectraltransformer_tpu.chem.canonical import randomize_smiles
from multimodalspectraltransformer_tpu.chem.smiles import parse_smiles
from multimodalspectraltransformer_tpu.data import molrandom

N_MOLECULES = 400
N_FORMS = 3  # randomized re-writes per molecule -> ~1600 forms swept


@pytest.fixture(scope="module")
def corpus():
    return molrandom.random_corpus(N_MOLECULES, seed=1234)


def test_randomize_canonicalize_roundtrip(corpus):
    rng = random.Random(99)
    bad = []
    for smi in corpus:
        for _ in range(N_FORMS):
            form = randomize_smiles(smi, rng)
            if form is None:
                bad.append((smi, None, "randomize failed"))
                continue
            back = chem.canonicalize(form)
            if back != smi:
                bad.append((smi, form, back))
    assert not bad, bad[:5]


def test_canonical_idempotence(corpus):
    for smi in corpus:
        assert chem.canonicalize(smi) == smi  # corpus already canonical
        # and a second pass through parse/write is stable too
        assert chem.canonicalize(chem.canonicalize(smi)) == smi


def test_parse_write_preserves_invariants(corpus):
    rng = random.Random(7)
    for smi in corpus:
        mol = parse_smiles(smi)
        form = randomize_smiles(smi, rng) or smi
        mol2 = parse_smiles(form)
        assert mol.num_atoms == mol2.num_atoms, smi
        assert len(mol.bonds) == len(mol2.bonds), smi
        assert chem.mol_formula(smi) == chem.mol_formula(form), smi
        w1, w2 = chem.exact_mol_wt(smi), chem.exact_mol_wt(form)
        assert w1 is not None and abs(w1 - w2) < 1e-6, smi
        # total hydrogen count is a valence invariant
        h1 = sum(mol.total_h(i) for i in range(mol.num_atoms))
        h2 = sum(mol2.total_h(i) for i in range(mol2.num_atoms))
        assert h1 == h2, (smi, form)


def test_native_kernel_bit_identical_on_fuzz(corpus):
    if chem._native() is None:
        pytest.skip("native chemkernel not built")
    rng = random.Random(3)
    forms = []
    for smi in corpus:
        forms.append(smi)
        f = randomize_smiles(smi, rng)
        if f:
            forms.append(f)
    # canonicalize: native == python
    native_cans = chem.batch_canonicalize(forms)
    for form, nat in zip(forms, native_cans):
        from multimodalspectraltransformer_tpu.chem.canonical import canonical_smiles

        assert nat == canonical_smiles(form), form
    # fingerprints + exact MW: native == python
    sample = forms[:: max(1, len(forms) // 100)]
    fps_nat, valid = chem.batch_morgan_fp(sample)
    assert valid.all()
    for i, s in enumerate(sample):
        fp_py = chem.morgan_fp(s)
        np.testing.assert_array_equal(fps_nat[i], fp_py, err_msg=s)
    mw_nat = chem.batch_exact_mol_wt(sample)
    for i, s in enumerate(sample):
        assert abs(mw_nat[i] - chem.exact_mol_wt(s)) < 1e-6, s


WEIRD_LEGAL = [
    "[13CH4]",
    "[NH4+]",
    "[O-]C(=O)C",
    "C[N+](C)(C)C",
    "c1cc[nH]c1",
    "[nH]1cccc1",
    "C%10CCCCC%10",
    "C1=CC2=CC=CC=C2C=C1",
    "[2H]C([2H])([2H])O",
    "[Na+].[Cl-]",
    "S(=O)(=O)(O)O",
    "[P](=O)(O)(O)O",
    "N#[N+][O-]",
    "C(/F)=C/F",
    "[C@@H](N)(C)C(=O)O",
    "[Si](C)(C)(C)C",
    "B(O)(O)c1ccccc1",
    "[Se]1C=CC=C1",
]


def test_weird_but_legal_bracket_atoms():
    for smi in WEIRD_LEGAL:
        can = chem.canonicalize(smi)
        assert can is not None, smi
        # round trip: canonical form re-canonicalizes to itself
        assert chem.canonicalize(can) == can, (smi, can)
        # and randomized forms come back to the same canonical string
        rng = random.Random(5)
        for _ in range(4):
            form = randomize_smiles(can, rng)
            if form is not None:
                assert chem.canonicalize(form) == can, (smi, form)


def test_fuzz_never_crashes_on_garbage():
    rng = random.Random(42)
    alphabet = "CNOcn()[]=#123@+-%FClBr/\\"
    for _ in range(2000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 30)))
        chem.canonicalize(s)  # must return None or str, never raise
        chem.is_valid(s)
        chem.mol_wt(s)
