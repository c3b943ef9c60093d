"""First-party chemistry kernel tests: parsing, valence, formula/weights,
canonicalization self-consistency, fingerprints."""

import random

import numpy as np
import pytest

from multimodalspectraltransformer_tpu.chem import api, canonical, fingerprint, properties, smiles

# (smiles, formula, exact_wt, avg_wt) — values computed from standard tables
MOLECULES = [
    ("C", "CH4", 16.0313, 16.043),
    ("CCO", "C2H6O", 46.0419, 46.069),
    ("c1ccccc1", "C6H6", 78.0470, 78.114),
    ("CC(C)Cc1ccc(C(C)C(=O)O)cc1", "C13H18O2", 206.1307, 206.285),  # ibuprofen
    ("CC(=O)Oc1ccccc1C(=O)O", "C9H8O4", 180.0423, 180.159),  # aspirin
    ("CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "C8H10N4O2", 194.0804, 194.194),  # caffeine
    ("C1CCCCC1", "C6H12", 84.0939, 84.162),
    ("N#Cc1ccccc1", "C7H5N", 103.0422, 103.124),
    ("[NH4+]", "H4N+", 18.0344, 18.039),
    ("CC(=O)[O-]", "C2H3O2-", 59.0133, 59.044),
    ("ClCCl", "CH2Cl2", 83.9534, 84.93),
    ("c1ccc2ccccc2c1", "C10H8", 128.0626, 128.174),  # naphthalene
    ("c1cc[nH]c1", "C4H5N", 67.0422, 67.091),  # pyrrole
    ("c1ccncc1", "C5H5N", 79.0422, 79.102),  # pyridine
    ("c1ccoc1", "C4H4O", 68.0262, 68.075),  # furan
    ("c1ccsc1", "C4H4S", 84.0034, 84.14),  # thiophene
    ("O=S(=O)(O)O", "H2O4S", 97.9674, 98.078),  # sulfuric acid
    ("CC(N)C(=O)O", "C3H7NO2", 89.0477, 89.094),  # alanine
]


@pytest.mark.parametrize("smi,formula,exact,avg", MOLECULES)
def test_formula_and_weights(smi, formula, exact, avg):
    assert api.is_valid(smi), smi
    assert api.mol_formula(smi) == formula
    assert api.exact_mol_wt(smi) == pytest.approx(exact, abs=2e-3)
    assert api.mol_wt(smi) == pytest.approx(avg, abs=2e-2)


def test_implicit_hydrogens():
    m = smiles.parse_smiles("CCO")
    assert [m.total_h(i) for i in range(3)] == [3, 2, 1]
    m = smiles.parse_smiles("C=C")
    assert [m.total_h(i) for i in range(2)] == [2, 2]
    m = smiles.parse_smiles("C#N")
    assert [m.total_h(i) for i in range(2)] == [1, 0]
    m = smiles.parse_smiles("c1ccccc1")  # benzene: 1 H each
    assert all(m.total_h(i) == 1 for i in range(6))
    m = smiles.parse_smiles("c1ccncc1")  # pyridine: n has 0 H
    hs = [m.total_h(i) for i in range(6)]
    assert sorted(hs) == [0, 1, 1, 1, 1, 1]


@pytest.mark.parametrize(
    "bad",
    [
        "C(",  # unmatched paren
        "C1CC",  # unclosed ring
        "C(C)(C)(C)(C)C",  # 5-valent carbon
        "C==C",  # double bond symbol
        "[Zz]",  # unknown element
        "",  # empty
        "1CC1",  # ring digit before atom
        "C)C",  # unmatched close
        "O=O=O",  # 4-valent oxygen
    ],
)
def test_invalid_smiles(bad):
    assert not api.is_valid(bad)


def test_valence_charge_adjustments():
    assert api.is_valid("[NH4+]")
    assert api.is_valid("C[N+](C)(C)C")
    assert not api.is_valid("C[N](C)(C)C")  # neutral 4-valent N
    assert api.is_valid("[O-]C")
    assert api.is_valid("O=[S](=O)(O)O")  # S(VI)


def test_canonical_self_consistency():
    """Any atom-order rewriting of the same molecule canonicalizes to the
    same string (the property dedup/exact-match relies on)."""
    rng = random.Random(0)
    for smi, *_ in MOLECULES:
        can = api.canonicalize(smi)
        assert can is not None, smi
        # canonical form must be stable (idempotent)
        assert api.canonicalize(can) == can, (smi, can)
        for k in range(8):
            rnd = api.randomize(smi, rng)
            assert rnd is not None, smi
            assert api.is_valid(rnd), (smi, rnd)
            assert api.canonicalize(rnd) == can, (smi, rnd, api.canonicalize(rnd), can)


def test_canonical_distinguishes_isomers():
    assert api.canonicalize("CCO") != api.canonicalize("COC")
    assert api.canonicalize("c1ccncc1") != api.canonicalize("c1ccccc1")
    assert api.canonicalize("CC(C)C") != api.canonicalize("CCCC")


def test_exact_match():
    assert api.exact_match("OCC", "CCO")
    assert not api.exact_match("OCC", "COC")
    assert not api.exact_match("garbage(((", "CCO")


def test_fingerprint_invariance_and_tanimoto():
    # many randomizations per molecule: duplicate-environment dedup used
    # to be first-seen-wins, which only SOME atom orders expose ('CO' vs
    # 'OC' gave tanimoto 0.5 before the min-id tie-break)
    rng = random.Random(1)
    extra = ["CO", "CCOC", "CC(=O)OC", "OCC(O)CO", "ClCCl"]
    for smi in [m[0] for m in MOLECULES[:8]] + extra:
        fp1 = api.morgan_fp(smi)
        for _ in range(20):
            rnd = api.randomize(smi, rng)
            fp2 = api.morgan_fp(rnd)
            np.testing.assert_array_equal(fp1, fp2, err_msg=f"{smi} vs {rnd}")
    assert api.tanimoto("CO", "OC") == 1.0
    assert api.tanimoto("CCO", "CCO") == 1.0
    t = api.tanimoto("CCO", "CCCCCCO")
    assert 0.0 < t < 1.0
    assert api.tanimoto("c1ccccc1", "C1CCCCC1") < 0.999


def test_batch_tanimoto_matches_scalar():
    smis = [m[0] for m in MOLECULES[:6]]
    fps = np.stack([api.morgan_fp(s) for s in smis])
    mat = fingerprint.batch_tanimoto(fps, fps)
    assert mat.shape == (6, 6)
    np.testing.assert_allclose(np.diag(mat), 1.0)
    for i in range(6):
        for j in range(6):
            assert mat[i, j] == pytest.approx(fingerprint.tanimoto(fps[i], fps[j]))


def test_validity_fraction():
    assert api.validity_fraction(["CCO", "xx(", "c1ccccc1"]) == pytest.approx(2 / 3)
    assert api.validity_fraction([]) == 0.0


def test_ring_closure_percent_and_multi():
    big = "C%10CCCCC%10"
    assert api.is_valid(big)
    assert api.canonicalize(big) == api.canonicalize("C1CCCCC1")
    # spiro
    assert api.is_valid("C1CCC2(CC1)CCCC2")


def test_disconnected_fragments():
    can = api.canonicalize("[Na+].[O-]C(=O)C")
    assert can is not None and "." in can
    assert api.canonicalize("CC(=O)[O-].[Na+]") == can


def test_randomize_produces_variants():
    rng = random.Random(2)
    variants = {api.randomize("CC(C)Cc1ccc(C(C)C(=O)O)cc1", rng) for _ in range(20)}
    assert len(variants) > 3


def test_dataset_cleaning_filters():
    """filter_invalid_criteria / clean_dataset semantics
    (execution_function_v15_4.py:224-310)."""
    from multimodalspectraltransformer_tpu.chem import cleaning

    # phosphorus / silicon / bare boron / charges filtered
    assert cleaning.clean_smiles("CP(C)C") is None
    assert cleaning.clean_smiles("C[Si](C)C") is None
    assert cleaning.clean_smiles("B(O)O") is None
    assert cleaning.clean_smiles("C[N+](C)(C)C") is None
    assert cleaning.clean_smiles("[NH4+]") is None
    # bromine survives the bare-B regex
    assert cleaning.clean_smiles("CBr") is not None
    # stereo stripped
    out = cleaning.clean_smiles("C[C@@H](N)C(=O)O")
    assert out is not None and "@" not in out
    out2 = cleaning.clean_smiles("C/C=C/C")
    assert out2 is not None and "/" not in out2
    # invalid in, None out
    assert cleaning.clean_smiles("xx((") is None
    # batch keeps order, drops failures
    batch = cleaning.clean_smiles_list(["CCO", "CP(C)C", "c1ccccc1"])
    assert batch == [cleaning.clean_smiles("CCO"), cleaning.clean_smiles("c1ccccc1")]


def test_nh_aromatic_roundtrip_preserves_hydrogens():
    """Regression: bare-'n' writing of pyrrole-type [nH] dropped the NH
    hydrogen on re-parse (MF/MW/fingerprint of every NH-aromatic molecule
    off by one H). Canonical forms must round-trip with identical MF."""
    for smi in ["c1cc[nH]c1", "c1ccc2[nH]ccc2c1", "c1cnc[nH]1", "c1cc[nH]c1C"]:
        can = api.canonicalize(smi)
        assert can is not None and "[nH]" in can, (smi, can)
        assert api.canonicalize(can) == can
        assert api.mol_formula(can) == api.mol_formula(smi)
        assert abs(api.exact_mol_wt(can) - api.exact_mol_wt(smi)) < 1e-6


def test_canonical_biaryl_and_explicit_aromatic_bonds():
    """Writer must emit '-' for single bonds between aromatic atoms (an
    in-ring biaryl link like biphenylene reads back as aromatic otherwise)
    and ':' for aromatic bonds with a non-aromatic endpoint; both forms
    must canonicalize idempotently and preserve formula/MW."""
    from multimodalspectraltransformer_tpu.chem import api

    # biphenylene: two aromatic rings fused through a cyclobutane of two
    # single bonds between aromatic carbons (RDKit-canonical style input)
    for smi, formula in [
        ("c1ccc2c(c1)-c1ccccc1-2", "C12H8"),
        ("c1ccccc1c1ccccc1", "C12H10"),  # implicit biaryl link = single
        ("C1:C:C:C:C:C1", "C6H6"),  # explicit ':' bonds, benzene-like valence
    ]:
        can = api.canonicalize(smi)
        assert can is not None, smi
        assert api.canonicalize(can) == can, (smi, can)
        assert api.mol_formula(can) == formula, (smi, can, api.mol_formula(can))
    # biphenylene's two spellings of the same graph converge
    import random

    from multimodalspectraltransformer_tpu.chem.canonical import randomize_smiles

    c = api.canonicalize("c1ccc2c(c1)-c1ccccc1-2")
    for i in range(6):
        r = randomize_smiles(c, random.Random(i))
        assert api.canonicalize(r) == c, (r, api.canonicalize(r))
