"""Native (C++) chemistry runtime parity: the ctypes-bound kernel in
multimodalspectraltransformer_tpu/native must be BIT-IDENTICAL to the pure
Python chemistry package (chem/) — same canonical strings, same fingerprint
bits, same weights/formulas — and its Hungarian solver must match scipy's
linear_sum_assignment optimum (reference use:
`similarity_functions_v15_4.py:735,958`)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from multimodalspectraltransformer_tpu import native
from multimodalspectraltransformer_tpu.chem import api, canonical

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")

CORPUS = [
    "CC(C)Cc1ccc(C(C)C(=O)O)cc1",
    "O=C(O)c1ccccc1OC(C)=O",
    "CC(=O)Nc1ccc(O)cc1",
    "c1ccccc1",
    "C1CC1",
    "[NH4+].[Cl-]",
    "C[N+](C)(C)C",
    "c1ccc2c(c1)cccc2",
    "C%10CCCCC%10",
    "N#Cc1ccccc1",
    "CC(C)(C)OC(=O)N1CCC(CC1)N",
    "[13CH4]",
    "[2H]OC",
    "c1cc[nH]c1",
    "c1ccoc1",
    "c1ccsc1",
    "O=S(=O)(O)O",
    "FC(F)(F)c1ccccc1",
    "C/C=C/C",
    "CC(N)C(=O)O",
    # invalid inputs must agree too
    "invalid((",
    "C1CC",
    "xyz",
    "",
    "[Xx]",
    "C(",
    "C=#C",
]


def test_scalar_parity_validity_canonical_fp_weights():
    for s in CORPUS:
        assert native.is_valid(s) == api.is_valid(s), s
        assert native.canonicalize(s) == api.canonicalize(s), s
        assert native.mol_formula(s) == api.mol_formula(s), s
        pw, nw = api.exact_mol_wt(s), native.exact_mol_wt(s)
        assert (pw is None) == (nw is None), s
        if pw is not None:
            assert abs(pw - nw) < 1e-9, s
        pf, nf = api.morgan_fp(s), native.morgan_fp(s)
        assert (pf is None) == (nf is None), s
        if pf is not None:
            assert (pf == nf).all(), s


def test_randomized_roundtrip_canonical_identity():
    """Any atom ordering of the same molecule canonicalizes to the same
    string in BOTH implementations, and the strings agree."""
    rng = random.Random(0)
    for s in CORPUS:
        c0 = api.canonicalize(s)
        if c0 is None:
            continue
        for _ in range(4):
            r = canonical.randomize_smiles(s, rng)
            assert r is not None
            assert api.canonicalize(r) == c0
            assert native.canonicalize(r) == c0


def test_batch_apis_match_scalar():
    flags = native.batch_validity(CORPUS)
    canons = native.batch_canonicalize(CORPUS)
    fps, valid = native.batch_morgan_fp(CORPUS)
    wts = native.batch_exact_mol_wt(CORPUS)
    for i, s in enumerate(CORPUS):
        assert bool(flags[i]) == api.is_valid(s)
        assert canons[i] == api.canonicalize(s)
        pw = api.exact_mol_wt(s)
        if pw is None:
            assert np.isnan(wts[i])
        else:
            assert abs(wts[i] - pw) < 1e-9
        pf = api.morgan_fp(s)
        assert bool(valid[i]) == (pf is not None)
        if pf is not None:
            assert (fps[i] == pf).all()


def test_batch_formula_matches_scalar():
    forms = native.batch_formula(CORPUS)
    for i, s in enumerate(CORPUS):
        assert forms[i] == api.mol_formula(s)


def test_chem_api_batch_dispatch():
    """chem.api batch entry points produce the same results regardless of
    which backend serves them."""
    assert api.batch_canonicalize(CORPUS) == [api.canonicalize(s) for s in CORPUS]
    assert list(api.batch_is_valid(CORPUS)) == [api.is_valid(s) for s in CORPUS]
    assert api.batch_mol_formula(CORPUS) == [api.mol_formula(s) for s in CORPUS]


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(7)
    for trial in range(30):
        n = rng.randint(1, 14)
        m = rng.randint(n, 18)
        c = rng.rand(n, m)
        assign, total = native.hungarian(c)
        ri, ci = linear_sum_assignment(c)
        assert len(set(assign.tolist())) == n  # distinct columns
        assert abs(total - c[ri, ci].sum()) < 1e-9


def test_batch_hungarian():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(3)
    costs = rng.rand(16, 8, 11)
    assign, totals = native.batch_hungarian(costs)
    for b in range(16):
        ri, ci = linear_sum_assignment(costs[b])
        assert abs(totals[b] - costs[b][ri, ci].sum()) < 1e-9


def test_symmetry_classes_native():
    """Automorphic atoms share a class (benzene: all 6 carbons)."""
    cls = native.symmetry_classes("c1ccccc1")
    assert cls is not None and len(set(cls)) == 1
    cls2 = native.symmetry_classes("Cc1ccccc1")  # toluene: CH3, ipso, 2x ortho, 2x meta, para
    assert cls2 is not None and len(set(cls2)) == 5
