"""SGNN domain-adaptation machinery (scripts/sgnn_adapt.py + the split
protocol in data.pipeline).

The reference's test spectra come from its SGNN simulator
(`MMT_website/Runfolder/CSV_files/*.csv`); adaptation aligns those
unassigned peak lists to atoms and fine-tunes the distilled shift GNN.
These tests pin the alignment DP, the multiplet clustering, and the
leak-safety of the adapt/eval split."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from multimodalspectraltransformer_tpu.data.pipeline import (  # noqa: E402
    SampleRecord,
    ref_testset_split,
)
from sgnn_adapt import (  # noqa: E402
    build_assignment_dataset,
    cluster_multiplets,
    monotone_align,
)


class TestSplit:
    def test_stable_and_balanced(self):
        ids = [f"ZINC{i:012d}" for i in range(2000)]
        halves = [ref_testset_split(s) for s in ids]
        assert halves == [ref_testset_split(s) for s in ids]  # deterministic
        n_adapt = halves.count("adapt")
        assert 900 < n_adapt < 1100  # hash-balanced
        assert set(halves) == {"adapt", "eval"}

    def test_matches_script_alias(self):
        from sgnn_adapt import split_of

        assert all(split_of(s) == ref_testset_split(s)
                   for s in ("a", "ZINC0001", "x" * 40))


class TestMonotoneAlign:
    def test_consolidation_many_to_one(self):
        # 4 atoms onto 3 peaks: symmetric pair shares the middle peak
        out = monotone_align(np.array([10.0, 11.0, 30.0, 50.0]),
                             np.array([10.5, 29.0, 51.0]))
        assert out == [0, 0, 1, 2]

    def test_equal_counts_identity(self):
        out = monotone_align(np.array([1.0, 2.0, 3.0]), np.array([1.1, 2.1, 3.1]))
        assert out == [0, 1, 2]

    def test_skip_spurious_peak(self):
        # middle peak (an exchangeable-proton multiplet) has no prediction
        out = monotone_align(np.array([10.0, 50.0]),
                             np.array([10.2, 30.0, 50.1]), skip_pen=0.6)
        assert out == [0, 2]

    def test_infeasible_without_skip(self):
        assert monotone_align(np.array([10.0]), np.array([10.0, 20.0])) == [None]

    def test_crossing_resolved_monotonically(self):
        # predictions out of true order still get a monotone (sorted-input)
        # assignment — callers sort both sides first
        out = monotone_align(np.array([5.0, 6.0]), np.array([5.4, 5.6]))
        assert out == [0, 1]


class TestClusterMultiplets:
    def test_triplet_plus_singlet(self):
        peaks = [(1.00, 0.5), (1.0175, 1.0), (1.035, 0.5), (3.5, 2.0)]
        cl = cluster_multiplets(peaks)
        assert len(cl) == 2
        c0, c1 = cl
        assert abs(c0[0] - 1.0175) < 1e-9  # intensity-weighted centroid
        assert abs(c0[1] - 2.0) < 1e-9
        assert c0[2] == 3
        assert c1 == (3.5, 2.0, 1)

    def test_overlapping_multiplets_merge(self):
        # two doublets 0.004 ppm apart -> one cluster (the DP hosts both
        # environments on it)
        peaks = [(1.259, 1.5), (1.263, 1.5), (1.274, 1.5), (1.279, 1.5)]
        assert len(cluster_multiplets(peaks)) == 1


class TestAssignmentDataset:
    def _models(self):
        from multimodalspectraltransformer_tpu.sim.factory import default_shift_model

        d = default_shift_model()
        if d is None:
            import pytest

            pytest.skip("no committed shift weights")
        return d

    def test_end_to_end_labels(self):
        params, model, stats = self._models()
        # a CHC-style record: consolidated 13C list + HSQC pairs
        from multimodalspectraltransformer_tpu.sim.factory import simulate_records

        smi = "CCOC(=O)c1ccccc1"
        sim = simulate_records([smi], sample_ids=["t0"])[0]
        chc = [SampleRecord("t0", smi, c13=sim.c13, hsqc=sim.hsqc)]
        h1 = [SampleRecord("t1", "CCO", h1=[[1.1, 0.5], [1.117, 1.0], [1.135, 0.5],
                                            [3.6, 0.5], [3.617, 1.0], [3.635, 0.5]])]
        data, info = build_assignment_dataset(chc, h1, params, model, stats)
        assert info["mols"] == 2
        assert info["c_labels"] > 0
        assert data["mask_c"].sum() == info["c_labels"]
        assert data["mask_h"].sum() == info["h_hsqc_labels"] + info["h_clust_labels"]
        # assigned targets live in chemically sane ranges
        tc = data["target_c"][data["mask_c"] > 0]
        th = data["target_h"][data["mask_h"] > 0]
        assert (tc > -10).all() and (tc < 230).all()
        assert (th > -2).all() and (th < 13).all()
