"""Pallas kernels (ops/): correctness on the interpret backend against
scipy's Hungarian optimum (the real-TPU path is exercised by bench runs and
rank.matching's device dispatch)."""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

from multimodalspectraltransformer_tpu.ops import auction


def _ref(costs):
    return np.array([c[linear_sum_assignment(c)].sum() for c in costs])


def test_auction_matches_hungarian_small():
    rng = np.random.RandomState(1)
    costs = rng.rand(6, 16, 16).astype(np.float32)
    out = np.asarray(auction.auction_assignment_cost_pallas(costs, interpret=True))
    np.testing.assert_allclose(out, _ref(costs), atol=16 * 1e-4)


def test_auction_matches_hungarian_structured():
    """Degenerate/tied costs: identical rows, zero blocks."""
    rng = np.random.RandomState(2)
    costs = []
    c = rng.rand(8, 8).astype(np.float32)
    c[2] = c[1]  # duplicate rows -> ties
    costs.append(c)
    z = np.zeros((8, 8), np.float32)
    z[:4, :4] = rng.rand(4, 4)
    costs.append(z)
    costs = np.stack(costs)
    out = np.asarray(auction.auction_assignment_cost_pallas(costs, interpret=True))
    np.testing.assert_allclose(out, _ref(costs), atol=8 * 1e-4)


def test_batched_assignment_error_pallas():
    rng = np.random.RandomState(3)
    query = rng.rand(10, 2).astype(np.float32)
    cands = rng.rand(4, 12, 2).astype(np.float32)
    counts = np.array([12, 12, 12, 12])
    err = auction.batched_assignment_error_pallas(query, cands, 10, counts)
    assert err.shape == (4,)
    # hung_dist_zero semantics: matches scipy on the padded square problem
    N = 12
    q = np.zeros((N, 2), np.float32)
    q[:10] = query
    for ci in range(4):
        d = np.linalg.norm(q[:, None, :] - cands[ci][None, :, :], axis=-1)
        expected = d[linear_sum_assignment(d)].sum() / 12
        assert abs(err[ci] - expected) < 1e-3
