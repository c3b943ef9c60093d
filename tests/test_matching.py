"""Spectral matching engine tests: mode semantics, invariants, and the
batched device auction vs scipy's exact Hungarian."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from multimodalspectraltransformer_tpu.rank import matching


def _peaks(n, seed, scale=(10.0, 200.0)):
    rng = np.random.default_rng(seed)
    return np.stack([rng.uniform(0, scale[0], n), rng.uniform(0, scale[1], n)], axis=1)


def test_identical_spectra_zero_error_all_modes():
    p = _peaks(12, 0)
    errs = matching.all_mode_errors(p, p)
    np.testing.assert_allclose(errs, 0.0, atol=1e-9)


def test_permutation_invariance():
    p = _peaks(10, 1)
    q = _peaks(8, 2)
    perm = np.random.default_rng(3).permutation(len(q))
    for mode in ("hung_dist_nn", "hung_dist_zero", "euc_dist_nn", "min_sum_zero"):
        e1 = matching.spectral_error(p, q, mode)
        e2 = matching.spectral_error(p, q[perm], mode)
        assert e1 == pytest.approx(e2, abs=1e-9), mode


def test_hungarian_not_worse_than_greedy():
    for seed in range(5):
        a = _peaks(9, seed * 2)
        b = _peaks(9, seed * 2 + 1)
        hung = matching.spectral_error(a, b, "hung_dist_zero", error="sum")
        greedy = matching.spectral_error(a, b, "euc_dist_zero", error="sum")
        assert hung <= greedy + 1e-9


def test_trunc_vs_zero_lengths():
    a = _peaks(10, 4)
    b = _peaks(6, 5)
    pa, pb = matching.align(matching.normalize_peaks(a), matching.normalize_peaks(b), "min_sum_trunc")
    assert len(pa) == len(pb) == 6
    pa, pb = matching.align(matching.normalize_peaks(a), matching.normalize_peaks(b), "min_sum_zero")
    assert len(pa) == len(pb) == 10
    pa, pb = matching.align(matching.normalize_peaks(a), matching.normalize_peaks(b), "euc_dist_nn")
    assert len(pa) == len(pb) == 10  # every point matched (leftovers re-matched)


def test_avg_divisor_reference_semantics():
    a = _peaks(10, 6)
    b = _peaks(5, 7)
    s = matching.spectral_error(a, b, "hung_dist_nn", error="sum")
    avg = matching.spectral_error(a, b, "hung_dist_nn", error="avg")
    assert avg == pytest.approx(s / 10)  # max(len) for non-trunc
    s_t = matching.spectral_error(a, b, "min_sum_trunc", error="sum")
    avg_t = matching.spectral_error(a, b, "min_sum_trunc", error="avg")
    assert avg_t == pytest.approx(s_t / 5)  # min(len) for trunc


def test_avg_divisor_nn_skewed_sizes():
    """When |N - M| > min(N, M) the NN expansion aligns only
    min + min(min, |N-M|) pairs; the reference divides its avg by that
    post-alignment length, NOT max(N, M)
    (similarity_functions_v15_4.py:572-578)."""
    a = _peaks(10, 2)
    b = _peaks(2, 3)
    na, nb = matching.normalize_peaks(a), matching.normalize_peaks(b)
    pa, pb = matching.align(na, nb, "hung_dist_nn")
    assert len(pa) == 4  # 2 first-round + min(2, 8) leftover pairs
    s = matching.spectral_error(a, b, "hung_dist_nn", error="sum")
    avg = matching.spectral_error(a, b, "hung_dist_nn", error="avg")
    assert avg == pytest.approx(s / 4)


def test_all_mode_errors_shape_and_order():
    errs = matching.all_mode_errors(_peaks(7, 8), _peaks(7, 9))
    assert errs.shape == (9,)
    assert matching.MODE_INDEX["HungDist_NN"] == 8
    assert np.isfinite(errs).all()


def test_close_spectra_rank_better():
    """A slightly-perturbed spectrum must score better than a random one."""
    target = _peaks(12, 10)
    close = target + np.random.default_rng(11).normal(0, 0.05, target.shape)
    far = _peaks(12, 12)
    e_close = matching.spectral_error(target, close, "hung_dist_nn")
    e_far = matching.spectral_error(target, far, "hung_dist_nn")
    assert e_close < e_far


def test_auction_matches_scipy():
    rng = np.random.default_rng(13)
    B, N = 8, 16
    cost = rng.uniform(0, 1, (B, N, N)).astype(np.float32)
    ours = np.asarray(matching.auction_assignment_cost(cost, n_iters=400, eps=1e-4))
    for b in range(B):
        ri, rj = linear_sum_assignment(cost[b])
        exact = cost[b][ri, rj].sum()
        assert ours[b] == pytest.approx(exact, abs=N * 2e-4), b


def test_batched_assignment_error_agrees_with_host():
    q = matching.normalize_peaks(_peaks(10, 14))
    cands_raw = [_peaks(10, s) for s in range(20, 24)]
    cands = np.stack([matching.normalize_peaks(c) for c in cands_raw]).astype(np.float32)
    dev = matching.batched_assignment_error(q.astype(np.float32), cands, 10, np.full(4, 10))
    for i, c in enumerate(cands_raw):
        host = matching.spectral_error(_peaks(10, 14), c, "hung_dist_zero")
        assert dev[i] == pytest.approx(host, abs=5e-3), i


def test_auction_owner_is_permutation_and_matches_scipy():
    """Regression: the owns bitmap must not let unowned objects' -1
    sentinels clobber bidder 0's ownership (a duplicate-index scatter bug
    that produced sub-optimal 'costs' from non-permutation assignments)."""
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from multimodalspectraltransformer_tpu.rank.matching import auction_assignment_cost

    rng = np.random.RandomState(0)
    for trial in range(30):
        cost = rng.rand(4, 10, 10).astype(np.float32)
        total = np.asarray(auction_assignment_cost(jnp.asarray(cost), n_iters=400))
        for b in range(4):
            ref = cost[b][linear_sum_assignment(cost[b])].sum()
            # never below the optimum, and within N*eps above it
            assert total[b] >= ref - 1e-5, (trial, b, total[b], ref)
            assert total[b] <= ref + 10 * 1e-4 + 1e-5, (trial, b, total[b], ref)


def test_batched_pairwise_matches_host_hung_zero():
    """The production device scorer (one auction call over all pairs) must
    agree with the host hung_dist_zero mode pair by pair."""
    rng = np.random.default_rng(4)
    queries, cands = [], []
    for _ in range(17):
        nq, nc = rng.integers(2, 12), rng.integers(2, 12)
        queries.append(np.column_stack([rng.uniform(0, 10, nq), rng.uniform(0, 200, nq)]))
        cands.append(np.column_stack([rng.uniform(0, 10, nc), rng.uniform(0, 200, nc)]))
    dev = matching.batched_pairwise_assignment_error(queries, cands)
    for i, (q, c) in enumerate(zip(queries, cands)):
        host = matching.spectral_error(q, c, "hung_dist_zero")
        np.testing.assert_allclose(dev[i], host, rtol=2e-3, atol=2e-3)


def test_batched_pairwise_empty_and_identity():
    assert matching.batched_pairwise_assignment_error([], []).shape == (0,)
    q = [np.array([[1.0, 50.0], [2.0, 100.0]])]
    out = matching.batched_pairwise_assignment_error(q, q)
    np.testing.assert_allclose(out, [0.0], atol=1e-5)
