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


def test_beam_attention_kernel_matches_xla():
    """Fused ancestry-attention kernel == the XLA einsum chain."""
    import jax
    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu.ops.beam_attention import beam_attention

    B, H, K, Dh, M = 3, 4, 5, 8, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32)
    kc = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32)
    vc = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32)
    mask = rng.rand(B, K, M) < 0.3
    mask[:, :, 0] = True  # at least one valid key per row
    bias = jnp.where(jnp.asarray(mask), 0.0, -jnp.inf).astype(jnp.float32)
    ref_s = jnp.einsum("bhkd,bhdm->bhkm", q, kc) + bias[:, None]
    ref = jnp.einsum("bhkm,bhdm->bhkd", jax.nn.softmax(ref_s, -1), vc)
    out = beam_attention(q, kc, vc, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_beam_decoder_step_pallas_flag_matches():
    """beam_decoder_step(use_pallas=True) == default path (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu.decode import functional as F
    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.utils.config import ModelConfig

    cfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    params = mmt.init_params(cfg, jax.random.PRNGKey(0))
    B, K = 2, 3
    batch = mmt.dummy_batch(cfg, B)
    model = mmt.MultimodalTransformer(cfg)
    enc = jax.jit(lambda p, b: model.apply({"params": p}, b, None, True))(params, batch)
    cross = F.precompute_cross_kv(params, cfg, enc.memory, enc.memory_key_padding_mask)
    cache = F.init_beam_cache(cfg, B, K)
    toks = jnp.zeros((B * K,), jnp.int32)
    anc = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, 1, cfg.max_len))
    pos = jnp.asarray(0, jnp.int32)
    l0, c0 = jax.jit(lambda c: F.beam_decoder_step(params, cfg, c, toks, pos, cross, anc, K))(cache)
    l1, c1 = jax.jit(lambda c: F.beam_decoder_step(params, cfg, c, toks, pos, cross, anc, K, use_pallas=True))(cache)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5, atol=1e-5)


def test_fused_decode_attention_matches_xla():
    """ops/decode_attention (interpret mode off-TPU) == the decoder_step
    self-attention math: masked softmax over the merged [B,H,2Dh,T] cache."""
    import jax
    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(3)
    B, H, Dh, T = 8, 4, 8, 128
    q = jnp.asarray(rng.normal(size=(B, H, Dh)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(B, H, 2 * Dh, T)), jnp.float32)
    for pos in (0, 5, T - 1):
        out = decode_attention(q, kv, jnp.asarray(pos, jnp.int32))
        k, v = kv[:, :, :Dh, :], kv[:, :, Dh:, :]
        s = jnp.einsum("bhd,bhdk->bhk", q, k)
        s = jnp.where((jnp.arange(T) <= pos)[None, None, :], s, -jnp.inf)
        ref = jnp.einsum("bhk,bhdk->bhd", jax.nn.softmax(s, axis=-1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_decode_attention_in_sampler():
    """greedy_decode(fused_attention=True) (interpret mode on CPU) produces
    the same tokens as the XLA path."""
    import jax

    from multimodalspectraltransformer_tpu.decode import samplers as S
    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.utils.config import ModelConfig

    cfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    params = mmt.init_params(cfg, jax.random.PRNGKey(0))
    model = mmt.MultimodalTransformer(cfg)
    batch = mmt.dummy_batch(cfg, 2)
    enc = jax.jit(lambda p, b: model.apply({"params": p}, b, None, True))(params, batch)
    g0 = S.greedy_decode(params, cfg, enc.memory, enc.memory_key_padding_mask, 1.0, 12,
                         fused_attention=False)
    g1 = S.greedy_decode(params, cfg, enc.memory, enc.memory_key_padding_mask, 1.0, 12,
                         fused_attention=True)
    np.testing.assert_array_equal(np.asarray(g0.tokens), np.asarray(g1.tokens))


def test_auction_pallas_compiled_on_tpu():
    """Real-chip (non-interpret) run of the production auction kernel —
    exercised only when a TPU is attached (pytest runs on the virtual CPU
    mesh; run manually on the chip or via bench)."""
    import jax
    import jax.numpy as jnp
    import pytest

    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU attached")
    from multimodalspectraltransformer_tpu.ops.auction import auction_assignment_cost_pallas

    rng = np.random.default_rng(0)
    cost = rng.uniform(0, 1, (16, 24, 24)).astype(np.float32)
    out = np.asarray(auction_assignment_cost_pallas(jnp.asarray(cost), interpret=False))
    for b in range(16):
        r, c = linear_sum_assignment(cost[b])
        assert abs(out[b] - cost[b][r, c].sum()) < 24 * 1e-4, b
