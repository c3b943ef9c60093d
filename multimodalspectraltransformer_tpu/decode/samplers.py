"""Compiled samplers: greedy, multinomial fan-out, beam search.

Reference counterparts (all host-side Python token loops that re-run the
whole decoder per token):

- greedy: `validate_generate_MMT_v15_4.py:723-775` (argmax of
  temperature-scaled softmax; early exit when every sequence emits <PAD>)
- multinomial: `mmt_result_test_functions_15_4.py:791-830` batched over a
  128-way duplicated encoder memory (`run_batch_gen_val_MMT_v15_4.py:93-107`)
- beam: `validate_generate_MMT_v15_4.py:995-1094` (per-sample Python beam
  with multiplicative probabilities)

Here each sampler is ONE ``lax.while_loop``/``lax.scan`` over the KV-cached
``decoder_step``; fan-out and beams are just batch dimensions. Sequences
that finish (<EOS> or <PAD>) are frozen to <PAD>, which leaves decoded
strings identical to the reference while allowing whole-batch early exit.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils import vocab
from ..utils.config import ModelConfig
from .functional import (
    CrossKV,
    DecodeState,
    beam_decoder_step,
    decoder_step,
    gather_lanes,
    init_beam_cache,
    init_cache,
    precompute_cross_kv,
    real_data_blend,
)

Array = jax.Array
Params = Any


class DecodeResult(NamedTuple):
    tokens: Array  # [B, T] generated ids (no <SOS>), <PAD>-filled after finish
    token_probs: Array  # [B, T] probability of each emitted token
    lengths: Array  # [B] #tokens before (incl.) the finishing token


def _cast_decode_params(params: Params, dtype) -> Params:
    """Cast the decoder-side parameter subtree for reduced-precision decode
    (bfloat16 halves the dominant HBM streams; selection math stays fp32)."""
    keys = ("decoder", "embed_trg", "pe_trg", "fc_out", "real_data_linear")
    cast = {k: jax.tree.map(lambda x: x.astype(dtype), params[k]) for k in keys if k in params}
    return {**params, **cast}


def _loop_decode(
    params: Params,
    cfg: ModelConfig,
    cross: CrossKV,
    batch: int,
    select_fn,  # (logits [B,V], t) -> (next_token [B], prob [B])
    max_len: int,
    dtype=jnp.float32,
    early_exit: bool = True,
    group_size: int = 1,
    fused_self_attention: bool = False,
    blend: Optional[Array] = None,  # [B*lanes, V] use_real_data logit blend
) -> DecodeResult:
    """Shared while-loop skeleton for greedy/multinomial."""
    # the KV cache and pe_trg are sized cfg.max_len; decoding past that
    # would silently clamp dynamic_update_slice onto the last cache column
    assert max_len <= cfg.max_len, (
        f"decode max_len={max_len} exceeds the model's cache/positional size "
        f"cfg.max_len={cfg.max_len}"
    )

    class S(NamedTuple):
        t: Array
        cache: DecodeState
        last: Array  # [B] tokens fed at step t
        out: Array  # [B, max_len]
        probs: Array  # [B, max_len]
        finished: Array  # [B] bool
        all_done: Array  # scalar bool

    init = S(
        t=jnp.asarray(0, jnp.int32),
        cache=init_cache(cfg, batch, dtype),
        last=jnp.full((batch,), vocab.SOS_ID, jnp.int32),
        out=jnp.zeros((batch, max_len), jnp.int32),
        probs=jnp.zeros((batch, max_len), jnp.float32),
        finished=jnp.zeros((batch,), bool),
        all_done=jnp.asarray(False),
    )

    def cond(s: S):
        return (s.t < max_len) & ~s.all_done

    def body(s: S):
        logits, cache = decoder_step(params, cfg, s.cache, s.last, s.t, cross,
                                     group_size=group_size,
                                     fused_self_attention=fused_self_attention,
                                     blend=blend)
        nxt, prob = select_fn(logits.astype(jnp.float32), s.t)
        nxt = jnp.where(s.finished, vocab.PAD_ID, nxt).astype(jnp.int32)
        prob = jnp.where(s.finished, 0.0, prob)
        out = s.out.at[:, s.t].set(nxt)
        probs = s.probs.at[:, s.t].set(prob.astype(s.probs.dtype))
        finished = s.finished | (nxt == vocab.EOS_ID) | (nxt == vocab.PAD_ID)
        all_done = jnp.all(finished) if early_exit else jnp.asarray(False)
        return S(s.t + 1, cache, nxt, out, probs, finished, all_done)

    final = jax.lax.while_loop(cond, body, init)
    # length = index of EOS + 1, or #non-PAD tokens if never finished
    has_eos = jnp.any(final.out == vocab.EOS_ID, axis=1)
    eos_pos = jnp.argmax(final.out == vocab.EOS_ID, axis=1)
    lengths = jnp.where(has_eos, eos_pos + 1, jnp.sum(final.out != vocab.PAD_ID, axis=1))
    return DecodeResult(final.out, final.probs, lengths)


def _default_fused(flag):
    """None -> False. The fused Pallas decode-attention kernel
    (ops/decode_attention.py) beats XLA standalone (0.47 vs 0.54 ms/call at
    3072 lanes: one merged-cache DMA pass instead of two), but INSIDE the
    decode while_loop it breaks XLA's in-place aliasing of the carried KV
    cache — the pallas_call operand forces a full-cache copy per layer per
    step (measured: 220 -> 2540 ms per fan-out round). Off by default;
    available for non-loop/offline attention studies."""
    if flag is None:
        return False
    return flag


@partial(jax.jit, static_argnames=("cfg", "max_len", "early_exit", "compute_dtype", "fused_attention"))
def greedy_decode(
    params: Params,
    cfg: ModelConfig,
    memory: Array,  # [B, S, D]
    memory_kpm: Array,  # [B, S] bool
    temperature: float = 1.0,
    max_len: int = 128,
    early_exit: bool = True,
    compute_dtype: Optional[str] = None,  # e.g. "bfloat16"; None = memory dtype
    fused_attention: Optional[bool] = None,
) -> DecodeResult:
    if compute_dtype is not None:
        params = _cast_decode_params(params, compute_dtype)
        memory = memory.astype(compute_dtype)
    cross = precompute_cross_kv(params, cfg, memory, memory_kpm)
    blend = real_data_blend(params, memory) if cfg.use_real_data else None

    def select(logits, t):
        probs = jax.nn.softmax(logits / temperature, axis=-1)
        nxt = jnp.argmax(probs, axis=-1)
        return nxt, jnp.take_along_axis(probs, nxt[:, None], axis=-1)[:, 0]

    return _loop_decode(params, cfg, cross, memory.shape[0], select, max_len, memory.dtype,
                        early_exit, fused_self_attention=_default_fused(fused_attention),
                        blend=blend)


@partial(jax.jit, static_argnames=("cfg", "max_len", "fanout", "early_exit", "compute_dtype", "fused_attention"))
def multinomial_decode(
    params: Params,
    cfg: ModelConfig,
    memory: Array,  # [B, S, D]
    memory_kpm: Array,
    rng: jax.Array,
    temperature: float | Array = 1.0,
    max_len: int = 128,
    fanout: int = 1,
    early_exit: bool = True,
    compute_dtype: Optional[str] = None,
    fused_attention: Optional[bool] = None,
) -> DecodeResult:
    """Temperature sampling. With ``fanout=N``, B*N candidate sequences are
    sampled in one compiled loop (the reference's ``duplicate_dict`` 128-way
    fan-out). The fan-out lanes SHARE the per-sample cross-attention K/V —
    memory is never duplicated, so the dominant HBM stream stays O(B), not
    O(B*N)."""
    if compute_dtype is not None:
        params = _cast_decode_params(params, compute_dtype)
        memory = memory.astype(compute_dtype)
    cross = precompute_cross_kv(params, cfg, memory, memory_kpm)
    batch = memory.shape[0] * fanout
    blend = None
    if cfg.use_real_data:
        # lanes are sample-major ([B, fanout] flattened) — repeat per lane
        blend = jnp.repeat(real_data_blend(params, memory), fanout, axis=0)

    def select(logits, t):
        step_rng = jax.random.fold_in(rng, t)
        scaled = logits / temperature
        nxt = jax.random.categorical(step_rng, scaled, axis=-1)
        probs = jax.nn.softmax(scaled, axis=-1)
        return nxt, jnp.take_along_axis(probs, nxt[:, None], axis=-1)[:, 0]

    return _loop_decode(params, cfg, cross, batch, select, max_len, memory.dtype,
                        early_exit, group_size=fanout,
                        fused_self_attention=_default_fused(fused_attention),
                        blend=blend)


class BeamResult(NamedTuple):
    tokens: Array  # [B, K, T] beams sorted best-first
    scores: Array  # [B, K] sum of token log-probs (log of the reference's
    # multiplicative probability score)
    lengths: Array  # [B, K]


@partial(jax.jit, static_argnames=("cfg", "max_len", "beam_size", "early_exit", "compute_dtype"))
def beam_search_materialized(
    params: Params,
    cfg: ModelConfig,
    memory: Array,  # [B, S, D]
    memory_kpm: Array,
    beam_size: int = 5,
    temperature: float = 1.0,
    max_len: int = 128,
    early_exit: bool = True,
    compute_dtype: Optional[str] = None,
) -> BeamResult:
    """Batched beam search in a single compiled loop. Beam lanes share the
    per-sample cross-attention K/V (no K-way memory duplication).

    Differences from the reference's host-side beam
    (`validate_generate_MMT_v15_4.py:995-1094`), by design:
    - scores are summed log-probs (monotonic transform of the reference's
      product of probs — identical ranking),
    - finished beams are frozen with a single <PAD> continuation instead of
      the reference's seen-set dedup (which can return duplicate prefixes).
    """
    if compute_dtype is not None:
        params = _cast_decode_params(params, compute_dtype)
        memory = memory.astype(compute_dtype)
    assert max_len <= cfg.max_len, (max_len, cfg.max_len)
    B, S, D = memory.shape
    K = beam_size
    V = cfg.smiles_vocab_size
    NEG = jnp.asarray(-1e30, jnp.float32)

    cross = precompute_cross_kv(params, cfg, memory, memory_kpm)

    class S(NamedTuple):
        t: Array
        cache: DecodeState
        last: Array  # [B*K]
        out: Array  # [B, K, max_len]
        scores: Array  # [B, K]
        finished: Array  # [B, K]
        all_done: Array

    scores0 = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
    init = S(
        t=jnp.asarray(0, jnp.int32),
        cache=init_cache(cfg, B * K, memory.dtype),
        last=jnp.full((B * K,), vocab.SOS_ID, jnp.int32),
        out=jnp.zeros((B, K, max_len), jnp.int32),
        scores=scores0,
        finished=jnp.zeros((B, K), bool),
        all_done=jnp.asarray(False),
    )

    def cond(s: S):
        return (s.t < max_len) & ~s.all_done

    blend = None
    if cfg.use_real_data:
        blend = jnp.repeat(real_data_blend(params, memory), K, axis=0).astype(jnp.float32)

    def body(s: S):
        logits, cache = decoder_step(params, cfg, s.cache, s.last, s.t, cross,
                                     group_size=K)
        logits = logits.astype(jnp.float32)
        if blend is not None:
            logits = (logits + blend) / 2  # use_real_data (mmt.decode parity)
        logp = jax.nn.log_softmax(logits / temperature, axis=-1).reshape(B, K, V)
        # finished beams: only a <PAD> continuation, at zero cost
        pad_only = jnp.full((V,), NEG, logp.dtype).at[vocab.PAD_ID].set(0.0)
        logp = jnp.where(s.finished[:, :, None], pad_only[None, None, :], logp)
        combined = s.scores[:, :, None] + logp  # [B, K, V]
        flat = combined.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # [B, K]
        parent = top_idx // V  # [B, K] source beam
        token = (top_idx % V).astype(jnp.int32)

        # Reorder per-sample beam state by parent. The gather reads the
        # *post-step* cache so the reordered rows include this step's K/V.
        gather = (jnp.arange(B)[:, None] * K + parent).reshape(-1)  # [B*K]
        out = jnp.take_along_axis(s.out, parent[:, :, None], axis=1)
        out = out.at[:, :, s.t].set(token)
        finished = jnp.take_along_axis(s.finished, parent, axis=1)
        finished = finished | (token == vocab.EOS_ID) | (token == vocab.PAD_ID)
        all_done = jnp.all(finished) if early_exit else jnp.asarray(False)
        return S(
            s.t + 1,
            gather_lanes(cache, gather),
            token.reshape(-1),
            out,
            top_scores,
            finished,
            all_done,
        )

    final = jax.lax.while_loop(cond, body, init)

    order = jnp.argsort(-final.scores, axis=1)
    tokens = jnp.take_along_axis(final.out, order[:, :, None], axis=1)
    scores = jnp.take_along_axis(final.scores, order, axis=1)
    has_eos = jnp.any(tokens == vocab.EOS_ID, axis=2)
    eos_pos = jnp.argmax(tokens == vocab.EOS_ID, axis=2)
    lengths = jnp.where(has_eos, eos_pos + 1, jnp.sum(tokens != vocab.PAD_ID, axis=2))
    return BeamResult(tokens, scores, lengths)


@partial(jax.jit, static_argnames=("cfg", "max_len", "beam_size", "early_exit", "compute_dtype"))
def beam_search(
    params: Params,
    cfg: ModelConfig,
    memory: Array,  # [B, S, D]
    memory_kpm: Array,
    beam_size: int = 5,
    temperature: float = 1.0,
    max_len: int = 128,
    early_exit: bool = True,
    compute_dtype: Optional[str] = None,
) -> BeamResult:
    """Batched beam search with an APPEND-ONLY KV cache.

    Identical results to ``beam_search_materialized`` (tested), but instead
    of reordering the whole cache by parent beam every step (the dominant
    cost: a full-cache rewrite per token), lanes are immutable and
    self-attention runs under an ancestry mask (functional.beam_decoder_step).
    The per-step reorder shrinks to a [B, K, T] int32 matrix.
    """
    if compute_dtype is not None:
        params = _cast_decode_params(params, compute_dtype)
        memory = memory.astype(compute_dtype)
    assert max_len <= cfg.max_len, (max_len, cfg.max_len)
    B, S, D = memory.shape
    K = beam_size
    V = cfg.smiles_vocab_size
    T = cfg.max_len
    NEG = jnp.asarray(-1e30, jnp.float32)

    cross = precompute_cross_kv(params, cfg, memory, memory_kpm)
    lane_default = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, 1, T))

    class S2(NamedTuple):
        t: Array
        cache: DecodeState
        last: Array  # [B*K]
        ancestry: Array  # [B, K, T] int32
        out: Array  # [B, K, max_len]
        scores: Array  # [B, K]
        finished: Array  # [B, K]
        all_done: Array

    scores0 = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
    init = S2(
        t=jnp.asarray(0, jnp.int32),
        cache=init_beam_cache(cfg, B, K, memory.dtype),
        last=jnp.full((B * K,), vocab.SOS_ID, jnp.int32),
        ancestry=lane_default,
        out=jnp.zeros((B, K, max_len), jnp.int32),
        scores=scores0,
        finished=jnp.zeros((B, K), bool),
        all_done=jnp.asarray(False),
    )

    def cond(s: S2):
        return (s.t < max_len) & ~s.all_done

    # measured on v5e: the XLA path wins (134 vs 97 mols/s at B=128, K=5) —
    # per-batch grid cells with H unrolled skinny matmuls under-fill the MXU
    # relative to XLA's batched fusion. The kernel stays available for
    # larger-beam regimes via beam_decoder_step(use_pallas=True).
    use_pallas = False

    blend = None
    if cfg.use_real_data:
        blend = jnp.repeat(real_data_blend(params, memory), K, axis=0).astype(jnp.float32)

    def body(s: S2):
        logits, cache = beam_decoder_step(
            params, cfg, s.cache, s.last, s.t, cross, s.ancestry, K,
            use_pallas=use_pallas,
        )
        logits = logits.astype(jnp.float32)
        if blend is not None:
            logits = (logits + blend) / 2  # use_real_data (mmt.decode parity)
        logp = jax.nn.log_softmax(logits / temperature, axis=-1).reshape(B, K, V)
        pad_only = jnp.full((V,), NEG, logp.dtype).at[vocab.PAD_ID].set(0.0)
        logp = jnp.where(s.finished[:, :, None], pad_only[None, None, :], logp)
        combined = s.scores[:, :, None] + logp  # [B, K, V]
        top_scores, top_idx = jax.lax.top_k(combined.reshape(B, K * V), K)
        parent = top_idx // V
        token = (top_idx % V).astype(jnp.int32)

        # reorder beam-level state by parent (all small tensors)
        out = jnp.take_along_axis(s.out, parent[:, :, None], axis=1)
        out = out.at[:, :, s.t].set(token)
        anc = jnp.take_along_axis(s.ancestry, parent[:, :, None], axis=1)
        # future positions belong to this beam's own lane
        future = jnp.arange(T)[None, None, :] > s.t
        anc = jnp.where(future, lane_default, anc)
        finished = jnp.take_along_axis(s.finished, parent, axis=1)
        finished = finished | (token == vocab.EOS_ID) | (token == vocab.PAD_ID)
        all_done = jnp.all(finished) if early_exit else jnp.asarray(False)
        return S2(s.t + 1, cache, token.reshape(-1), anc, out, top_scores, finished, all_done)

    final = jax.lax.while_loop(cond, body, init)

    order = jnp.argsort(-final.scores, axis=1)
    tokens = jnp.take_along_axis(final.out, order[:, :, None], axis=1)
    scores = jnp.take_along_axis(final.scores, order, axis=1)
    has_eos = jnp.any(tokens == vocab.EOS_ID, axis=2)
    eos_pos = jnp.argmax(tokens == vocab.EOS_ID, axis=2)
    lengths = jnp.where(has_eos, eos_pos + 1, jnp.sum(tokens != vocab.PAD_ID, axis=2))
    return BeamResult(tokens, scores, lengths)
