"""Pallas TPU kernel: fused single-query decode self-attention.

One KV-cached decode step (decode/functional.decoder_step) computes, per
layer, ``scores = q . K + causal bias, softmax, . V`` with a single query
position per lane. XLA lowers this to two separate multiply-reduce passes
over the merged ``[B, H, 2*Dh, T]`` cache buffer (decode/functional.
DecodeState) — and because K and V live in the same (16, 128) tiles, each
pass DMAs the WHOLE buffer, so the cache is read twice per layer per step
(plus intermediate score tensors round-tripping HBM).

This kernel reads the cache once per layer: each grid cell streams a
``[bm, H, 2*Dh, T]`` block into VMEM and runs the full
mask -> softmax -> weighted-sum chain there, vectorized over the whole
block (no per-head unrolling — the lesson from ops/beam_attention.py,
whose per-sample grid cells with H-unrolled skinny matmuls under-fill the
machine). The cache column update stays OUTSIDE the kernel as XLA's
in-place dynamic_update_slice, so the kernel is read-only and writes only
the tiny [B, H, Dh] context output.

The decode position ``pos`` arrives via scalar prefetch and masks columns
``> pos`` with -inf before the softmax.

Replaces (for the reference workload): the torch scaled-dot-product
attention inside `nn.TransformerDecoder` single-token decoding
(`validate_generate_MMT_v15_4.py:723-775` re-runs full attention per
token; this framework's XLA fallback path is decode/functional.py:156-159).

STATUS: **experiment, off by default — XLA wins.** Gated behind
``fused_self_attention`` (decode/samplers.py) and measured slower than
XLA's fused batched attention in the production MNS/beam paths at
d_model=128 / head_dim=8: the cache-read-once saving is smaller than the
fusion XLA already performs, and the kernel's VMEM block residency limits
the lane batching that actually fills the chip. Kept (with correctness
tests) as the documented negative result; see ops/beam_attention.py for
the same conclusion on the beam variant and ops/auction.py for the Pallas
kernel that IS the production default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, kv_ref, out_ref):
    pos = pos_ref[0]
    kv = kv_ref[...]  # [bm, H, 2*Dh, T]
    Dh = q_ref.shape[-1]
    # f32 throughout: Mosaic only supports minor-dim insertion (the
    # broadcasts below) on 32-bit vectors, and the VPU math is f32 anyway
    k = kv[:, :, :Dh, :].astype(jnp.float32)
    v = kv[:, :, Dh:, :].astype(jnp.float32)
    q = q_ref[...].astype(jnp.float32)  # [bm, H, Dh] (pre-scaled)
    # scores: contract Dh (sublane reduction), keep T in lanes
    s = jnp.sum(q[..., None] * k, axis=2)  # [bm, H, T]
    live = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) <= pos
    s = jnp.where(live, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    # context: contract T (lane reduction)
    out_ref[...] = jnp.sum(p[:, :, None, :] * v, axis=3).astype(out_ref.dtype)


def _block_batch(B: int) -> int:
    for bm in (64, 32, 16, 8, 4, 2, 1):
        if B % bm == 0:
            return bm
    return 1


@partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jax.Array,  # [B, H, Dh] current-step queries, PRE-SCALED
    kv: jax.Array,  # [B, H, 2*Dh, T] merged cache, column `pos` already written
    pos: jax.Array,  # scalar int32 decode position (valid keys: 0..pos)
    interpret: bool | None = None,
) -> jax.Array:  # [B, H, Dh]
    B, H, Dh = q.shape
    T = kv.shape[-1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bm = _block_batch(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bm,),
        in_specs=[
            pl.BlockSpec((bm, H, Dh), lambda b, pos: (b, 0, 0)),
            pl.BlockSpec((bm, H, 2 * Dh, T), lambda b, pos: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, H, Dh), lambda b, pos: (b, 0, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, kv)
