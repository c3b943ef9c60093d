"""Pallas TPU kernel: fused ancestry-masked beam self-attention.

One decode step of the ancestry beam (decode/functional.beam_decoder_step)
computes, per layer, scores = q @ K_cache + bias, softmax, @ V_cache. In
XLA the [B, H, K, M] score/probability tensors round-trip HBM (M = T*K =
640 at production shapes, ~26 MB fp32 each, several times per layer). This
kernel runs the whole chain per (batch-element) grid cell in VMEM: the K/V
cache blocks are read once and no intermediate ever leaves the chip.

Shapes (all static): q [B, H, K, Dh], kc/vc [B, H, Dh, M], bias [B, K, M]
-> out [B, H, K, Dh]. Heads are unrolled (H=16, static).

STATUS: **experiment, off by default — XLA wins.** Measured on the v5e
chip at production shapes (B=128, K=5, bf16): 97 mols/s with this kernel
vs 134 mols/s with XLA's batched fusion. The per-sample grid cells run
H-unrolled (16, 8)x(8, 640) matmuls that under-fill the 128x128 MXU; at
d_model=128 / head_dim=8 the whole attention chain fits XLA's own fusion
budget and its batched layout keeps the MXU fed. Kept (with its
correctness tests) as the documented negative result + Pallas reference
pattern; the production Pallas win in this codebase is the auction
assignment solver (ops/auction.py), which IS the default device scorer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    bias = bias_ref[0].astype(jnp.float32)  # [K, M]
    H = q_ref.shape[1]
    for h in range(H):  # static unroll
        q = q_ref[0, h]  # [K, Dh]
        k = k_ref[0, h]  # [Dh, M]
        v = v_ref[0, h]  # [Dh, M]
        s = jnp.dot(q, k, preferred_element_type=jnp.float32) + bias  # [K, M]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [K, Dh]
        out_ref[0, h] = o.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def beam_attention(
    q: jax.Array,  # [B, H, K, Dh] (pre-scaled)
    k_cache: jax.Array,  # [B, H, Dh, M]
    v_cache: jax.Array,  # [B, H, Dh, M]
    bias: jax.Array,  # [B, K, M] additive (0 / -inf)
    interpret: bool | None = None,
) -> jax.Array:
    B, H, K, Dh = q.shape
    M = k_cache.shape[-1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, K, Dh), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, M), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, M), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, M), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, K, Dh), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), q.dtype),
        interpret=interpret,
    )(q, k_cache, v_cache, bias)
