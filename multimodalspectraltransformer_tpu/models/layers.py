"""Transformer building blocks with exact PyTorch (v1.9-2.x) semantics.

The reference model is built from ``nn.TransformerEncoder`` /
``nn.TransformerDecoder`` with default arguments
(`models_MMT_v15_4.py:510-541`): post-LayerNorm ordering, ReLU feed-forward
of width 2048, dropout 0.1 (also on attention weights), LayerNorm eps 1e-5,
additive float attention masks and boolean key-padding masks (True = masked).
These modules reproduce that math exactly at fp32 so converted checkpoints
are drop-in, while using TPU-friendly layouts:

- batch-first ``[batch, seq, d_model]`` everywhere,
- fused single-matmul QKV projection,
- masks folded into one additive bias before a single softmax,
- no data-dependent control flow (jit-safe static shapes).

Parameter naming mirrors the torch state_dict structure one-to-one (e.g.
``layers_0.self_attn.in_proj_weight``) to make checkpoint conversion a
mechanical transpose.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

NEG_INF = float("-inf")


def causal_mask(sz: int, dtype=jnp.float32) -> Array:
    """Additive causal mask: 0 on/below diagonal, -inf above
    (reference: `models_MMT_v15_4.py:794-800`)."""
    return jnp.where(
        jnp.tril(jnp.ones((sz, sz), dtype=bool)),
        jnp.zeros((sz, sz), dtype=dtype),
        jnp.full((sz, sz), NEG_INF, dtype=dtype),
    )


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention (batch_first layout, self- or cross-).

    Parameters are stored exactly like torch: ``in_proj_weight`` [3D, D],
    ``in_proj_bias`` [3D], ``out_proj`` Linear. Query scaling happens before
    the QK^T matmul (torch order), attention dropout is applied to the
    softmax weights.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,  # [B, Sq, D]
        key: Array,  # [B, Sk, D]
        value: Array,  # [B, Sk, D]
        attn_mask: Optional[Array] = None,  # [Sq, Sk] additive float
        key_padding_mask: Optional[Array] = None,  # [B, Sk] bool, True=masked
        deterministic: bool = True,
    ) -> Array:
        d = self.embed_dim
        h = self.num_heads
        dh = d // h
        assert dh * h == d, "embed_dim must be divisible by num_heads"

        in_proj_weight = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d), jnp.float32
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)

        w = in_proj_weight.astype(self.dtype)
        b = in_proj_bias.astype(self.dtype)
        q_w, k_w, v_w = w[:d], w[d : 2 * d], w[2 * d :]
        q_b, k_b, v_b = b[:d], b[d : 2 * d], b[2 * d :]

        qx = query.astype(self.dtype)
        kx = key.astype(self.dtype)
        vx = value.astype(self.dtype)
        if query is key and key is value:
            # Fused QKV for self-attention: one [B,S,D]x[D,3D] matmul.
            qkv = qx @ w.T + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = qx @ q_w.T + q_b
            k = kx @ k_w.T + k_b
            v = vx @ v_w.T + v_b

        B, Sq, _ = q.shape
        Sk = k.shape[1]
        # [B, H, S, dh]
        q = q.reshape(B, Sq, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Sk, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Sk, h, dh).transpose(0, 2, 1, 3)

        # torch scales q before the matmul
        q = q / jnp.asarray(jnp.sqrt(dh), dtype=q.dtype)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)  # [B,H,Sq,Sk]

        if attn_mask is not None:
            scores = scores + attn_mask.astype(scores.dtype)[None, None, :, :]
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0).astype(scores.dtype)
            scores = scores + bias

        attn = jax.nn.softmax(scores, axis=-1)
        # Fully-masked rows produce NaN in torch too; we keep that behavior
        # (the model never feeds fully-masked rows for valid queries).
        # Explainability capture (reference Q-Former save_attention,
        # `Qformer_v15_4.py:147-159`): apply with mutable=["intermediates"]
        # to collect [B, H, Sq, Sk] maps; dead code otherwise.
        self.sow("intermediates", "attn_weights", attn)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout)(attn, deterministic=False)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, d)

        out_w = self.param("out_proj_weight", nn.initializers.xavier_uniform(), (d, d), jnp.float32)
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,), jnp.float32)
        return out @ out_w.astype(self.dtype).T + out_b.astype(self.dtype)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer, post-LN (the defaults the
    reference relies on). ``activation``: "relu" (torch default) or "gelu"
    (Roberta/BERT towers)."""

    d_model: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    activation: str = "relu"

    @nn.compact
    def __call__(
        self,
        src: Array,  # [B, S, D]
        src_key_padding_mask: Optional[Array] = None,  # [B, S] bool
        src_mask: Optional[Array] = None,  # [S, S] additive
        deterministic: bool = True,
    ) -> Array:
        x = src.astype(self.dtype)
        attn_out = MultiheadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, dtype=self.dtype, name="self_attn"
        )(x, x, x, attn_mask=src_mask, key_padding_mask=src_key_padding_mask, deterministic=deterministic)
        attn_out = nn.Dropout(rate=self.dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")(x + attn_out)

        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        y = jax.nn.relu(y) if self.activation == "relu" else jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x + y)
        return x


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers (torch.nn.TransformerEncoder,
    norm=None as in the reference)."""

    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    activation: str = "relu"
    # rematerialize each layer in the backward pass instead of keeping its
    # [B,H,S,S] attention scores + [B,S,ffn] activations alive (jax.checkpoint).
    # Identical params and outputs; trades cheap recompute for the HBM that
    # otherwise caps the trainable batch size.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        src: Array,
        src_key_padding_mask: Optional[Array] = None,
        src_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        layer_cls = (
            nn.remat(TransformerEncoderLayer, static_argnums=(4,))
            if self.remat
            else TransformerEncoderLayer
        )
        x = src
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model,
                self.num_heads,
                self.ffn_dim,
                self.dropout,
                self.layer_norm_eps,
                self.dtype,
                self.activation,
                name=f"layers_{i}",
            )(x, src_key_padding_mask, src_mask, deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """torch.nn.TransformerDecoderLayer, post-LN, ReLU."""

    d_model: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: Array,  # [B, St, D]
        memory: Array,  # [B, Sm, D]
        tgt_mask: Optional[Array] = None,  # [St, St] additive
        memory_key_padding_mask: Optional[Array] = None,  # [B, Sm] bool
        deterministic: bool = True,
    ) -> Array:
        x = tgt.astype(self.dtype)
        sa = MultiheadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, dtype=self.dtype, name="self_attn"
        )(x, x, x, attn_mask=tgt_mask, deterministic=deterministic)
        sa = nn.Dropout(rate=self.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")(x + sa)

        ca = MultiheadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, dtype=self.dtype, name="multihead_attn"
        )(x, memory, memory, key_padding_mask=memory_key_padding_mask, deterministic=deterministic)
        ca = nn.Dropout(rate=self.dropout)(ca, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x + ca)

        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        y = jax.nn.relu(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm3")(x + y)
        return x


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # see TransformerEncoder.remat

    @nn.compact
    def __call__(
        self,
        tgt: Array,
        memory: Array,
        tgt_mask: Optional[Array] = None,
        memory_key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        layer_cls = (
            nn.remat(TransformerDecoderLayer, static_argnums=(5,))
            if self.remat
            else TransformerDecoderLayer
        )
        x = tgt
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model,
                self.num_heads,
                self.ffn_dim,
                self.dropout,
                self.layer_norm_eps,
                self.dtype,
                name=f"layers_{i}",
            )(x, memory, tgt_mask, memory_key_padding_mask, deterministic)
        return x
