"""Q-Former (BLIP-2 style) spectrum<->SMILES alignment.

Reference: `models_BLIP_v15_4.py` + the vendored LAVIS BERT in
`Qformer_v15_4.py` — 32 learned query tokens run through a BERT encoder
whose layers cross-attend to the (projected) MMT memory every
``cross_attention_frequency`` layers (`Qformer_v15_4.py:111-277`, BLIP
wiring `models_BLIP_v15_4.py:239-351`): MMT memory upscaled by
``Linear(128 -> 768)`` (`:257,326-327`), contrastive loss over the
projection of query token 0 against the text CLS projection (`:342-351`).
Note the reference's BLIP forward contains a live ``IPython.embed()``
(`:350`) — its training path was never finished; this implementation is the
completed functional equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import MultiheadAttention
from .clip import CLIPConfig, ProjectionHead, RobertaStyleEncoder, clip_loss

Array = jax.Array


@dataclass(frozen=True)
class QFormerConfig:
    hidden: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    num_layers: int = 4
    num_queries: int = 32
    cross_attention_frequency: int = 2
    dropout: float = 0.1
    encoder_width: int = 768  # projected MMT memory dim
    projection_dim: int = 512
    temperature: float = 1.0


class QFormerLayer(nn.Module):
    """BERT-style post-LN layer over the query tokens with optional
    cross-attention to the encoder memory."""

    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(
        self,
        queries: Array,  # [B, Q, D]
        memory: Optional[Array],  # [B, S, D_enc]
        memory_kpm: Optional[Array],  # [B, S] bool True=masked
        deterministic: bool = True,
    ) -> Array:
        c = self.cfg
        x = queries
        sa = MultiheadAttention(c.hidden, c.num_heads, dropout=c.dropout, name="self_attn")(
            x, x, x, deterministic=deterministic
        )
        sa = nn.Dropout(rate=c.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12, name="norm1")(x + sa)

        if self.has_cross:
            assert memory is not None
            # LAVIS cross-attn projects K/V from encoder_width
            # (`Qformer_v15_4.py:128-130`); widths match after mmt_proj here,
            # so a standard cross-MHA is exact.
            ca = MultiheadAttention(c.hidden, c.num_heads, dropout=c.dropout, name="cross_attn")(
                x, memory, memory, key_padding_mask=memory_kpm, deterministic=deterministic
            )
            ca = nn.Dropout(rate=c.dropout)(ca, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-12, name="norm_cross")(x + ca)

        y = nn.Dense(c.ffn_dim, name="linear1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden, name="linear2")(y)
        y = nn.Dropout(rate=c.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12, name="norm2")(x + y)
        return x


class QFormer(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(
        self,
        memory: Array,  # [B, S, D_enc] projected encoder memory
        memory_kpm: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        c = self.cfg
        B = memory.shape[0]
        query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02), (c.num_queries, c.hidden), jnp.float32
        )
        x = jnp.tile(query_tokens[None], (B, 1, 1))
        for i in range(c.num_layers):
            has_cross = i % c.cross_attention_frequency == 0
            x = QFormerLayer(c, has_cross, name=f"layers_{i}")(
                x, memory, memory_kpm, deterministic
            )
        return x  # [B, Q, D]


class BLIPRanker(nn.Module):
    """Both towers feeding the shared Q-Former-style alignment:
    spectrum side = MMT memory -> Linear -> Q-Former -> query-0 projection;
    text side = Roberta-style tower -> CLS projection."""

    qcfg: QFormerConfig
    tcfg: CLIPConfig

    def setup(self):
        self.mmt_proj = nn.Dense(self.qcfg.encoder_width, name="mmt_proj")
        self.qformer = QFormer(self.qcfg, name="qformer")
        self.text_encoder = RobertaStyleEncoder(self.tcfg, name="text_encoder")
        self.spec_projection = ProjectionHead(self.qcfg.projection_dim, self.qcfg.dropout, name="spec_projection")
        self.text_projection = ProjectionHead(self.qcfg.projection_dim, self.qcfg.dropout, name="text_projection")

    def embed_spectrum(self, memory: Array, memory_kpm: Optional[Array], deterministic: bool = True) -> Array:
        mem = self.mmt_proj(memory)
        q = self.qformer(mem, memory_kpm, deterministic)
        return self.spec_projection(q[:, 0, :], deterministic)  # query token 0

    def embed_text(self, tokens: Array, attention_mask: Array, deterministic: bool = True) -> Array:
        pooled = self.text_encoder(tokens, attention_mask, deterministic)
        return self.text_projection(pooled, deterministic)

    def __call__(self, tokens, attention_mask, memory, memory_kpm, deterministic: bool = True):
        text = self.embed_text(tokens, attention_mask, deterministic)
        spec = self.embed_spectrum(memory, memory_kpm, deterministic)
        return text, spec


def blip_loss(text_emb: Array, spec_emb: Array, temperature: float = 1.0):
    """Same soft-target symmetric contrastive objective as CLIP
    (`models_BLIP_v15_4.py:342-351`)."""
    return clip_loss(text_emb, spec_emb, temperature)


def attention_maps(variables: Any, qcfg: QFormerConfig, memory: Array,
                   memory_kpm: Optional[Array] = None) -> dict[str, Any]:
    """Capture the Q-Former's attention maps for explainability (reference
    vendored-LAVIS ``save_attention``, `Qformer_v15_4.py:147-159`). Returns
    {layer_name: {"self": [B,H,Q,Q], "cross": [B,H,Q,S] or None}}."""
    model = QFormer(qcfg)
    _, state = model.apply(variables, memory, memory_kpm, True, mutable=["intermediates"])
    inter = state["intermediates"]
    out: dict[str, Any] = {}
    for i in range(qcfg.num_layers):
        layer = inter.get(f"layers_{i}", {})
        self_w = layer.get("self_attn", {}).get("attn_weights")
        cross_w = layer.get("cross_attn", {}).get("attn_weights")
        out[f"layers_{i}"] = {
            "self": self_w[0] if self_w else None,
            "cross": cross_w[0] if cross_w else None,
        }
    return out


def from_hf_bert(qcfg: QFormerConfig, hf_state: dict) -> dict:
    """Map a transformers BertModel state_dict onto QFormer layer params
    (the reference seeds its Q-Former from bert-base-uncased,
    `models_BLIP_v15_4.py:526-540`). Self-attention + FFN + norms are
    converted; cross-attention blocks have no BERT counterpart and keep
    their fresh initialization — merge the returned subtree over
    ``variables["params"]``."""
    import numpy as np

    def t(key):
        v = hf_state[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    layers: dict = {}
    for i in range(qcfg.num_layers):
        pre = f"encoder.layer.{i}"
        qw, kw, vw = (t(f"{pre}.attention.self.{x}.weight") for x in ("query", "key", "value"))
        qb, kb, vb = (t(f"{pre}.attention.self.{x}.bias") for x in ("query", "key", "value"))
        layers[f"layers_{i}"] = {
            "self_attn": {
                "in_proj_weight": np.concatenate([qw, kw, vw], axis=0),
                "in_proj_bias": np.concatenate([qb, kb, vb], axis=0),
                "out_proj_weight": t(f"{pre}.attention.output.dense.weight"),
                "out_proj_bias": t(f"{pre}.attention.output.dense.bias"),
            },
            "norm1": {
                "scale": t(f"{pre}.attention.output.LayerNorm.weight"),
                "bias": t(f"{pre}.attention.output.LayerNorm.bias"),
            },
            "linear1": {
                "kernel": t(f"{pre}.intermediate.dense.weight").T,
                "bias": t(f"{pre}.intermediate.dense.bias"),
            },
            "linear2": {
                "kernel": t(f"{pre}.output.dense.weight").T,
                "bias": t(f"{pre}.output.dense.bias"),
            },
            "norm2": {
                "scale": t(f"{pre}.output.LayerNorm.weight"),
                "bias": t(f"{pre}.output.LayerNorm.bias"),
            },
        }
    return layers


def merge_params(base: dict, overlay: dict) -> dict:
    """Recursively overlay converted params onto an initialized tree."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
