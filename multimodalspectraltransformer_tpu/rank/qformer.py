"""Q-Former (BLIP-2 style) spectrum<->SMILES alignment — full surface.

Reference: `models_BLIP_v15_4.py` + the vendored LAVIS BERT in
`Qformer_v15_4.py`: 32 learned query tokens run through a BERT-base-depth
encoder (12 layers) whose layers cross-attend to the (projected) MMT
memory every ``cross_attention_frequency`` layers (`Qformer_v15_4.py:
111-277`, BLIP wiring `models_BLIP_v15_4.py:239-351`): MMT memory upscaled
by ``Linear(128 -> 768)`` (`:257,326-327`), contrastive loss over the
projection of query token 0 against the text CLS projection (`:342-351`).

Beyond the contrastive tower, this implements the vendored
BertLMHeadModel's remaining surface (`Qformer_v15_4.py:967-1131`):

- TEXT path: word/position embeddings (`:51-109`) so the Q-Former itself
  encodes token sequences,
- MULTIMODAL (ITM-style) path: [queries; text] jointly encoded with
  bidirectional attention, cross-attention on the query rows, and a
  2-way match head averaged over query positions,
- LM path: causal text conditioned on the query prefix (queries blind to
  text — the BLIP-2 two-phase semantics collapsed into one masked pass),
  tied-embedding prediction head (`BertLMPredictionHead`), and
  incremental generation with a PAST-KV cache (`:111-277` past_key_value
  plumbing) via `lm_generate_greedy`,
- separate query-row FFN (LAVIS ``intermediate_query``/``output_query``,
  `Qformer_v15_4.py:406-417`): text rows use their own FFN weights.

Note the reference's BLIP forward contains a live ``IPython.embed()``
(`models_BLIP_v15_4.py:350`) — its training path was never finished; this
implementation is the completed functional equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import MultiheadAttention
from .clip import CLIPConfig, ProjectionHead, RobertaStyleEncoder, clip_loss

Array = jax.Array

NEG_INF = -1e9


@dataclass(frozen=True)
class QFormerConfig:
    hidden: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    num_layers: int = 12  # bert-base depth (`models_BLIP_v15_4.py:526-540`)
    num_queries: int = 32
    cross_attention_frequency: int = 2
    dropout: float = 0.1
    encoder_width: int = 768  # projected MMT memory dim
    projection_dim: int = 512
    temperature: float = 1.0
    # text side (SMILES tokens by default; bert vocab when seeded from HF)
    vocab_size: int = 43
    max_text_len: int = 64


class TextEmbeddings(nn.Module):
    """BERT embeddings: word + learned position, LayerNorm(1e-12), dropout
    (`Qformer_v15_4.py:51-109`)."""

    cfg: QFormerConfig

    @nn.compact
    def __call__(self, tokens: Array, deterministic: bool = True) -> Array:
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden, name="word_embeddings")(tokens)
        pos_table = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (c.max_text_len, c.hidden), jnp.float32,
        )
        x = word + pos_table[None, : tokens.shape[1]]
        x = nn.LayerNorm(epsilon=1e-12, name="norm")(x)
        return nn.Dropout(rate=c.dropout)(x, deterministic=deterministic)


class QFormerLayer(nn.Module):
    """BERT-style post-LN layer over [queries; text] rows with optional
    cross-attention applied to the query rows only and SEPARATE text-row
    FFN weights (LAVIS `feed_forward_chunk` vs `feed_forward_chunk_query`,
    `Qformer_v15_4.py:406-417`)."""

    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(
        self,
        x: Array,  # [B, Q+T, D] (query rows first)
        memory: Optional[Array],  # [B, S, D_enc]
        memory_kpm: Optional[Array],  # [B, S] bool True=masked
        attn_mask: Optional[Array] = None,  # [Q+T, Q+T] additive
        self_kpm: Optional[Array] = None,  # [B, Q+T] bool True=masked
        query_length: Optional[int] = None,  # rows 0..query_length-1 are queries
        deterministic: bool = True,
    ) -> Array:
        c = self.cfg
        ql = x.shape[1] if query_length is None else query_length
        sa = MultiheadAttention(c.hidden, c.num_heads, dropout=c.dropout, name="self_attn")(
            x, x, x, attn_mask, self_kpm, deterministic=deterministic
        )
        sa = nn.Dropout(rate=c.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12, name="norm1")(x + sa)

        if self.has_cross and ql > 0:
            assert memory is not None
            # LAVIS cross-attn projects K/V from encoder_width
            # (`Qformer_v15_4.py:128-130`); widths match after mmt_proj here,
            # so a standard cross-MHA is exact. Applied to query rows only
            # (`Qformer_v15_4.py:423-438`).
            q_rows = x[:, :ql]
            ca = MultiheadAttention(c.hidden, c.num_heads, dropout=c.dropout, name="cross_attn")(
                q_rows, memory, memory, key_padding_mask=memory_kpm, deterministic=deterministic
            )
            ca = nn.Dropout(rate=c.dropout)(ca, deterministic=deterministic)
            q_rows = nn.LayerNorm(epsilon=1e-12, name="norm_cross")(q_rows + ca)
            x = jnp.concatenate([q_rows, x[:, ql:]], axis=1) if ql < x.shape[1] else q_rows

        # query-row FFN (the original names keep round-1 checkpoints loadable)
        def ffn(rows: Array, suffix: str) -> Array:
            y = nn.Dense(c.ffn_dim, name=f"linear1{suffix}")(rows)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dense(c.hidden, name=f"linear2{suffix}")(y)
            y = nn.Dropout(rate=c.dropout)(y, deterministic=deterministic)
            return nn.LayerNorm(epsilon=1e-12, name=f"norm2{suffix}")(rows + y)

        if ql >= x.shape[1]:
            return ffn(x, "")
        if ql == 0:
            return ffn(x, "_text")
        return jnp.concatenate([ffn(x[:, :ql], ""), ffn(x[:, ql:], "_text")], axis=1)


class QFormer(nn.Module):
    """Query tower + text/multimodal/LM surfaces."""

    cfg: QFormerConfig

    @nn.compact
    def __call__(
        self,
        memory: Optional[Array] = None,  # [B, S, D_enc] projected encoder memory
        memory_kpm: Optional[Array] = None,
        text: Optional[Array] = None,  # [B, T] token ids
        text_mask: Optional[Array] = None,  # [B, T] bool True=PADDING
        mode: str = "queries",  # queries | multimodal | lm
        deterministic: bool = True,
    ):
        c = self.cfg
        assert mode in ("queries", "multimodal", "lm"), mode

        parts = []
        ql = 0
        if mode in ("queries", "multimodal", "lm"):
            assert memory is not None
            B = memory.shape[0]
            query_tokens = self.param(
                "query_tokens", nn.initializers.normal(0.02), (c.num_queries, c.hidden), jnp.float32
            )
            parts.append(jnp.tile(query_tokens[None], (B, 1, 1)))
            ql = c.num_queries

        t_len = 0
        if text is not None:
            emb = TextEmbeddings(c, name="text_embeddings")(text, deterministic)
            parts.append(emb)
            t_len = text.shape[1]

        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

        attn_mask = None
        if mode == "lm" and t_len:
            # queries blind to text; text causal over itself, full over queries
            n = ql + t_len
            m = jnp.zeros((n, n))
            m = m.at[:ql, ql:].set(NEG_INF)  # queries cannot see text
            causal = jnp.triu(jnp.full((t_len, t_len), NEG_INF), k=1)
            m = m.at[ql:, ql:].set(causal)
            attn_mask = m

        self_kpm = None
        if t_len:
            pad = text_mask if text_mask is not None else jnp.zeros(text.shape, bool)
            self_kpm = jnp.concatenate(
                [jnp.zeros((x.shape[0], ql), bool), pad.astype(bool)], axis=1
            )

        for i in range(c.num_layers):
            has_cross = i % c.cross_attention_frequency == 0
            x = QFormerLayer(c, has_cross, name=f"layers_{i}")(
                x, memory, memory_kpm, attn_mask, self_kpm, ql, deterministic
            )
        if t_len == 0:
            return x  # [B, Q, D]
        return x[:, :ql], x[:, ql:]  # (query states, text states)


class LMPredictionHead(nn.Module):
    """BertLMPredictionHead with the decoder tied to the word embeddings
    (`Qformer_v15_4.py:967-1015` BertOnlyMLMHead/BertLMPredictionHead)."""

    cfg: QFormerConfig

    @nn.compact
    def __call__(self, hidden: Array, word_embeddings: Array) -> Array:
        c = self.cfg
        x = nn.Dense(c.hidden, name="transform")(hidden)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=1e-12, name="transform_norm")(x)
        bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,), jnp.float32)
        return x @ word_embeddings.T + bias


class BLIPRanker(nn.Module):
    """Both towers feeding the shared Q-Former-style alignment:
    spectrum side = MMT memory -> Linear -> Q-Former -> query-0 projection;
    text side = Roberta-style tower -> CLS projection. Plus the LAVIS
    heads: ITM (2-way match over jointly encoded [queries; text]) and LM
    (causal SMILES generation conditioned on the query prefix)."""

    qcfg: QFormerConfig
    tcfg: CLIPConfig

    def setup(self):
        self.mmt_proj = nn.Dense(self.qcfg.encoder_width, name="mmt_proj")
        self.qformer = QFormer(self.qcfg, name="qformer")
        self.text_encoder = RobertaStyleEncoder(self.tcfg, name="text_encoder")
        self.spec_projection = ProjectionHead(self.qcfg.projection_dim, self.qcfg.dropout, name="spec_projection")
        self.text_projection = ProjectionHead(self.qcfg.projection_dim, self.qcfg.dropout, name="text_projection")
        self.itm_head = nn.Dense(2, name="itm_head")
        self.lm_head = LMPredictionHead(self.qcfg, name="lm_head")

    def embed_spectrum(self, memory: Array, memory_kpm: Optional[Array], deterministic: bool = True) -> Array:
        mem = self.mmt_proj(memory)
        q = self.qformer(mem, memory_kpm, deterministic=deterministic)
        return self.spec_projection(q[:, 0, :], deterministic)  # query token 0

    def embed_text(self, tokens: Array, attention_mask: Array, deterministic: bool = True) -> Array:
        pooled = self.text_encoder(tokens, attention_mask, deterministic)
        return self.text_projection(pooled, deterministic)

    def itm_logits(
        self, tokens: Array, text_pad: Array, memory: Array, memory_kpm: Optional[Array],
        deterministic: bool = True,
    ) -> Array:
        """[B, 2] match logits: queries + text jointly encoded, per-query
        2-way logits averaged (BLIP-2 itm_head semantics)."""
        mem = self.mmt_proj(memory)
        q_states, _ = self.qformer(
            mem, memory_kpm, tokens, text_pad, mode="multimodal", deterministic=deterministic
        )
        return self.itm_head(q_states).mean(axis=1)

    def lm_logits(
        self, tokens: Array, text_pad: Array, memory: Array, memory_kpm: Optional[Array],
        deterministic: bool = True,
    ) -> Array:
        """[B, T, V] next-token logits for causal text conditioned on the
        query prefix."""
        mem = self.mmt_proj(memory)
        _, t_states = self.qformer(
            mem, memory_kpm, tokens, text_pad, mode="lm", deterministic=deterministic
        )
        word = self.qformer.variables["params"]["text_embeddings"]["word_embeddings"]["embedding"]
        return self.lm_head(t_states, word)

    def __call__(self, tokens, attention_mask, memory, memory_kpm, deterministic: bool = True):
        text = self.embed_text(tokens, attention_mask, deterministic)
        spec = self.embed_spectrum(memory, memory_kpm, deterministic)
        return text, spec

    def init_all(self, tokens, attention_mask, memory, memory_kpm):
        """Initialization surface touching every head (contrastive towers +
        ITM + LM) so one `init` creates the full parameter tree."""
        text, spec = self.__call__(tokens, attention_mask, memory, memory_kpm, True)
        pad = 1 - attention_mask.astype(jnp.int32)
        itm = self.itm_logits(tokens, pad, memory, memory_kpm, True)
        lm = self.lm_logits(tokens, pad, memory, memory_kpm, True)
        return text, spec, itm, lm


def blip_loss(text_emb: Array, spec_emb: Array, temperature: float = 1.0):
    """Same soft-target symmetric contrastive objective as CLIP
    (`models_BLIP_v15_4.py:342-351`)."""
    return clip_loss(text_emb, spec_emb, temperature)


def itm_loss(logits: Array, labels: Array) -> Array:
    """2-way CE for image-text matching."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def lm_loss(logits: Array, tokens: Array, text_pad: Array) -> Array:
    """Shifted CE: position t predicts token t+1; padding excluded."""
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    keep = 1.0 - text_pad[:, 1:].astype(jnp.float32)
    return (nll * keep).sum() / jnp.maximum(keep.sum(), 1.0)


# ---------------------------------------------------------------------------
# incremental LM generation with a past-KV cache
# ---------------------------------------------------------------------------

def _attend(q: Array, k: Array, v: Array, num_heads: int, kpm: Optional[Array]) -> Array:
    """q [B, 1, D], k/v [B, S, D] -> [B, 1, D]. Past-KV layout is
    sequence-major [B, S, D]: head_dim here is 64, which already fills TPU
    lanes — the MMT decoder's merged sequence-minor layout (head_dim 8) is
    not needed for this cold path."""
    b, _, d = q.shape
    h = num_heads
    dh = d // h
    qh = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3) / jnp.sqrt(dh).astype(q.dtype)
    kh = k.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    if kpm is not None:
        scores = scores + jnp.where(kpm[:, None, None, :], NEG_INF, 0.0)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, 1, d)


def _mha_out(p: dict, x: Array) -> Array:
    return x @ p["out_proj_weight"].T + p["out_proj_bias"]


def _norm(p: dict, x: Array) -> Array:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-12) * p["scale"] + p["bias"]


def _ffn(lp: dict, x: Array, suffix: str) -> Array:
    y = x @ lp[f"linear1{suffix}"]["kernel"] + lp[f"linear1{suffix}"]["bias"]
    y = jax.nn.gelu(y, approximate=False)
    y = y @ lp[f"linear2{suffix}"]["kernel"] + lp[f"linear2{suffix}"]["bias"]
    return _norm(lp[f"norm2{suffix}"], x + y)


@partial(jax.jit, static_argnames=("qcfg", "max_len", "sos", "eos"))
def lm_generate_greedy(
    variables: Any,
    qcfg: QFormerConfig,
    memory: Array,  # [B, S, 128] raw MMT memory
    memory_kpm: Optional[Array],
    max_len: int,
    sos: int = 3,
    eos: int = 2,
) -> Array:
    """Greedy SMILES generation from the Q-Former LM head with a past-KV
    cache (the vendored BertLMHeadModel's ``past_key_values`` surface,
    `Qformer_v15_4.py:111-277,1017-1131`): the query prefix is encoded
    once, its per-layer K/V cached, then each text step appends one K/V
    column instead of re-running the prefix. Lanes that emit ``eos`` are
    frozen: every later position repeats ``eos``. Returns [B, max_len] ids.

    Jitted with the token loop as ONE ``lax.scan``: an eager Python loop
    would issue ~max_len x num_layers x ~15 per-op dispatches through the
    TPU tunnel (~32 ms each — minutes per batch), and a jit over an
    unrolled loop would compile a max_len-times-bigger graph."""
    params = variables["params"]
    qp = params["qformer"]
    c = qcfg
    B = memory.shape[0]
    d = c.hidden

    mem = memory @ params["mmt_proj"]["kernel"] + params["mmt_proj"]["bias"]

    # ---- phase 1: query prefix through the stack, caching self K/V ------
    x = jnp.tile(qp["query_tokens"][None], (B, 1, 1))
    caches_k, caches_v = [], []
    for i in range(c.num_layers):
        lp = qp[f"layers_{i}"]
        sa = lp["self_attn"]
        q = x @ sa["in_proj_weight"][:d].T + sa["in_proj_bias"][:d]
        k = x @ sa["in_proj_weight"][d : 2 * d].T + sa["in_proj_bias"][d : 2 * d]
        v = x @ sa["in_proj_weight"][2 * d :].T + sa["in_proj_bias"][2 * d :]
        # full self-attention among queries
        h, dh = c.num_heads, d // c.num_heads
        qh = q.reshape(B, -1, h, dh).transpose(0, 2, 1, 3) / jnp.sqrt(dh)
        kh = k.reshape(B, -1, h, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, -1, h, dh).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh), axis=-1)
        att = jnp.einsum("bhqk,bhkd->bhqd", w, vh).transpose(0, 2, 1, 3).reshape(B, -1, d)
        x2 = _norm(lp["norm1"], x + _mha_out(sa, att))
        if i % c.cross_attention_frequency == 0:
            ca = lp["cross_attn"]
            qc = x2 @ ca["in_proj_weight"][:d].T + ca["in_proj_bias"][:d]
            kc = mem @ ca["in_proj_weight"][d : 2 * d].T + ca["in_proj_bias"][d : 2 * d]
            vc = mem @ ca["in_proj_weight"][2 * d :].T + ca["in_proj_bias"][2 * d :]
            qch = qc.reshape(B, -1, h, dh).transpose(0, 2, 1, 3) / jnp.sqrt(dh)
            kch = kc.reshape(B, -1, h, dh).transpose(0, 2, 1, 3)
            vch = vc.reshape(B, -1, h, dh).transpose(0, 2, 1, 3)
            sc = jnp.einsum("bhqd,bhkd->bhqk", qch, kch)
            if memory_kpm is not None:
                sc = sc + jnp.where(memory_kpm[:, None, None, :], NEG_INF, 0.0)
            wc = jax.nn.softmax(sc, axis=-1)
            attc = jnp.einsum("bhqk,bhkd->bhqd", wc, vch).transpose(0, 2, 1, 3).reshape(B, -1, d)
            x2 = _norm(lp["norm_cross"], x2 + _mha_out(ca, attc))
        x = _ffn(lp, x2, "")
        # cache: K/V of the *input* row states are what text steps attend to —
        # recompute from the layer input next phase; store projected k, v
        caches_k.append(jnp.concatenate([k, jnp.zeros((B, max_len, d), k.dtype)], axis=1))
        caches_v.append(jnp.concatenate([v, jnp.zeros((B, max_len, d), v.dtype)], axis=1))

    # cross K/V per cross layer for text... text rows have no cross-attn.
    word = qp["text_embeddings"]["word_embeddings"]["embedding"]
    pos = qp["text_embeddings"]["position_embeddings"]
    emb_norm = qp["text_embeddings"]["norm"]
    lm = params["lm_head"]

    def step(carry, t):
        tokens, done, ks, vs = carry
        tok = tokens[:, t]
        xt = word[tok][:, None, :] + pos[t][None, None, :]
        xt = _norm(emb_norm, xt)
        new_ks, new_vs = [], []
        total = c.num_queries + max_len
        col = c.num_queries + t
        kpm = (jnp.arange(total)[None, :] > col).repeat(B, axis=0)
        for i in range(c.num_layers):
            lp = qp[f"layers_{i}"]
            sa = lp["self_attn"]
            qt = xt @ sa["in_proj_weight"][:d].T + sa["in_proj_bias"][:d]
            kt = xt @ sa["in_proj_weight"][d : 2 * d].T + sa["in_proj_bias"][d : 2 * d]
            vt = xt @ sa["in_proj_weight"][2 * d :].T + sa["in_proj_bias"][2 * d :]
            k_cache = jax.lax.dynamic_update_slice(ks[i], kt, (0, col, 0))
            v_cache = jax.lax.dynamic_update_slice(vs[i], vt, (0, col, 0))
            att = _attend(qt, k_cache, v_cache, c.num_heads, kpm)
            x2 = _norm(lp["norm1"], xt + _mha_out(sa, att))
            # text rows: no cross-attention, text FFN
            xt = _ffn(lp, x2, "_text")
            new_ks.append(k_cache)
            new_vs.append(v_cache)
        h_out = xt[:, 0, :] @ lm["transform"]["kernel"] + lm["transform"]["bias"]
        h_out = jax.nn.gelu(h_out, approximate=False)
        h_out = _norm(lm["transform_norm"], h_out)
        logits = h_out @ word.T + lm["bias"]
        nxt = jnp.where(done, eos, jnp.argmax(logits, axis=-1).astype(jnp.int32))
        done = done | (nxt == eos)
        tokens = tokens.at[:, t + 1].set(nxt)
        return (tokens, done, new_ks, new_vs), None

    tokens0 = jnp.full((B, max_len + 1), sos, jnp.int32)
    carry = (tokens0, jnp.zeros((B,), bool), caches_k, caches_v)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(max_len))
    return carry[0][:, 1:]


def attention_maps(variables: Any, qcfg: QFormerConfig, memory: Array,
                   memory_kpm: Optional[Array] = None) -> dict[str, Any]:
    """Capture the Q-Former's attention maps for explainability (reference
    vendored-LAVIS ``save_attention``, `Qformer_v15_4.py:147-159`). Returns
    {layer_name: {"self": [B,H,Q,Q], "cross": [B,H,Q,S] or None}}."""
    model = QFormer(qcfg)
    _, state = model.apply(
        variables, memory, memory_kpm, deterministic=True, mutable=["intermediates"]
    )
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
    """Map a transformers BertModel state_dict onto QFormer params (the
    reference seeds its Q-Former from bert-base-uncased,
    `models_BLIP_v15_4.py:526-540`). Self-attention + FFN + norms of all
    ``qcfg.num_layers`` layers are converted (12 = full bert-base); text
    FFNs reuse the same BERT weights (LAVIS initializes
    intermediate_query/output_query identically); word/position embeddings
    convert when vocab sizes match; cross-attention blocks have no BERT
    counterpart and keep their fresh initialization — merge the returned
    subtree over ``variables["params"]``."""
    import numpy as np

    def t(key):
        v = hf_state[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    out: dict = {}
    for i in range(qcfg.num_layers):
        pre = f"encoder.layer.{i}"
        qw, kw, vw = (t(f"{pre}.attention.self.{x}.weight") for x in ("query", "key", "value"))
        qb, kb, vb = (t(f"{pre}.attention.self.{x}.bias") for x in ("query", "key", "value"))
        ffn = {
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
        layer = {
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
            **ffn,
        }
        # text-row FFN initialized from the same BERT weights
        layer.update(
            {
                "linear1_text": ffn["linear1"],
                "linear2_text": ffn["linear2"],
                "norm2_text": ffn["norm2"],
            }
        )
        out[f"layers_{i}"] = layer

    if "embeddings.word_embeddings.weight" in hf_state:
        we = t("embeddings.word_embeddings.weight")
        pe = t("embeddings.position_embeddings.weight")
        if we.shape[0] == qcfg.vocab_size:
            out["text_embeddings"] = {
                "word_embeddings": {"embedding": we},
                "position_embeddings": pe[: qcfg.max_text_len],
                "norm": {
                    "scale": t("embeddings.LayerNorm.weight"),
                    "bias": t("embeddings.LayerNorm.bias"),
                },
            }
    return out


def merge_params(base: dict, overlay: dict) -> dict:
    """Recursively overlay converted params onto an initialized tree."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
