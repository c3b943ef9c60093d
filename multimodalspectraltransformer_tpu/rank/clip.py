"""CLIP-style spectrum<->SMILES contrastive ranking.

Reference: `models_CLIP_v15_4.py` — text tower = pretrained ChemBERTa
(RobertaModel) + tanh pooler + ``LL1`` Linear(768 -> CB_embedding=1024)
(`:165-216`); spectrum tower = the MMT's 512-d fingerprint; two residual
ProjectionHeads (Linear -> GELU -> Linear -> Dropout -> +residual ->
LayerNorm, `:403-426`) to projection_dim=512; soft-target symmetric
cross-entropy loss (`:292-302`); ``inference`` scores generated candidates
against the spectrum embedding (`:304-366`).

The text tower here is a first-party Roberta-style encoder (post-LN, GELU,
learned positions with Roberta's +2 padding offset, tanh pooler) that can
either train from scratch on this framework's SMILES vocabulary or load
converted HuggingFace Roberta/ChemBERTa weights (`from_hf_roberta``),
parity-tested against ``transformers.RobertaModel``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.layers import TransformerEncoder

Array = jax.Array


@dataclass(frozen=True)
class CLIPConfig:
    # text tower (ChemBERTa-shape defaults; shrink for from-scratch training)
    text_vocab_size: int = 600
    text_hidden: int = 768
    text_layers: int = 6
    text_heads: int = 12
    text_ffn: int = 3072
    text_max_len: int = 128
    pad_token_id: int = 0
    # feature dims (reference config_V8: CB_embedding=1024, MT_embedding=512;
    # mt_embedding is informational — the MT head's input width comes from
    # the fingerprint array itself)
    cb_embedding: int = 1024
    mt_embedding: int = 512
    projection_dim: int = 512
    dropout: float = 0.1
    temperature: float = 1.0


class RobertaStyleEncoder(nn.Module):
    """Roberta-compatible encoder: word + (offset) position + type
    embeddings -> LayerNorm -> post-LN GELU transformer -> tanh pooler."""

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens: Array, attention_mask: Array, deterministic: bool = True) -> Array:
        c = self.cfg
        # Roberta position ids: cumsum over the mask plus the pad-token
        # offset (HF create_position_ids_from_input_ids)
        positions = jnp.cumsum(attention_mask, axis=1) * attention_mask + c.pad_token_id
        word = nn.Embed(c.text_vocab_size, c.text_hidden, name="word_embeddings")(tokens)
        pos = nn.Embed(c.text_max_len + 2, c.text_hidden, name="position_embeddings")(positions.astype(jnp.int32))
        typ = self.param("token_type_embedding", nn.initializers.zeros, (c.text_hidden,), jnp.float32)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=1e-5, name="emb_norm")(x)
        x = nn.Dropout(rate=c.dropout)(x, deterministic=deterministic)
        kpm = attention_mask == 0  # True = masked
        x = TransformerEncoder(
            num_layers=c.text_layers,
            d_model=c.text_hidden,
            num_heads=c.text_heads,
            ffn_dim=c.text_ffn,
            dropout=c.dropout,
            activation="gelu",
            name="encoder",
        )(x, kpm, None, deterministic)
        # BERT pooler: Linear + tanh over the first token
        cls = x[:, 0, :]
        pooled = jnp.tanh(nn.Dense(c.text_hidden, name="pooler")(cls))
        return pooled


class ProjectionHead(nn.Module):
    """Reference ProjectionHead (`models_CLIP_v15_4.py:403-426`)."""

    projection_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        projected = nn.Dense(self.projection_dim, name="projection")(x)
        y = jax.nn.gelu(projected, approximate=False)
        y = nn.Dense(self.projection_dim, name="fc")(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        y = y + projected
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(y)


class CLIPRanker(nn.Module):
    """Text tower + LL1 + both projection heads. The spectrum side consumes
    the MMT fingerprint (512-d) computed externally, keeping the two models
    independently trainable/checkpointable."""

    cfg: CLIPConfig

    def setup(self):
        c = self.cfg
        self.text_encoder = RobertaStyleEncoder(c, name="text_encoder")
        self.ll1 = nn.Dense(c.cb_embedding, name="LL1")
        self.cb_projection = ProjectionHead(c.projection_dim, c.dropout, name="CB_projection")
        self.mt_projection = ProjectionHead(c.projection_dim, c.dropout, name="MT_projection")

    def embed_text(self, tokens: Array, attention_mask: Array, deterministic: bool = True) -> Array:
        pooled = self.text_encoder(tokens, attention_mask, deterministic)
        features = self.ll1(pooled)
        return self.cb_projection(features, deterministic)

    def embed_spectrum(self, fingerprint: Array, deterministic: bool = True) -> Array:
        return self.mt_projection(fingerprint, deterministic)

    def __call__(self, tokens: Array, attention_mask: Array, fingerprint: Array, deterministic: bool = True):
        cb = self.embed_text(tokens, attention_mask, deterministic)
        mt = self.embed_spectrum(fingerprint, deterministic)
        return cb, mt


class CLIPLossOutput(NamedTuple):
    mean_loss: Array
    per_sample_loss: Array  # [B]
    logits: Array  # [B, B]


def _soft_cross_entropy(preds: Array, targets: Array) -> Array:
    return jnp.sum(-targets * jax.nn.log_softmax(preds, axis=-1), axis=1)


def clip_loss(cb_emb: Array, mt_emb: Array, temperature: float = 1.0) -> CLIPLossOutput:
    """Soft-target symmetric contrastive loss
    (reference `models_CLIP_v15_4.py:292-302`; note the reference both
    divides the logits and multiplies the targets by the temperature)."""
    logits = (cb_emb @ mt_emb.T) / temperature
    mt_sim = mt_emb @ mt_emb.T
    cb_sim = cb_emb @ cb_emb.T
    targets = jax.nn.softmax((mt_sim + cb_sim) / 2 * temperature, axis=-1)
    texts_loss = _soft_cross_entropy(logits, targets)
    images_loss = _soft_cross_entropy(logits.T, targets.T)
    per_sample = (texts_loss + images_loss) / 2.0
    return CLIPLossOutput(per_sample.mean(), per_sample, logits)


class ScoreOutput(NamedTuple):
    losses: Array  # [C] per-candidate CLIP loss (reference inference `losses`)
    dot_similarity: Array  # [C] candidate-text . spectrum-embedding
    logits: Array  # [C, C]


def score_candidates(
    variables: Any,
    cfg: CLIPConfig,
    cand_tokens: Array,  # [C, T]
    cand_mask: Array,  # [C, T]
    fingerprint: Array,  # [F] or [C, F] (duplicated rows, reference style)
) -> ScoreOutput:
    """Reference ``CLIPModel.inference`` (`:304-366`): embed candidates and
    the (duplicated) spectrum, return per-candidate losses and the dot
    similarities against the spectrum embedding."""
    model = CLIPRanker(cfg)
    if fingerprint.ndim == 1:
        fingerprint = jnp.tile(fingerprint[None, :], (cand_tokens.shape[0], 1))
    cb, mt = model.apply(variables, cand_tokens, cand_mask, fingerprint, True)
    out = clip_loss(cb, mt, cfg.temperature)
    # dot_similarity[:, 0] in the reference: all spectrum rows identical
    dot = (cb @ mt.T)[:, 0]
    return ScoreOutput(out.per_sample_loss, dot, out.logits)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def score_candidates_batch(
    variables: Any,
    cfg: CLIPConfig,
    cand_tokens: Array,  # [M, C, T] — M molecules, C candidates each
    cand_mask: Array,  # [M, C, T]
    fingerprints: Array,  # [M, F] one spectrum fingerprint per molecule
    compute_dtype: Optional[str] = None,  # "bfloat16": tower in bf16, loss f32
) -> ScoreOutput:
    """Batched ``score_candidates`` over many molecules in ONE executable.

    The reference scores each molecule's candidate set with a separate
    ``CLIPModel.inference`` call (`models_CLIP_v15_4.py:304-366`, invoked
    per molecule at `mmt_result_test_functions_15_4.py:556`); on TPU a
    per-molecule call costs a host->device dispatch each (~tens of ms over
    a tunnel). Here all M*C candidates run through the text tower as one
    batch (better MXU fill), and the contrastive loss is vmapped per
    molecule so each candidate set keeps its own C x C logit block —
    numerically identical to M separate ``score_candidates`` calls.
    Returns fields shaped [M, C] (and logits [M, C, C]).
    """
    M, C, T = cand_tokens.shape
    model = CLIPRanker(cfg)
    if compute_dtype == "bfloat16":
        # scores are reported per candidate but carry no rank weight by
        # default (ACCURACY_r05clip.md): the tower runs bf16 (MXU-rate
        # matmuls), embeddings are cast back to f32 for the loss block
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            variables,
        )
        fingerprints = fingerprints.astype(jnp.bfloat16)
    cb = model.apply(
        variables, cand_tokens.reshape(M * C, T), cand_mask.reshape(M * C, T),
        True, method="embed_text",
    ).reshape(M, C, -1).astype(jnp.float32)
    # project the M unique fingerprints ONCE and tile the embeddings —
    # numerically identical to the reference's duplicated-row projection
    # (deterministic head on identical inputs) at 1/C the projection work
    mt_unique = model.apply(
        variables, fingerprints, True, method="embed_spectrum"
    ).astype(jnp.float32)  # [M, D]
    mt = jnp.tile(mt_unique[:, None, :], (1, C, 1))

    def one(cb_m, mt_m):
        out = clip_loss(cb_m, mt_m, cfg.temperature)
        dot = (cb_m @ mt_m.T)[:, 0]
        return out.per_sample_loss, dot, out.logits

    losses, dots, logits = jax.vmap(one)(cb, mt)
    return ScoreOutput(losses, dots, logits)


# ---------------------------------------------------------------------------
# HuggingFace Roberta conversion (ChemBERTa checkpoints)
# ---------------------------------------------------------------------------

def from_hf_roberta(cfg: CLIPConfig, hf_state: dict) -> dict:
    """Map a transformers.RobertaModel state_dict onto RobertaStyleEncoder
    params. Separate q/k/v projections concatenate into the fused
    in_proj buffers of our MultiheadAttention."""

    def t(key):
        v = hf_state[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    p: dict = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": t("embeddings.position_embeddings.weight")},
        "token_type_embedding": t("embeddings.token_type_embeddings.weight")[0],
        "emb_norm": {
            "scale": t("embeddings.LayerNorm.weight"),
            "bias": t("embeddings.LayerNorm.bias"),
        },
        "pooler": {"kernel": t("pooler.dense.weight").T, "bias": t("pooler.dense.bias")},
    }
    enc: dict = {}
    for i in range(cfg.text_layers):
        pre = f"encoder.layer.{i}"
        qw, kw, vw = (t(f"{pre}.attention.self.{x}.weight") for x in ("query", "key", "value"))
        qb, kb, vb = (t(f"{pre}.attention.self.{x}.bias") for x in ("query", "key", "value"))
        enc[f"layers_{i}"] = {
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
            "linear1": {"kernel": t(f"{pre}.intermediate.dense.weight").T, "bias": t(f"{pre}.intermediate.dense.bias")},
            "linear2": {"kernel": t(f"{pre}.output.dense.weight").T, "bias": t(f"{pre}.output.dense.bias")},
            "norm2": {
                "scale": t(f"{pre}.output.LayerNorm.weight"),
                "bias": t(f"{pre}.output.LayerNorm.bias"),
            },
        }
    p["encoder"] = enc
    return p


def from_torch_clip(cfg: CLIPConfig, sd: dict) -> dict:
    """Map a saved reference CLIPModel state_dict onto CLIPRanker params.

    Reference structure (`models_CLIP_v15_4.py:165-258`): the text tower is
    ChembertaFingerprint — ``CB_model.chemberta`` (RobertaModel, incl.
    pooler) followed by ``CB_model.LL1`` Linear(768 -> CB_embedding); the
    spectrum tower consumes the MMT fingerprint externally; two
    ProjectionHeads ``CB_projection``/``MT_projection``."""

    def t(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    def head(prefix: str) -> dict:
        return {
            "projection": {"kernel": t(f"{prefix}.projection.weight").T,
                           "bias": t(f"{prefix}.projection.bias")},
            "fc": {"kernel": t(f"{prefix}.fc.weight").T, "bias": t(f"{prefix}.fc.bias")},
            "layer_norm": {"scale": t(f"{prefix}.layer_norm.weight"),
                           "bias": t(f"{prefix}.layer_norm.bias")},
        }

    # strip the CB_model.chemberta. prefix and reuse the HF Roberta mapping
    roberta_sd = {
        k[len("CB_model.chemberta."):]: v
        for k, v in sd.items()
        if k.startswith("CB_model.chemberta.")
    }
    params: dict = {
        "text_encoder": from_hf_roberta(cfg, roberta_sd),
        "LL1": {"kernel": t("CB_model.LL1.weight").T, "bias": t("CB_model.LL1.bias")},
        "CB_projection": head("CB_projection"),
        "MT_projection": head("MT_projection"),
    }
    return params


# --------------------------------------------------------------------------
# Trained-tower bundle: msgpack variables + JSON config sidecar, so the
# harness / bench / CLI can reload a committed checkpoint without knowing
# the training-time configuration (reference: CLIP_model_path checkpoints,
# `clip_functions_v15_4.py:311-329`).
# --------------------------------------------------------------------------


def save_bundle(path: str, variables, cfg: CLIPConfig) -> None:
    """Write ``<path>`` (msgpack of the variables pytree, .gz-aware) plus
    ``<path w/o .gz>.json`` holding the CLIPConfig fields."""
    import dataclasses
    import json as _json

    from ..train.checkpoint import export_params_msgpack

    export_params_msgpack(variables, path)
    base = path[:-3] if path.endswith(".gz") else path
    with open(base + ".json", "w") as f:
        _json.dump(dataclasses.asdict(cfg), f)


def load_bundle(path: str):
    """Load a (variables, CLIPConfig) bundle written by :func:`save_bundle`
    — the ``clip_bundle`` argument of eval.harness.evaluate_molecules."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from ..train.checkpoint import import_params_msgpack

    base = path[:-3] if path.endswith(".gz") else path
    with open(base + ".json") as f:
        cfg = CLIPConfig(**_json.load(f))
    model = CLIPRanker(cfg)
    toks = jnp.zeros((1, cfg.text_max_len), jnp.int32)
    template = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        toks, toks, jnp.zeros((1, 512)), True,
    )
    variables = import_params_msgpack(template, path)
    # park the tower in HBM ONCE: import returns host arrays, and a traced
    # jit argument made of host numpy re-uploads on EVERY call — for the
    # 170 MB trained tower through the ~28 MB/s tunnel that was ~6 s per
    # 48-molecule harness chunk (bench 6.27 -> 3.9 mols/s regression)
    return jax.device_put(variables), cfg
