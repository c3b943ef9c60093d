"""Checkpoint conversion: reference PyTorch state_dict <-> flax params.

The reference ships .pth/.ckpt checkpoints of ``MultimodalTransformer``
(`models_MMT_v15_4.py:487`, saved at `:1190-1210`). This module maps those
tensors onto the TPU-native parameter pytree:

- torch ``Linear.weight`` [out, in] -> flax ``kernel`` [in, out] (transpose),
- attention tensors keep the torch layout (our modules store
  ``in_proj_weight``/``out_proj_weight`` torch-style; no transpose),
- the five per-modality encoders stack onto the leading modality axis of
  ``modality_encoders`` in the order (1H, 13C, HSQC, COSY, IR),
- the MF embedding table [212, d] gains one zero row (our table is 213 rows
  because the reference's own vocab can emit id 212 — latent overflow,
  see models/mmt.py).

Works on plain numpy arrays so torch is only needed by the caller that
loads the .pth file.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..utils.config import ModelConfig

Array = Any

SPEC_EMBED_TORCH_KEYS = {
    "embed_1h": "linear_spec_embedding_1H.point_embedding_layer_1H.fc_H",
    "embed_13c": "linear_spec_embedding_13C.point_embedding_layer_13C.fc_C",
    "embed_hsqc": "linear_spec_embedding_HSQC.point_embedding_layer_HSQC.fc_HSQC",
    "embed_cosy": "linear_spec_embedding_COSY.point_embedding_layer_COSY.fc_COSY",
    "embed_ir": "linear_spec_embedding_IR.linear_spec_embedding_IR",
    "embed_mw": "linear_embedding_MW.linear_spec_embedding_MW",
}

ENCODER_TORCH_PREFIXES = ("encoder_1H", "encoder_13C", "encoder_HSQC", "encoder_COSY", "encoder_IR")


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping[str, Array], prefix: str) -> dict:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _mha(sd: Mapping[str, Array], prefix: str) -> dict:
    return {
        "in_proj_weight": _np(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_bias": _np(sd[f"{prefix}.in_proj_bias"]),
        "out_proj_weight": _np(sd[f"{prefix}.out_proj.weight"]),
        "out_proj_bias": _np(sd[f"{prefix}.out_proj.bias"]),
    }


def _norm(sd: Mapping[str, Array], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _encoder_layer(sd: Mapping[str, Array], prefix: str) -> dict:
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
    }


def _decoder_layer(sd: Mapping[str, Array], prefix: str) -> dict:
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "multihead_attn": _mha(sd, f"{prefix}.multihead_attn"),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "norm3": _norm(sd, f"{prefix}.norm3"),
    }


def from_torch_state_dict(cfg: ModelConfig, sd: Mapping[str, Array]) -> dict:
    """Build the flax params pytree from a reference torch state_dict."""
    params: dict = {}

    for ours, theirs in SPEC_EMBED_TORCH_KEYS.items():
        params[ours] = _linear(sd, theirs)

    mf = _np(sd["linear_embedding_MF.embedding.weight"])
    params["embed_mf"] = {"embedding": np.concatenate([mf, np.zeros((1, mf.shape[1]), mf.dtype)], axis=0)}
    params["embed_ms"] = {"embedding": _np(sd["linear_embedding_MS.embedding.weight"])}
    params["embed_trg"] = {"embedding": _np(sd["embed_trg.weight"])}
    params["pe_trg"] = {"embedding": _np(sd["pe_trg.weight"])}

    # stacked modality encoders: axis 0 = (1H, 13C, HSQC, COSY, IR)
    enc_layers: dict = {}
    for i in range(cfg.num_encoder_layers):
        per_mod = [_encoder_layer(sd, f"{p}.layers.{i}") for p in ENCODER_TORCH_PREFIXES]
        import jax

        enc_layers[f"layers_{i}"] = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_mod)
    params["modality_encoders"] = enc_layers

    params["encoder_cross"] = {
        f"layers_{i}": _encoder_layer(sd, f"encoder_cross.layers.{i}")
        for i in range(cfg.num_encoder_layers)
    }
    params["decoder"] = {
        f"layers_{i}": _decoder_layer(sd, f"decoder.layers.{i}")
        for i in range(cfg.num_decoder_layers)
    }

    params["fp1"] = _linear(sd, "fp1")
    params["fc_out"] = _linear(sd, "fc_out")
    params["real_data_linear"] = _linear(sd, "real_data_linear")
    return params


def to_torch_state_dict(cfg: ModelConfig, params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse mapping (export for reference-side tooling / round-trip tests)."""
    sd: dict[str, np.ndarray] = {}

    def put_linear(prefix: str, p: Mapping[str, Array]):
        sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_mha(prefix: str, p: Mapping[str, Array]):
        sd[f"{prefix}.in_proj_weight"] = np.asarray(p["in_proj_weight"])
        sd[f"{prefix}.in_proj_bias"] = np.asarray(p["in_proj_bias"])
        sd[f"{prefix}.out_proj.weight"] = np.asarray(p["out_proj_weight"])
        sd[f"{prefix}.out_proj.bias"] = np.asarray(p["out_proj_bias"])

    def put_norm(prefix: str, p: Mapping[str, Array]):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_encoder_layer(prefix: str, p: Mapping[str, Any]):
        put_mha(f"{prefix}.self_attn", p["self_attn"])
        put_linear(f"{prefix}.linear1", p["linear1"])
        put_linear(f"{prefix}.linear2", p["linear2"])
        put_norm(f"{prefix}.norm1", p["norm1"])
        put_norm(f"{prefix}.norm2", p["norm2"])

    for ours, theirs in SPEC_EMBED_TORCH_KEYS.items():
        put_linear(theirs, params[ours])

    sd["linear_embedding_MF.embedding.weight"] = np.asarray(params["embed_mf"]["embedding"])[:-1]
    sd["linear_embedding_MS.embedding.weight"] = np.asarray(params["embed_ms"]["embedding"])
    sd["embed_trg.weight"] = np.asarray(params["embed_trg"]["embedding"])
    sd["pe_trg.weight"] = np.asarray(params["pe_trg"]["embedding"])

    for i in range(cfg.num_encoder_layers):
        stacked = params["modality_encoders"][f"layers_{i}"]
        for m, prefix in enumerate(ENCODER_TORCH_PREFIXES):
            import jax

            per_mod = jax.tree.map(lambda x: np.asarray(x)[m], stacked)
            put_encoder_layer(f"{prefix}.layers.{i}", per_mod)
        put_encoder_layer(f"encoder_cross.layers.{i}", params["encoder_cross"][f"layers_{i}"])

    for i in range(cfg.num_decoder_layers):
        p = params["decoder"][f"layers_{i}"]
        put_mha(f"decoder.layers.{i}.self_attn", p["self_attn"])
        put_mha(f"decoder.layers.{i}.multihead_attn", p["multihead_attn"])
        put_linear(f"decoder.layers.{i}.linear1", p["linear1"])
        put_linear(f"decoder.layers.{i}.linear2", p["linear2"])
        put_norm(f"decoder.layers.{i}.norm1", p["norm1"])
        put_norm(f"decoder.layers.{i}.norm2", p["norm2"])
        put_norm(f"decoder.layers.{i}.norm3", p["norm3"])

    put_linear("fp1", params["fp1"])
    put_linear("fc_out", params["fc_out"])
    put_linear("real_data_linear", params["real_data_linear"])
    return sd


def load_torch_checkpoint(cfg: ModelConfig, path: str) -> dict:
    """Load a reference .pth (raw state_dict) or Lightning .ckpt file.

    Lightning checkpoints nest the weights under ``state_dict`` with a
    ``model.`` prefix (`models_MMT_v15_4.py:985-998` wraps the model as
    ``self.model``)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        sd = {k.removeprefix("model."): v for k, v in blob["state_dict"].items()}
    else:
        sd = blob
    return from_torch_state_dict(cfg, sd)
