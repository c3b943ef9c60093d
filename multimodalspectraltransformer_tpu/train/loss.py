"""Loss engine.

Reference: ``calculate_total_loss`` (`models_MMT_v15_4.py:200-355`). The
on-device part is:

- SMILES cross-entropy over *all* positions — the reference uses
  ``torch.nn.CrossEntropyLoss()`` with no ignore_index (`:70`, `:268-271`),
  so <PAD> positions contribute to the mean. Reproduced exactly (a masked
  variant is provided for new training runs).
- fingerprint BCE-with-logits against the 512-bit Morgan target (`:280`).

The remaining reference terms (molecular-weight MSE on *generated* strings,
SGNN spectral-similarity feedback, tanimoto/validity rewards) depend on
host-side chemistry over decoded SMILES; they are computed by the training
harness via ``chem``/``sim`` and folded in as scalars — see train/loop.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils import vocab

Array = jax.Array


class LossOutput(NamedTuple):
    total: Array
    smi_loss: Array
    fp_loss: Array


def smiles_cross_entropy(
    logits: Array,  # [B, T, V]
    targets: Array,  # [B, T] int ids
    mask: Optional[Array] = None,  # [B, T] 1.0 = count this position
) -> Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is None:
        # reference parity: plain mean including padding positions
        return jnp.mean(nll)
    mask = mask.astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def fingerprint_bce(fp_logits: Array, fp_target: Array) -> Array:
    """BCEWithLogitsLoss, mean reduction."""
    z = fp_logits
    y = fp_target.astype(z.dtype)
    # log-sum-exp stable form: max(z,0) - z*y + log(1+exp(-|z|))
    return jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))


def total_loss(
    logits: Array,
    trg_tokens_full: Array,  # [B, T+1] the <SOS>...<EOS> padded sequence
    fp_logits: Array,
    fp_target: Array,
    weight_smi: float = 1.0,
    weight_fp: float = 0.0,
    pad_aware: bool = False,
    extra: Array | float = 0.0,  # host-computed scalar terms (MW/SGNN/...)
) -> LossOutput:
    """Teacher-forcing loss: input = trg[:, :-1], target = trg[:, 1:]
    (reference `models_MMT_v15_4.py:1061-1062`, `:268-271`)."""
    targets = trg_tokens_full[:, 1:]
    mask = (targets != vocab.PAD_ID) if pad_aware else None
    smi = smiles_cross_entropy(logits, targets, mask)
    fp = fingerprint_bce(fp_logits, fp_target)
    total = weight_smi * smi + weight_fp * fp + extra
    return LossOutput(total, smi, fp)
