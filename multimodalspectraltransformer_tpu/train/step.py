"""The pjit-sharded training step.

Replaces the reference's PL-DDP ``training_step``
(`models_MMT_v15_4.py:1051-1118`): one jitted function whose inputs carry
NamedShardings — batch split over the mesh ``data`` axis, parameters
replicated (or tensor-parallel over ``model``) — so XLA emits the gradient
all-reduce over ICI automatically. No process groups, no NCCL, no Lightning.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.mmt import MMTBatch, MultimodalTransformer
from ..utils import vocab
from ..utils.config import MMTConfig
from . import loss as loss_mod
from .state import TrainState, apply_grads

Array = jax.Array


class StepMetrics(NamedTuple):
    loss: Array
    smi_loss: Array
    fp_loss: Array
    token_accuracy: Array  # teacher-forced next-token accuracy (non-pad)
    grad_norm: Array


class TrainBatch(NamedTuple):
    inputs: MMTBatch
    trg_tokens: Array  # [B, 64] <SOS>...<EOS> padded
    trg_fp: Array  # [B, 512]


def loss_fn(params, model: MultimodalTransformer, cfg: MMTConfig, batch: TrainBatch, rng):
    if cfg.train.mixed_precision and cfg.model.dtype != "bfloat16":
        # bf16 forward/backward: rebuild the model with bfloat16 COMPUTE
        # dtype (each layer casts its weights at use, so the differentiated
        # master params stay fp32 and the cast's transpose accumulates
        # grads back to fp32). Loss math below runs on fp32 logits.
        import dataclasses

        model = MultimodalTransformer(dataclasses.replace(cfg.model, dtype="bfloat16"))
    logits, fp_logits, _, _ = model.apply(
        {"params": params},
        batch.inputs,
        batch.trg_tokens[:, :-1],
        False,
        rngs={"dropout": rng},
    )
    logits = logits.astype(jnp.float32)
    fp_logits = fp_logits.astype(jnp.float32)
    out = loss_mod.total_loss(
        logits,
        batch.trg_tokens,
        fp_logits,
        batch.trg_fp,
        weight_smi=cfg.train.weight_smi,
        weight_fp=cfg.train.weight_fp,
    )
    targets = batch.trg_tokens[:, 1:]
    pred = jnp.argmax(logits, axis=-1)
    live = targets != vocab.PAD_ID
    acc = jnp.sum((pred == targets) & live) / jnp.maximum(jnp.sum(live), 1)
    return out.total, (out, acc)


@partial(jax.jit, static_argnames=("model", "cfg"), donate_argnames=("state",))
def train_step(
    model: MultimodalTransformer,
    cfg: MMTConfig,
    state: TrainState,
    batch: TrainBatch,
    rng: jax.Array,
) -> tuple[TrainState, StepMetrics]:
    step_rng = jax.random.fold_in(rng, state.step)
    if cfg.train.fast_dropout_rng:
        # Re-key the dropout stream onto the hardware RNG ('unsafe_rbg'):
        # threefry mask generation for the [B,H,S,S] attention-weight
        # dropout otherwise dominates the step (see TrainConfig).
        step_rng = jax.random.key(
            jax.random.bits(step_rng, (), "uint32"), impl="unsafe_rbg"
        )
    (total, (out, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, model, cfg, batch, step_rng
    )
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
    new_state = apply_grads(cfg.train, state, grads, total)
    return new_state, StepMetrics(total, out.smi_loss, out.fp_loss, acc, gnorm)


@partial(jax.jit, static_argnames=("model", "cfg"))
def eval_step(
    model: MultimodalTransformer, cfg: MMTConfig, params, batch: TrainBatch
) -> StepMetrics:
    logits, fp_logits, _, _ = model.apply(
        {"params": params}, batch.inputs, batch.trg_tokens[:, :-1], True
    )
    out = loss_mod.total_loss(
        logits, batch.trg_tokens, fp_logits, batch.trg_fp,
        weight_smi=cfg.train.weight_smi, weight_fp=cfg.train.weight_fp,
    )
    targets = batch.trg_tokens[:, 1:]
    pred = jnp.argmax(logits, axis=-1)
    live = targets != vocab.PAD_ID
    acc = jnp.sum((pred == targets) & live) / jnp.maximum(jnp.sum(live), 1)
    return StepMetrics(out.total, out.smi_loss, out.fp_loss, acc, jnp.zeros(()))
