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


@partial(jax.jit, static_argnames=("p",))
def blank_modalities_device(batch: TrainBatch, rng: jax.Array, p: float) -> TrainBatch:
    """Random per-sample modality blanking ON DEVICE (reference
    ``blank_percentage``, `dataloaders_pl_v15_4.py:597-626`: each present
    modality independently blanked with probability p; when everything got
    blanked, 1H + 13C are restored).

    TPU-first: the reference (and our host loader) blanks during
    featurization, which makes featurization stochastic and forces the
    ~8x-slower host data path. Here featurization stays deterministic — the
    whole corpus lives in HBM (`Loader.device_dataset`) — and the stochastic
    augmentation is a jitted elementwise transform on each gathered batch:
    zero host cost, exact blank semantics (src -> zeros, mask -> all-pad,
    matching what `featurize` emits for absent modalities, so eval-time
    missing modalities look exactly like train-time blanked ones)."""
    inp = batch.inputs
    B = inp.mw.shape[0]
    present = jnp.stack(
        [
            (inp.mask_1h == 0).any(axis=1),
            (inp.mask_13c == 0).any(axis=1),
            (inp.mask_hsqc == 0).any(axis=1),
            (inp.mask_cosy == 0).any(axis=1),
            (inp.src_ir != 0).any(axis=1),
        ],
        axis=1,
    )  # [B, 5]
    drop = jax.random.uniform(rng, (B, 5)) < p
    keep = present & ~drop
    none_kept = ~keep.any(axis=1)
    # all-blanked fallback: restore 1H + 13C (where present)
    keep = keep.at[:, 0].set(jnp.where(none_kept, present[:, 0], keep[:, 0]))
    keep = keep.at[:, 1].set(jnp.where(none_kept, present[:, 1], keep[:, 1]))

    def _apply(src, mask, k):
        kk = k.reshape((B,) + (1,) * (src.ndim - 1))
        return (
            src * kk.astype(src.dtype),
            jnp.where(k[:, None], mask, jnp.ones_like(mask)),
        )

    s1h, m1h = _apply(inp.src_1h, inp.mask_1h, keep[:, 0])
    s13c, m13c = _apply(inp.src_13c, inp.mask_13c, keep[:, 1])
    shsqc, mhsqc = _apply(inp.src_hsqc, inp.mask_hsqc, keep[:, 2])
    scosy, mcosy = _apply(inp.src_cosy, inp.mask_cosy, keep[:, 3])
    sir = inp.src_ir * keep[:, 4][:, None].astype(inp.src_ir.dtype)
    return batch._replace(
        inputs=inp._replace(
            src_1h=s1h, mask_1h=m1h,
            src_13c=s13c, mask_13c=m13c,
            src_hsqc=shsqc, mask_hsqc=mhsqc,
            src_cosy=scosy, mask_cosy=mcosy,
            src_ir=sir,
        )
    )


@partial(jax.jit, static_argnames=("sigma_h", "sigma_c", "gate_p"))
def jitter_spectra_device(
    batch: TrainBatch,
    rng: jax.Array,
    sigma_h: float = 0.2,
    sigma_c: float = 3.0,
    gate_p: float = 0.5,
) -> TrainBatch:
    """Per-peak Gaussian jitter of the NMR coordinates, ON DEVICE — the
    sim2real domain-randomization knob. Measured motivation: the shipped
    reference test spectra (SGNN-simulated) disagree with our distilled-GNN
    factory by ~3 ppm 13C / ~0.2 ppm 1H nearest-peak MAE, while training
    spectra are self-consistent to <0.1 ppm — a model trained only on sharp
    spectra treats simulator disagreement as out-of-distribution. Sigmas
    are in ppm (divided by the 10/200 normalization internally); each
    SAMPLE is jittered with probability ``gate_p`` so clean spectra remain
    in-distribution too. Padded slots stay exactly zero."""
    inp = batch.inputs
    B = inp.mw.shape[0]
    ks = jax.random.split(rng, 6)
    gate = (jax.random.uniform(ks[0], (B,)) < gate_p).astype(inp.src_1h.dtype)
    sh, sc = sigma_h / 10.0, sigma_c / 200.0

    def noise(k, shape, sigma):
        return jax.random.normal(k, shape) * sigma

    live = lambda mask: (mask == 0).astype(inp.src_1h.dtype)
    g1 = gate[:, None]
    g2 = gate[:, None, None]
    # 1H: jitter ppm (dim 0) only; intensity carries multiplet structure
    n1h = jnp.stack(
        [noise(ks[1], inp.src_1h.shape[:2], sh), jnp.zeros(inp.src_1h.shape[:2])],
        axis=-1,
    )
    s1h = inp.src_1h + n1h * live(inp.mask_1h)[..., None] * g2
    s13c = inp.src_13c + noise(ks[2], inp.src_13c.shape, sc) * live(inp.mask_13c) * g1
    nhsqc = jnp.stack(
        [noise(ks[3], inp.src_hsqc.shape[:2], sh), noise(ks[4], inp.src_hsqc.shape[:2], sc)],
        axis=-1,
    )
    shsqc = inp.src_hsqc + nhsqc * live(inp.mask_hsqc)[..., None] * g2
    ncosy = noise(ks[5], inp.src_cosy.shape, sh)
    scosy = inp.src_cosy + ncosy * live(inp.mask_cosy)[..., None] * g2
    return batch._replace(
        inputs=inp._replace(src_1h=s1h, src_13c=s13c, src_hsqc=shsqc, src_cosy=scosy)
    )


@partial(jax.jit, static_argnames=("sigma_h", "sigma_c", "gate_p", "knots_h", "knots_c"))
def warp_spectra_device(
    batch: TrainBatch,
    rng: jax.Array,
    sigma_h: float = 0.3,
    sigma_c: float = 4.0,
    gate_p: float = 0.5,
    knots_h: int = 5,
    knots_c: int = 6,
) -> TrainBatch:
    """Per-sample smooth random warp of the ppm AXES, applied consistently
    across modalities — the structured half of sim2real domain
    randomization.

    Motivation (measured): a different NMR simulator does not add i.i.d.
    noise per peak — it moves *chemical environments* coherently, so a
    carbon's 13C peak and its HSQC C-coordinate stay equal to each other
    while both disagree with our simulator by several ppm (shipped SGNN
    test spectra vs our factory: ~3 ppm 13C NN-MAE with cross-modality
    consistency intact). i.i.d. per-peak jitter (`jitter_spectra_device`)
    breaks exactly that consistency at train time, teaching the model that
    modalities can't be cross-matched — which is why jitter alone failed to
    transfer (phase-2: 0.000 on the reference test set).

    Mechanism: per sample, draw offsets at a few fixed knots spanning the
    ppm axis and add their linear interpolation to every coordinate on
    that axis — the SAME warp for 13C peaks and HSQC C-coordinates (carbon
    axis), and the SAME warp for 1H, HSQC H- and both COSY coordinates
    (proton axis). Knot spacing (~45 ppm 13C / ~3 ppm 1H) keeps the warp
    smooth; sigmas of a few ppm keep it monotone (slope perturbation
    << 1). Padded slots stay exactly zero; each sample is warped with
    probability ``gate_p``. Sigmas are in ppm (normalized internally by
    the 10/200 featurization scales, `data/pipeline.py:424-455`)."""
    inp = batch.inputs
    B = inp.mw.shape[0]
    ks = jax.random.split(rng, 3)
    gate = (jax.random.uniform(ks[0], (B,)) < gate_p).astype(inp.src_1h.dtype)
    # knot positions in normalized units: 13C -10..230 ppm, 1H -0.5..11.5 ppm
    kc = jnp.linspace(-0.05, 1.15, knots_c)
    kh = jnp.linspace(-0.05, 1.15, knots_h)
    dc = jax.random.normal(ks[1], (B, knots_c)) * (sigma_c / 200.0) * gate[:, None]
    dh = jax.random.normal(ks[2], (B, knots_h)) * (sigma_h / 10.0) * gate[:, None]

    warp_c = jax.vmap(lambda x, d: x + jnp.interp(x, kc, d))
    warp_h = jax.vmap(lambda x, d: x + jnp.interp(x, kh, d))
    live = lambda mask: mask == 0

    s13c = jnp.where(live(inp.mask_13c), warp_c(inp.src_13c, dc), inp.src_13c)
    s1h = inp.src_1h.at[..., 0].set(
        jnp.where(live(inp.mask_1h), warp_h(inp.src_1h[..., 0], dh), inp.src_1h[..., 0])
    )
    shsqc = jnp.stack(
        [
            jnp.where(live(inp.mask_hsqc), warp_h(inp.src_hsqc[..., 0], dh), inp.src_hsqc[..., 0]),
            jnp.where(live(inp.mask_hsqc), warp_c(inp.src_hsqc[..., 1], dc), inp.src_hsqc[..., 1]),
        ],
        axis=-1,
    )
    scosy = jnp.stack(
        [
            jnp.where(live(inp.mask_cosy), warp_h(inp.src_cosy[..., 0], dh), inp.src_cosy[..., 0]),
            jnp.where(live(inp.mask_cosy), warp_h(inp.src_cosy[..., 1], dh), inp.src_cosy[..., 1]),
        ],
        axis=-1,
    )
    return batch._replace(
        inputs=inp._replace(src_1h=s1h, src_13c=s13c, src_hsqc=shsqc, src_cosy=scosy)
    )


def loss_fn(params, model: MultimodalTransformer, cfg: MMTConfig, batch: TrainBatch, rng, step=0):
    if cfg.train.mixed_precision and cfg.model.dtype != "bfloat16":
        # bf16 forward/backward: rebuild the model with bfloat16 COMPUTE
        # dtype (each layer casts its weights at use, so the differentiated
        # master params stay fp32 and the cast's transpose accumulates
        # grads back to fp32). Loss math below runs on fp32 logits.
        import dataclasses

        model = MultimodalTransformer(dataclasses.replace(cfg.model, dtype="bfloat16"))
    if cfg.train.ss_prob > 0.0:
        # Two-pass scheduled sampling (see TrainConfig.ss_prob). Encode
        # once (dropout on, as in the plain path); decode twice: a
        # gradient-stopped deterministic pass supplies the model's own
        # token predictions, which replace ground-truth decoder inputs at
        # a ramped per-position rate; the loss comes from the second pass.
        r_enc, r_samp, r_mix, r_dec = jax.random.split(rng, 4)
        enc = model.apply(
            {"params": params}, batch.inputs, False,
            method=MultimodalTransformer.encode, rngs={"dropout": r_enc},
        )
        dec_in = batch.trg_tokens[:, :-1]  # [B, T], col 0 = <SOS>
        logits1 = model.apply(
            {"params": params}, dec_in, enc.memory,
            enc.memory_key_padding_mask, True,
            method=MultimodalTransformer.decode,
        )
        logits1 = jax.lax.stop_gradient(logits1.astype(jnp.float32))
        sampled = jax.random.categorical(r_samp, logits1)  # [B, T] int32
        # logits1[:, t] predicts the token at input position t+1:
        pred_for_pos = jnp.concatenate([dec_in[:, :1], sampled[:, :-1]], axis=1)
        ramp = jnp.clip(step / max(cfg.train.ss_ramp_steps, 1), 0.0, 1.0)
        p_live = cfg.train.ss_prob * ramp
        coin = jax.random.bernoulli(r_mix, p_live, dec_in.shape)
        pos = jnp.arange(dec_in.shape[1])[None, :]
        replace = coin & (dec_in != vocab.PAD_ID) & (pos >= 1)
        mixed = jnp.where(replace, pred_for_pos, dec_in)
        logits = model.apply(
            {"params": params}, mixed, enc.memory,
            enc.memory_key_padding_mask, False,
            method=MultimodalTransformer.decode, rngs={"dropout": r_dec},
        )
        fp_logits = enc.fingerprint
    else:
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
        state.params, model, cfg, batch, step_rng, state.step
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
