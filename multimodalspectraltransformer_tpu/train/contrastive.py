"""Contrastive (CLIP / BLIP) training loops.

Reference: ``run_CLIP`` (`clip_functions_v15_4.py:331`, PL Trainer at
`:311-324`) and ``run_BLIP`` (`blip_functions_v15_4.py:375`) — train the
spectrum<->SMILES alignment towers against a frozen MMT encoder, using
MW-sorted batches as hard negatives (`WeightSortedBatchSampler:117-152`)
and saving a backup checkpoint if training dies
(`clip_functions_v15_4.py:311-329`).

TPU layout: the frozen MMT encode and the contrastive step are two jitted
executables; the tower's optimizer state lives in a plain optax TrainState.
The same loop trains CLIP (fingerprint tower) and BLIP (Q-Former over
memory) — the model adapter closes over which spectrum representation is
consumed.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..chem import tokenizer as chem_tokenizer
from ..data.pipeline import Loader
from ..models import mmt
from ..rank import clip as clip_mod
from ..rank import qformer as qformer_mod
from ..utils.config import MMTConfig
from .checkpoint import export_params_msgpack
from .loop import MetricsLogger

Array = jax.Array


def clip_tokenize(smiles_list, max_len: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize SMILES for the text tower (framed char-level ids) and build
    the attention mask (1 = real token). Stands in for the reference's HF
    ChemBERTa tokenizer when training a tower from scratch; converted
    ChemBERTa checkpoints bring their own vocab via rank.clip.from_hf_roberta."""
    toks = np.zeros((len(smiles_list), max_len), np.int32)
    mask = np.zeros((len(smiles_list), max_len), np.int32)
    for i, s in enumerate(smiles_list):
        ids, pad_mask = chem_tokenizer.encode_smiles_framed(s, max_len)
        toks[i] = ids
        mask[i] = 1 - np.asarray(pad_mask, np.int32)  # attention: 1 = real
    return toks, mask


@dataclass
class ContrastiveConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-3
    num_epochs: int = 3
    batch_size: int = 32
    max_text_len: int = 64
    order_strategy: str = "weight_sorted"  # hard negatives (reference default)
    temperature: float = 1.0
    max_steps: int = 0
    # metrics materialization cadence: every float(loss) is a device sync
    # (a full RPC round trip on remote backends) — same gating as the MMT
    # training loop's log_every
    log_every: int = 1
    # periodic tower+optimizer snapshot cadence (guarded drivers kill and
    # retry chip runs; without this every retry restarts from step 0 — the
    # r3 silent-client-death lesson). 0 disables.
    save_every: int = 500


def train_contrastive(
    mmt_cfg: MMTConfig,
    mmt_params: Any,
    records: list,
    tower: str = "clip",  # "clip" | "blip"
    ccfg: ContrastiveConfig = ContrastiveConfig(),
    tower_cfg: Optional[Any] = None,
    text_tower_cfg: Optional[Any] = None,  # BLIP text tower (CLIPConfig)
    init_variables: Optional[Any] = None,
    metrics_path: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    seed: int = 0,
) -> tuple[Any, MetricsLogger]:
    """Train a CLIP or BLIP ranking tower against the frozen MMT.

    Returns (tower variables, metrics logger). On any exception the current
    variables are saved to ``<checkpoint_path>.backup.msgpack`` before
    re-raising (the reference's backup-checkpoint behavior)."""
    rng = jax.random.PRNGKey(seed)
    # the frozen full-MMT encode at contrastive batch sizes (256) dominates
    # the step (measured 2-3 s/step fp32 on the v5e); run it in bf16 like
    # the training/decode paths — params stay fp32, compute is bf16
    mmt_model = _encode_model(mmt_cfg.model)

    if tower not in ("clip", "blip"):
        raise ValueError(tower)
    tower_model, *_ = make_tower(tower, tower_cfg, text_tower_cfg)

    # park the frozen MMT tree in HBM once: host-numpy leaves passed as jit
    # args re-upload the full ~170 MB tree through the ~28 MB/s tunnel on
    # EVERY step (same bug class as rank/clip.load_bundle, fixed 4d7f708)
    mmt_params = jax.device_put(mmt_params)

    records = _drop_truncating_records(records, mmt_cfg.model)

    loader = Loader(
        records, mmt_cfg.model, ccfg.batch_size, seed=seed,
        order_strategy=ccfg.order_strategy,
    )
    if len(records) < ccfg.batch_size:
        raise ValueError(
            f"train_contrastive needs at least batch_size={ccfg.batch_size} "
            f"records for one batch; got {len(records)}"
        )

    # init tower
    probe = next(iter(loader.epoch(0)))
    fp, memory, kpm = _encode_frozen(mmt_model, mmt_params, jax.tree.map(jnp.asarray, probe.inputs))
    smiles0 = _batch_smiles(probe)
    toks0, mask0 = clip_tokenize(smiles0, ccfg.max_text_len)
    if init_variables is not None:
        variables = init_variables
    elif tower == "clip":
        variables = tower_model.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            jnp.asarray(toks0), jnp.asarray(mask0), fp, False,
        )
    else:
        variables = tower_model.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            jnp.asarray(toks0), jnp.asarray(mask0), memory, kpm, False,
        )

    tx = optax.adamw(ccfg.learning_rate, weight_decay=ccfg.weight_decay)
    opt_state = tx.init(variables["params"])

    # Resume: restore tower params + optimizer state + step from the periodic
    # snapshot so a killed-and-retried run (guarded driver, silent client
    # death) continues instead of restarting. Data order restarts at epoch 0
    # on resume — acceptable for the contrastive objective.
    import os as _os

    from flax import serialization as _ser

    state_path = checkpoint_path + ".state" if checkpoint_path else None
    start_step = 0
    if state_path and _os.path.exists(state_path):
        tpl = {"params": variables["params"], "opt_state": opt_state,
               "step": np.zeros((), np.int32)}
        with open(state_path, "rb") as f:
            restored = _ser.from_bytes(tpl, f.read())
        variables = {"params": restored["params"]}
        opt_state = restored["opt_state"]
        start_step = int(restored["step"])
        print(f"[contrastive] resumed {state_path} at step {start_step}", flush=True)

    def _save_state(step, params_now, opt_now):
        if not state_path:
            return
        blob = _ser.to_bytes({
            "params": jax.device_get(params_now),
            "opt_state": jax.device_get(opt_now),
            "step": np.asarray(step, np.int32),
        })
        tmp = state_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        _os.replace(tmp, state_path)  # atomic: guard may kill mid-write

    loss_fn_name = "clip" if tower == "clip" else "blip"

    # ONE jit for encode + tower loss + update: the frozen encode's memory
    # tensor ([B, 582, 128] ~ 76 MB at B=256) must never cross a jit
    # boundary — on the tunneled remote backend, per-step large jit outputs
    # leaked ~100 MB/step of host RSS (the CL stage was OOM-killed at 130 GB
    # on 2026-08-20). Fusing also drops two dispatches per step.
    @jax.jit
    def fused_step(params, opt_state, mmt_params, inputs, tokens, mask, rng):
        enc = mmt_model.apply({"params": mmt_params}, inputs, None, True)
        fp = enc.fingerprint.astype(jnp.float32)
        memory = enc.memory.astype(jnp.float32)
        kpm = enc.memory_key_padding_mask

        def loss_fn(p):
            if tower == "clip":
                cb, mt = tower_model.apply(
                    {"params": p}, tokens, mask, fp, False, rngs={"dropout": rng}
                )
                out = clip_mod.clip_loss(cb, mt, ccfg.temperature)
                return out.mean_loss
            text_emb, spec_emb = tower_model.apply(
                {"params": p}, tokens, mask, memory, kpm, False, rngs={"dropout": rng}
            )
            return qformer_mod.blip_loss(text_emb, spec_emb, ccfg.temperature).mean_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # HBM-resident fast path (same contract as run_training's device_data):
    # the featurized corpus is parked on device once and every batch is an
    # on-device row gather; text tokens are pre-tokenized for the WHOLE
    # corpus once (trg_tokens already carry the framed SMILES ids, but the
    # text tower may use a different max_text_len, so tokenize explicitly).
    # Removes the per-batch host featurization (~15 ms/sample of chemistry)
    # that otherwise dominates contrastive training on a slow host.
    dd = loader.device_dataset()
    text_toks = text_mask = None
    if dd is not None:
        tk, mk = clip_tokenize(loader._device_kept_smiles, ccfg.max_text_len)
        text_toks, text_mask = jnp.asarray(tk), jnp.asarray(mk)

    logger = MetricsLogger(metrics_path)
    params = variables["params"]
    step_count = start_step

    def _epoch_batches(epoch: int):
        if dd is None:
            for batch in loader.epoch(epoch):
                inputs = jax.tree.map(jnp.asarray, batch.inputs)
                smiles = _batch_smiles(batch)
                toks, mask = clip_tokenize(smiles, ccfg.max_text_len)
                yield inputs, jnp.asarray(toks), jnp.asarray(mask)
        else:
            from ..data import pipeline as dp_mod

            for idx in loader.epoch_row_batches(epoch):
                ia = jnp.asarray(idx)
                rows = dp_mod.gather_rows(dd, ia)
                yield rows.inputs, text_toks[ia], text_mask[ia]

    try:
        if ccfg.max_steps and step_count >= ccfg.max_steps:
            raise StopIteration  # resumed past the target: nothing to do
        for epoch in range(ccfg.num_epochs):
            for inputs, toks, mask in _epoch_batches(epoch):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = fused_step(
                    params, opt_state, mmt_params, inputs, toks, mask, sub,
                )
                step_count += 1
                # materialize the scalar EVERY step: bounds the async
                # dispatch queue on remote backends (a 1-scalar fetch,
                # ~32 ms — small next to the ~1.5 s step)
                loss_host = float(loss)
                if step_count % ccfg.log_every == 0:
                    logger.log({
                        "step": step_count, "epoch": epoch,
                        f"{loss_fn_name}_loss": loss_host,
                    })
                if ccfg.save_every and step_count % ccfg.save_every == 0:
                    _save_state(step_count, params, opt_state)
                if ccfg.max_steps and step_count >= ccfg.max_steps:
                    raise StopIteration
    except StopIteration:
        pass
    except Exception:
        if checkpoint_path:
            export_params_msgpack({"params": params}, checkpoint_path + ".backup.msgpack")
        raise

    variables = {"params": params}
    if checkpoint_path:
        export_params_msgpack(variables, checkpoint_path)
    return variables, logger


def _encode_model(mcfg) -> "mmt.MultimodalTransformer":
    """Encode-side model in bf16 compute (fp32 params, flax dtype pattern
    — same mechanics as train.step's mixed_precision rebuild)."""
    if mcfg.dtype != "bfloat16":
        mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    return mmt.MultimodalTransformer(mcfg)


@partial(jax.jit, static_argnames=("mmt_model",))
def _encode_frozen(mmt_model, mmt_params, inputs):
    """Frozen-MMT encode with params as a TRACED argument: closing over
    them would bake the whole parameter tree into the executable as
    constants (bigger compiles, HBM duplication, no compile-cache hits).
    Outputs are cast to fp32 so the tower's numerics are dtype-independent
    of the encode path."""
    enc = mmt_model.apply({"params": mmt_params}, inputs, None, True)
    f32 = lambda x: x.astype(jnp.float32)
    return f32(enc.fingerprint), f32(enc.memory), enc.memory_key_padding_mask


def _drop_truncating_records(records, mcfg) -> list:
    """Drop records whose SMILES would truncate under the trg framing
    (frame_and_pad silently cuts at mcfg.spectrum_points - 2 tokens):
    _batch_smiles detokenizes trg_tokens, so a truncated molecule would
    pair its spectrum with a wrong (usually invalid) text string."""
    from ..chem import tokenizer as chem_tok

    kept = [
        r for r in records
        if len(chem_tok.encode_smiles(r.smiles)) <= mcfg.spectrum_points - 2
    ]
    if len(kept) != len(records):
        print(
            f"contrastive: dropped {len(records) - len(kept)} records whose "
            f"SMILES exceed the {mcfg.spectrum_points - 2}-token trg framing"
        )
    return kept


def _batch_smiles(batch) -> list[str]:
    from ..utils import vocab

    return [vocab.ids_to_smiles(t[1:]) for t in np.asarray(batch.trg_tokens)]


def make_tower(tower: str, tower_cfg=None, text_tower_cfg=None):
    """Tower model + configs (shared between training and evaluation)."""
    if tower == "clip":
        tcfg = tower_cfg or clip_mod.CLIPConfig()
        return clip_mod.CLIPRanker(tcfg), tcfg, None
    qcfg = tower_cfg or qformer_mod.QFormerConfig()
    text_cfg = text_tower_cfg or clip_mod.CLIPConfig(
        text_layers=2, text_heads=4, text_hidden=qcfg.encoder_width,
        text_ffn=4 * qcfg.encoder_width, cb_embedding=qcfg.encoder_width,
        projection_dim=qcfg.projection_dim,
    )
    return qformer_mod.BLIPRanker(qcfg, text_cfg), qcfg, text_cfg


def retrieval_accuracy(
    variables,
    mmt_cfg,
    mmt_params,
    records,
    tower: str = "blip",
    tower_cfg=None,
    text_tower_cfg=None,
    batch_size: int = 32,
    max_text_len: int = 64,
    seed: int = 0,
) -> dict:
    """Contrastive-retrieval evaluation: R@1/R@5 for text->spectrum and
    spectrum->text over the record set (each molecule's SMILES must
    retrieve its own spectrum among all N and vice versa)."""
    mmt_model = _encode_model(mmt_cfg.model)  # same bf16 encode as training
    tower_model, *_ = make_tower(tower, tower_cfg, text_tower_cfg)

    mmt_params = jax.device_put(mmt_params)  # one upload, not one per batch
    records = _drop_truncating_records(records, mmt_cfg.model)
    loader = Loader(records, mmt_cfg.model, batch_size, seed=seed, drop_remainder=False)
    text_embs, spec_embs = [], []
    for batch in loader.epoch(0):
        n_real = batch.trg_tokens.shape[0]
        if n_real < batch_size:
            # pad the short remainder batch to the common shape: a new
            # batch shape forces a second ~20-40 s full-MMT compile
            pad = batch_size - n_real
            batch = jax.tree.map(
                lambda x: np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]), batch
            )
        inputs = jax.tree.map(jnp.asarray, batch.inputs)
        fp, memory, kpm = _encode_frozen(mmt_model, mmt_params, inputs)
        smiles = _batch_smiles(batch)
        toks, mask = clip_tokenize(smiles, max_text_len)
        if tower == "clip":
            cb, mt = tower_model.apply(
                {"params": variables["params"]}, jnp.asarray(toks), jnp.asarray(mask), fp, True
            )
        else:
            cb, mt = tower_model.apply(
                {"params": variables["params"]}, jnp.asarray(toks), jnp.asarray(mask),
                memory, kpm, True,
            )
        text_embs.append(np.asarray(cb)[:n_real])  # drop padded duplicates
        spec_embs.append(np.asarray(mt)[:n_real])
    text = np.concatenate(text_embs)
    spec = np.concatenate(spec_embs)
    text = text / np.linalg.norm(text, axis=1, keepdims=True)
    spec = spec / np.linalg.norm(spec, axis=1, keepdims=True)
    sim = text @ spec.T  # [N, N]
    n = len(sim)
    gold = np.arange(n)

    def recall_at(k, s):
        rank = np.argsort(-s, axis=1)
        return float(np.mean([(gold[i] in rank[i, :k]) for i in range(n)]))

    return {
        "n": n,
        "text_to_spec_r1": recall_at(1, sim),
        "text_to_spec_r5": recall_at(5, sim),
        "spec_to_text_r1": recall_at(1, sim.T),
        "spec_to_text_r5": recall_at(5, sim.T),
    }
