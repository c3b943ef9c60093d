"""The training driver: epochs, validation, checkpointing, metrics.

Reference: ``run_MMT`` / ``run_training_MMT`` (`MT_functions_v15_4.py:
82-158`) driving a PL Trainer with wandb logging, periodic checkpoint
saves, optional in-training sequence generation (``gen_SMI_sequence``) and
loss-weight annealing (`models_MMT_v15_4.py:254-262`).

TPU-native layout: batches are sharded over the mesh ``data`` axis before
each jitted step; validation reuses the compiled eval step; checkpoints go
through Orbax; metrics stream to a JSONL sink (wandb-compatible dicts — a
thin adapter can forward them when a tracker is available).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..chem import api as chem
from ..data.pipeline import Loader
from ..models import mmt
from ..parallel import batch_sharding, make_mesh, param_shardings
from ..utils import vocab
from ..utils.config import MMTConfig
from . import checkpoint as ckpt_mod
from .state import TrainState, create_state
from .step import StepMetrics, eval_step, train_step


class MetricsLogger:
    """JSONL metrics sink (the wandb replacement; same dict-of-scalars
    shape the reference logs, `models_MMT_v15_4.py:1104-1116`)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = open(path, "a") if path else None
        self.history: list[dict] = []

    def log(self, record: dict) -> None:
        record = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v) for k, v in record.items()}
        self.history.append(record)
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


@dataclass
class TrainResult:
    state: TrainState
    train_loss: float
    val_loss: float
    steps: int
    metrics: MetricsLogger


def run_training(
    cfg: MMTConfig,
    train_loader: Loader,
    val_loader: Optional[Loader] = None,
    init_params: Any = None,
    mesh=None,
    metrics_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    seed: int = 0,
    gen_metrics_every: int = 0,  # in-training generation metrics cadence
    max_steps: int = 0,  # 0 = run num_epochs
) -> TrainResult:
    """Train the MMT. Single- or multi-device (pass a mesh for DP/TP)."""
    model = mmt.MultimodalTransformer(cfg.model)
    rng = jax.random.PRNGKey(seed)

    if init_params is not None:
        # own a copy: the jitted train step donates its state buffers, and
        # the caller's arrays must survive the run
        params = jax.tree.map(lambda a: jnp.array(a, copy=True), init_params)
    else:
        params = mmt.init_params(cfg.model, rng)
    if mesh is not None:
        shardings = param_shardings(mesh, params, tensor_parallel=False)
        params = jax.device_put(params, shardings)
        bs = batch_sharding(mesh)
        put_batch = lambda b: jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), bs), b)
    else:
        put_batch = lambda b: jax.tree.map(jnp.asarray, b)

    state = create_state(cfg.train, params)
    manager = None
    if checkpoint_dir:
        manager = ckpt_mod.CheckpointManager(
            checkpoint_dir, keep=cfg.train.keep_checkpoints,
            save_interval_steps=cfg.train.save_interval_steps,
        )
        restored = manager.restore(state)
        if restored is not None:
            state = restored

    logger = MetricsLogger(metrics_path)
    train_loss = float("nan")
    val_loss = float("nan")
    step_count = int(state.step)
    done = False

    for epoch in range(cfg.train.num_epochs):
        if done:
            break
        for batch in train_loader.epoch(epoch):
            b = put_batch(batch)
            state, m = train_step(model, cfg, state, b, rng)
            step_count = int(state.step)
            train_loss = float(m.loss)
            logger.log({
                "step": step_count, "epoch": epoch,
                "train_loss": train_loss,
                "SMI_loss": float(m.smi_loss),
                "FP_loss": float(m.fp_loss),
                "token_accuracy": float(m.token_accuracy),
                "grad_norm": float(m.grad_norm),
            })
            if manager is not None:
                manager.save(state, metrics={"loss": train_loss})
            if gen_metrics_every and step_count % gen_metrics_every == 0:
                gm = generation_metrics(model, cfg, state.params, b)
                logger.log({"step": step_count, **gm})
            if max_steps and step_count >= max_steps:
                done = True
                break

        if val_loader is not None:
            losses = []
            for batch in val_loader.epoch(epoch):
                b = put_batch(batch)
                vm = eval_step(model, cfg, state.params, b)
                losses.append(float(vm.loss))
            if losses:
                val_loss = float(np.mean(losses))
                logger.log({"step": step_count, "epoch": epoch, "val_loss": val_loss})

    if manager is not None:
        manager.wait()
        manager.close()
    return TrainResult(state, train_loss, val_loss, step_count, logger)


def generation_metrics(model, cfg: MMTConfig, params, batch) -> dict:
    """In-training greedy-generation metrics: validity / tanimoto of decoded
    SMILES vs targets (reference ``_generate_sequences`` inside
    training_step, `models_MMT_v15_4.py:1222-1297` + metric terms in
    calculate_total_loss)."""
    from ..decode import samplers

    enc = model.apply({"params": params}, batch.inputs, None, True)
    res = samplers.greedy_decode(
        params, cfg.model, enc.memory, enc.memory_key_padding_mask, 1.0, cfg.model.spectrum_points
    )
    gen = vocab.batch_ids_to_smiles(np.asarray(res.tokens))
    tgt = [vocab.ids_to_smiles(t[1:]) for t in np.asarray(batch.trg_tokens)]
    validity = chem.validity_fraction(gen)
    tanis = [chem.tanimoto(g, t) or 0.0 for g, t in zip(gen, tgt) if chem.is_valid(g)]
    return {
        "gen_validity": validity,
        "gen_tanimoto_mean": float(np.mean(tanis)) if tanis else 0.0,
        "gen_exact": float(np.mean([chem.exact_match(g, t) for g, t in zip(gen, tgt)])),
    }
