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
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

from ..chem import api as chem

if TYPE_CHECKING:  # type-only: data.pipeline imports train.step (cycle)
    from ..data.pipeline import Loader
from ..models import mmt
from ..parallel import batch_sharding, param_shardings
from ..utils import vocab
from ..utils.config import MMTConfig
from . import checkpoint as ckpt_mod
from .state import TrainState, create_state, update_plateau
from .step import blank_modalities_device, eval_step, train_step


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


class _PrefetchError:
    """Carrier for a worker-thread exception (batches are NamedTuples, so a
    wrapper class keeps the sentinel unambiguous)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _prefetch(iterator, put_batch, depth: int = 2):
    """Device-put batches `depth` ahead on a worker thread so host->device
    transfer (slow on remote backends) overlaps the previous step.

    Worker exceptions are re-raised in the consumer (a silently-dying
    worker would otherwise truncate the epoch as if it completed), and
    abandoning the generator (e.g. max_steps break) unblocks and stops the
    worker instead of leaking a thread parked on a full queue."""
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
    END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(put_batch(item)):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            _put(_PrefetchError(e))
            return
        _put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is END:
                return
            if isinstance(item, _PrefetchError):
                raise item.exc
            yield item
    finally:
        stop.set()


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
    log_every: int = 1,  # metrics materialization cadence: every float()
    # forces a device sync (a full RPC round trip on remote backends)
    device_data: Optional[bool] = None,  # None = auto (single-device, no
    # augmentation, dataset fits): park the featurized dataset in HBM once
    # and assemble batches with an on-device gather — removes the per-step
    # host->device batch upload from the critical path entirely
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

    dd = None
    gather = None
    n_shards = 1
    if device_data or device_data is None:
        if mesh is None and hasattr(train_loader, "device_dataset"):
            dd = train_loader.device_dataset()
        elif mesh is not None and hasattr(train_loader, "device_dataset_sharded"):
            # multi-device fast path: corpus partitioned row-wise over the
            # mesh's data axes, batches assembled by shard-LOCAL gathers
            # (data/pipeline.sharded_gather_fn — zero collectives); keeps
            # the ~8x data-path win the host loader loses
            from .. import parallel as par_mod
            from ..data import pipeline as dp_mod

            n_shards = par_mod.data_extent(mesh)
            if train_loader.batch_size % n_shards == 0:
                dd = train_loader.device_dataset_sharded(mesh)
                if dd is not None:
                    gather = dp_mod.sharded_gather_fn(mesh)
            else:
                print(
                    f"run_training: batch {train_loader.batch_size} not divisible "
                    f"by {n_shards} data shards; host loader"
                )

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

    # a restored run continues the epoch sequence instead of replaying
    # epoch 0's exact batch order. This is a shuffle-phase heuristic only
    # (len() can under/over-estimate actual batches per epoch when records
    # fail featurization or drop_remainder=False): every epoch index is a
    # different permutation of the same corpus, so an off-by-some estimate
    # shifts which permutations get used, never which data. Clamped so a
    # resume can never skip past every epoch and silently train 0 steps.
    start_epoch = step_count // max(1, len(train_loader)) if step_count else 0
    start_epoch = min(start_epoch, max(0, cfg.train.num_epochs - 1))
    if max_steps and step_count >= max_steps:
        done = True  # restored at/over budget: don't train a bonus step

    try:
        for epoch in range(start_epoch, cfg.train.num_epochs):
            if done:
                break
            if dd is not None and gather is not None:
                bsh = batch_sharding(mesh)
                batch_iter = (
                    gather(dd, jax.device_put(jnp.asarray(idx), bsh))
                    for idx in train_loader.epoch_row_batches_sharded(epoch, n_shards)
                )
            elif dd is not None:
                from ..data import pipeline as dp_mod

                batch_iter = (
                    dp_mod.gather_rows(dd, jnp.asarray(idx))
                    for idx in train_loader.epoch_row_batches(epoch)
                )
            else:
                batch_iter = _prefetch(train_loader.epoch(epoch), put_batch)
            last_m = None
            for b in batch_iter:
                if cfg.train.warp_1h_ppm > 0 or cfg.train.warp_13c_ppm > 0:
                    from .step import warp_spectra_device

                    b = warp_spectra_device(
                        b,
                        jax.random.fold_in(jax.random.fold_in(rng, 0x3A7B), step_count),
                        cfg.train.warp_1h_ppm, cfg.train.warp_13c_ppm,
                        cfg.train.jitter_gate_p,
                    )
                if cfg.train.jitter_1h_ppm > 0 or cfg.train.jitter_13c_ppm > 0:
                    from .step import jitter_spectra_device

                    b = jitter_spectra_device(
                        b,
                        jax.random.fold_in(jax.random.fold_in(rng, 0x7E77), step_count),
                        cfg.train.jitter_1h_ppm, cfg.train.jitter_13c_ppm,
                        cfg.train.jitter_gate_p,
                    )
                if cfg.train.blank_percentage > 0:
                    # stochastic modality blanking as a device op (keeps the
                    # deterministic HBM-resident dataset path)
                    b = blank_modalities_device(
                        b,
                        jax.random.fold_in(jax.random.fold_in(rng, 0x5BD1), step_count),
                        cfg.train.blank_percentage,
                    )
                state, m = train_step(model, cfg, state, b, rng)
                last_m = m
                step_count += 1
                if step_count % log_every == 0:
                    train_loss = float(m.loss)
                    logger.log({
                        "step": step_count, "epoch": epoch,
                        "train_loss": train_loss,
                        "SMI_loss": float(m.smi_loss),
                        "FP_loss": float(m.fp_loss),
                        "token_accuracy": float(m.token_accuracy),
                        "grad_norm": float(m.grad_norm),
                    })
                if manager is not None and manager.should_save(step_count):
                    # metrics carry the CURRENT loss (a device sync — only
                    # paid on steps that actually save)
                    manager.save(state, metrics={"loss": float(m.loss)})
                if gen_metrics_every and step_count % gen_metrics_every == 0:
                    gm = generation_metrics(model, cfg, state.params, b, step_count)
                    logger.log({"step": step_count, **gm})
                if max_steps and step_count >= max_steps:
                    done = True
                    break

            # epoch-cadence LR plateau step (torch scheduler.step(loss)):
            # materialize the CURRENT epoch-end loss (one device sync per
            # epoch) instead of the up-to-log_every-stale logged value
            if last_m is not None:
                train_loss = float(last_m.loss)
            if np.isfinite(train_loss):
                state = update_plateau(cfg.train, state, train_loss)

            if val_loader is not None:
                losses = []
                for batch in val_loader.epoch(epoch):
                    b = put_batch(batch)
                    vm = eval_step(model, cfg, state.params, b)
                    losses.append(float(vm.loss))
                if losses:
                    val_loss = float(np.mean(losses))
                    logger.log({"step": step_count, "epoch": epoch, "val_loss": val_loss})
    except Exception:
        # the reference's last-resort backup on any training exception
        # (`MT_functions_v15_4.py:138-158` saves last_backup_checkpoint.ckpt)
        if checkpoint_dir:
            backup = os.path.join(checkpoint_dir, "last_backup_params.msgpack")
            try:
                ckpt_mod.export_params_msgpack(state.params, backup)
                print(f"run_training: crash backup saved to {backup}")
            except Exception as be:  # e.g. donated buffers from the failing step
                print(f"run_training: crash backup FAILED ({be!r}) — no {backup}")
        raise

    if manager is not None:
        manager.wait()
        manager.close()
    return TrainResult(state, train_loss, val_loss, step_count, logger)


def anneal_weights(step: int, cfg: MMTConfig) -> tuple[float, float]:
    """Loss-weight annealing (reference ``change_loss_weights``,
    `models_MMT_v15_4.py:254-262`): every ``batch_frequency`` steps
    weight_MW grows by increment*100 (cap 100) and weight_sgnn by
    increment*10 (cap 10). Returns (weight_mw, weight_sgnn) at ``step``."""
    t = cfg.train
    if not t.change_loss_weights:
        return t.weight_mw, t.weight_sgnn
    bumps = step // max(t.batch_frequency, 1)
    w_mw = min(100.0, t.weight_mw + bumps * t.increment * 100)
    w_sgnn = min(10.0, t.weight_sgnn + bumps * t.increment * 10)
    return w_mw, w_sgnn


def generation_metrics(model, cfg: MMTConfig, params, batch, step: int = 0) -> dict:
    """In-training generation metrics + the reference's gradient-free
    auxiliary loss terms (reference ``_generate_sequences`` inside
    training_step `models_MMT_v15_4.py:1222-1297` and the scalar terms of
    ``calculate_total_loss`` `:263-355`: min-max-normalized MW MSE over
    valid generations, optional SGNN spectral-similarity feedback,
    (1 - tanimoto) and (1 - validity) terms — all of which the reference
    adds to the loss as Python floats, i.e. no gradient flows through them)."""
    from ..decode import samplers
    from ..eval.harness import _encode_batch

    # jitted: un-jitted full-model apply dispatches per-op through the TPU
    # tunnel (~32 ms/op — minutes per call)
    enc = _encode_batch(model, params, batch.inputs)
    res = samplers.greedy_decode(
        params, cfg.model, enc.memory, enc.memory_key_padding_mask, 1.0, cfg.model.spectrum_points
    )
    gen = vocab.batch_ids_to_smiles(np.asarray(res.tokens))
    tgt = [vocab.ids_to_smiles(t[1:]) for t in np.asarray(batch.trg_tokens)]
    valid_mask = chem.batch_is_valid(gen)
    validity = float(np.mean(valid_mask)) if len(gen) else 0.0
    tanis = [chem.tanimoto(g, t) or 0.0 for g, t, ok in zip(gen, tgt, valid_mask) if ok]
    tanimoto_mean = float(np.mean(tanis)) if tanis else 0.0

    # MW MSE over the valid generations (reference
    # calculate_tanimoto_and_mol_weights + min-max normalization `:283-295`)
    gen_w = chem.batch_exact_mol_wt([g for g, ok in zip(gen, valid_mask) if ok])
    trg_w = chem.batch_exact_mol_wt([t for t, ok in zip(tgt, valid_mask) if ok])
    pair_ok = ~(np.isnan(gen_w) | np.isnan(trg_w))
    mw_loss = 0.0
    if pair_ok.any():
        gw, tw = gen_w[pair_ok], trg_w[pair_ok]
        lo = min(gw.min(), cfg.train.train_weight_min if cfg.train.train_weight_min is not None else gw.min())
        hi = max(gw.max(), cfg.train.train_weight_max if cfg.train.train_weight_max is not None else gw.max())
        span = max(hi - lo, 1e-9)
        mw_loss = float(np.mean(((gw - lo) / span - (tw - lo) / span) ** 2))

    sgnn_error = float("nan")
    if cfg.train.sgnn_feedback:
        sgnn_error = spectral_feedback_error(gen, batch, valid_mask)

    w_mw, w_sgnn = anneal_weights(step, cfg)
    aux_total = (
        w_mw * mw_loss
        + (w_sgnn * sgnn_error if np.isfinite(sgnn_error) else 0.0)
        + cfg.train.weight_tanimoto * (1.0 - tanimoto_mean)
        + cfg.train.weight_validity * (1.0 - validity)
    )
    return {
        "gen_validity": validity,
        "gen_tanimoto_mean": tanimoto_mean,
        "gen_exact": float(np.mean([chem.exact_match(g, t) for g, t in zip(gen, tgt)])),
        "MW_loss": mw_loss,
        "sgnn_sim_error": sgnn_error,
        "weight_MW": w_mw,
        "weight_sgnn": w_sgnn,
        "aux_loss_total": float(aux_total),
    }


def spectral_feedback_error(gen: list[str], batch, valid_mask) -> float:
    """SGNN feedback term: simulate HSQC for the *generated* molecules and
    score them against the batch's input HSQC peaks (reference
    ``run_sgnn_sim_calculations_if_possible_2D``, `models_MMT_v15_4.py:
    113-197`; HSQC un-normalization H*10 / C*200 at `:315-318`)."""
    from ..rank import matching
    from ..sim import factory as sim_factory

    src_hsqc = np.asarray(batch.inputs.src_hsqc)  # [B, P, 2] normalized (H/10, C/200)
    idxs = [i for i, (g, ok) in enumerate(zip(gen, valid_mask)) if ok]
    if not idxs:
        return float("nan")
    # ONE batched factory call for every valid generation (a per-molecule
    # loop pays a padded GNN forward each) — and no IR: only hsqc is read
    recs = sim_factory.simulate_records(
        [gen[i] for i in idxs], sample_ids=[str(i) for i in idxs], with_ir=False
    )
    by_id = {r.sample_id: r for r in recs}
    errors = []
    for i in idxs:
        rec = by_id.get(str(i))
        if rec is None or not rec.hsqc:
            continue
        sim_peaks = np.asarray(rec.hsqc, dtype=np.float64)  # [(H, C)]
        live = ~(src_hsqc[i] == 0).all(axis=1)
        if not live.any():
            continue
        query = np.stack([src_hsqc[i][live, 0] * 10.0, src_hsqc[i][live, 1] * 200.0], axis=1)
        err = matching.spectral_error(query, sim_peaks, mode="hung_dist_nn", error="avg")
        if np.isfinite(err):
            errors.append(err)
    return float(np.mean(errors)) if errors else float("nan")
