"""Checkpoint/resume exactness + the training-loop driver."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
from multimodalspectraltransformer_tpu.train import create_state, train_step
from multimodalspectraltransformer_tpu.train.loop import MetricsLogger, run_training
from multimodalspectraltransformer_tpu.utils.config import MMTConfig, ModelConfig, TrainConfig

MCFG = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=128)
CFG = MMTConfig(model=MCFG, train=TrainConfig(learning_rate=1e-3, num_epochs=1, save_interval_steps=1))


def _batch(batch=4, seed=0):
    recs = dp.synthetic_dataset(batch, seed=seed)
    feats = [dp.featurize(r, MCFG) for r in recs]
    return dp.collate([f for f in feats if f is not None])


def test_checkpoint_resume_exact(tmp_path):
    model = mmt.MultimodalTransformer(MCFG)
    b = jax.tree.map(jnp.asarray, _batch())
    params = mmt.init_params(MCFG, jax.random.PRNGKey(0))
    state = create_state(CFG.train, params)
    rng = jax.random.PRNGKey(1)

    mgr = ckpt.CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for _ in range(3):
        state, _ = train_step(model, CFG, state, b, rng)
    mgr.save(state)
    mgr.wait()

    # continue 2 more steps from live state
    cont = state
    for _ in range(2):
        cont, m_live = train_step(model, CFG, cont, b, rng)

    # restore and continue 2 steps -> must match exactly
    template = create_state(CFG.train, mmt.init_params(MCFG, jax.random.PRNGKey(0)))
    restored = mgr.restore(template)
    assert restored is not None and int(restored.step) == 3
    for _ in range(2):
        restored, m_rest = train_step(model, CFG, restored, b, rng)

    assert float(m_live.loss) == float(m_rest.loss)
    for a, c in zip(jax.tree.leaves(cont.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    mgr.close()


def test_params_msgpack_round_trip(tmp_path):
    params = mmt.init_params(MCFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "params.msgpack")
    ckpt.export_params_msgpack(params, path)
    loaded = ckpt.import_params_msgpack(params, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_msgpack_bf16_gz_round_trip(tmp_path):
    """Repo-committable artifact: bf16-cast + gzipped export restores into
    an f32 template with only bf16 quantization error, and transparently
    (same import call as the plain path)."""
    import jax.numpy as jnp

    params = mmt.init_params(MCFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "params.msgpack.gz")
    ckpt.export_params_msgpack(params, path, dtype=jnp.bfloat16)
    loaded = ckpt.import_params_msgpack(params, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == a.dtype
        np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32), rtol=8e-3, atol=1e-6
        )


def test_run_training_smoke(tmp_path):
    recs = dp.synthetic_dataset(16, seed=3)
    loader = dp.Loader(recs, MCFG, batch_size=8, seed=0)
    val_loader = dp.Loader(recs[:8], MCFG, batch_size=8, seed=0)
    cfg = MMTConfig(model=MCFG, train=TrainConfig(learning_rate=1e-3, num_epochs=5, save_interval_steps=1))
    result = run_training(
        cfg,
        loader,
        val_loader=val_loader,
        metrics_path=str(tmp_path / "metrics.jsonl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_steps=3,
    )
    assert result.steps == 3
    assert np.isfinite(result.train_loss)
    assert np.isfinite(result.val_loss)
    # metrics JSONL written
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) >= 3
    import json

    rec = json.loads(lines[0])
    assert {"step", "train_loss", "SMI_loss", "token_accuracy"} <= set(rec)
    # resume picks up the checkpoint
    result2 = run_training(
        cfg, loader, checkpoint_dir=str(tmp_path / "ckpt"), max_steps=4
    )
    assert result2.steps == 4  # resumed from 3, ran 1 more


def test_metrics_logger_history():
    log = MetricsLogger(None)
    log.log({"step": 1, "x": jnp.asarray(2.5)})
    assert log.history[0]["x"] == 2.5


def test_anneal_weights_schedule():
    """change_loss_weights annealing (reference models_MMT_v15_4.py:254-262)."""
    from multimodalspectraltransformer_tpu.train.loop import anneal_weights
    from multimodalspectraltransformer_tpu.utils.config import MMTConfig, ModelConfig, TrainConfig

    cfg = MMTConfig(
        model=ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64),
        train=TrainConfig(change_loss_weights=True, batch_frequency=10, increment=0.01,
                          weight_mw=0.0, weight_sgnn=0.0),
    )
    assert anneal_weights(0, cfg) == (0.0, 0.0)
    w_mw, w_sgnn = anneal_weights(10, cfg)
    assert abs(w_mw - 1.0) < 1e-9 and abs(w_sgnn - 0.1) < 1e-9
    w_mw, w_sgnn = anneal_weights(10_000_000, cfg)
    assert w_mw == 100.0 and w_sgnn == 10.0  # caps
    # disabled -> static
    cfg2 = MMTConfig(model=cfg.model, train=TrainConfig(change_loss_weights=False, weight_mw=2.0))
    assert anneal_weights(999, cfg2) == (2.0, 0.0)


def test_generation_metrics_aux_terms():
    """MW MSE + tanimoto/validity aux terms over a real tiny batch."""
    import jax
    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu.data import pipeline as dp
    from multimodalspectraltransformer_tpu.models import mmt as mmt_mod
    from multimodalspectraltransformer_tpu.train.loop import generation_metrics
    from multimodalspectraltransformer_tpu.utils.config import MMTConfig, ModelConfig, TrainConfig

    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    cfg = MMTConfig(model=mcfg, train=TrainConfig(weight_tanimoto=1.0, weight_validity=1.0,
                                                  sgnn_feedback=True))
    records = dp.synthetic_dataset(4, seed=1)
    loader = dp.Loader(records, mcfg, batch_size=4)
    batch = next(iter(loader.epoch(0)))
    model = mmt_mod.MultimodalTransformer(mcfg)
    params = mmt_mod.init_params(mcfg, jax.random.PRNGKey(0))
    b = jax.tree.map(jnp.asarray, batch)
    gm = generation_metrics(model, cfg, params, b, step=0)
    for key in ("gen_validity", "gen_tanimoto_mean", "MW_loss", "aux_loss_total",
                "weight_MW", "weight_sgnn", "sgnn_sim_error"):
        assert key in gm
    assert 0.0 <= gm["gen_validity"] <= 1.0
    assert gm["aux_loss_total"] >= 0.0


def test_prefetch_propagates_worker_exception():
    """A loader/device-put error on the prefetch worker must re-raise in
    the consumer, not silently end the epoch (review regression)."""
    from multimodalspectraltransformer_tpu.train.loop import _prefetch

    def bad_iter():
        yield 1
        yield 2
        raise RuntimeError("loader exploded")

    got = []
    with pytest.raises(RuntimeError, match="loader exploded"):
        for item in _prefetch(bad_iter(), lambda x: x * 10):
            got.append(item)
    assert got == [10, 20]


def test_prefetch_abandonment_stops_worker():
    """Breaking out of the consumer (max_steps) must unblock and stop the
    worker thread instead of leaking it on a full queue."""
    import threading
    import time as time_mod

    from multimodalspectraltransformer_tpu.train.loop import _prefetch

    produced = []

    def slow_iter():
        for i in range(1000):
            produced.append(i)
            yield i

    gen = _prefetch(slow_iter(), lambda x: x, depth=2)
    assert next(gen) == 0
    n_before = threading.active_count()
    gen.close()  # abandon: triggers the generator's finally -> stop event
    deadline = time_mod.time() + 5.0
    while threading.active_count() > n_before - 1 and time_mod.time() < deadline:
        time_mod.sleep(0.05)
    # worker stopped well short of the 1000-item iterator
    assert len(produced) < 50
