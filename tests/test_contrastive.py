"""CLIP/BLIP contrastive training loops (train/contrastive.py; reference
run_CLIP `clip_functions_v15_4.py:331` / run_BLIP `blip_functions_v15_4.py:375`)."""

from __future__ import annotations

import numpy as np
import pytest

from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.rank import clip as clip_mod
from multimodalspectraltransformer_tpu.rank import qformer as qformer_mod
from multimodalspectraltransformer_tpu.train import contrastive
from multimodalspectraltransformer_tpu.utils.config import MMTConfig, ModelConfig

import jax

TINY_MODEL = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
TINY_CLIP = clip_mod.CLIPConfig(text_layers=1, text_heads=2, cb_embedding=32,
                                text_hidden=32, text_ffn=64, projection_dim=16)


def _setup(n=12):
    cfg = MMTConfig(model=TINY_MODEL)
    records = dp.synthetic_dataset(n, seed=0)
    params = mmt.init_params(cfg.model, jax.random.PRNGKey(0))
    return cfg, records, params


def test_clip_training_decreases_loss(tmp_path):
    cfg, records, params = _setup()
    ccfg = contrastive.ContrastiveConfig(num_epochs=6, batch_size=6, learning_rate=3e-4)
    variables, logger = contrastive.train_contrastive(
        cfg, params, records, tower="clip", ccfg=ccfg, tower_cfg=TINY_CLIP,
        checkpoint_path=str(tmp_path / "clip.msgpack"),
    )
    losses = [r["clip_loss"] for r in logger.history if "clip_loss" in r]
    assert len(losses) >= 6
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses
    assert (tmp_path / "clip.msgpack").exists()
    # trained variables score candidates end-to-end
    toks, mask = contrastive.clip_tokenize(["CCO", "c1ccccc1"], 64)
    import jax.numpy as jnp

    fp = jnp.zeros((512,), jnp.float32)
    out = clip_mod.score_candidates(variables, TINY_CLIP, jnp.asarray(toks), jnp.asarray(mask), fp)
    assert out.losses.shape == (2,) and np.isfinite(np.asarray(out.losses)).all()


def test_blip_training_smoke():
    cfg, records, params = _setup(8)
    tiny_q = qformer_mod.QFormerConfig(
        hidden=32, num_heads=2, ffn_dim=64, num_layers=2, num_queries=4,
        encoder_width=32, projection_dim=16,
    )
    ccfg = contrastive.ContrastiveConfig(num_epochs=1, batch_size=4, max_steps=2)
    variables, logger = contrastive.train_contrastive(
        cfg, params, records, tower="blip", ccfg=ccfg, tower_cfg=tiny_q,
    )
    losses = [r["blip_loss"] for r in logger.history if "blip_loss" in r]
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_backup_checkpoint_on_failure(tmp_path):
    cfg, records, params = _setup(8)

    # poison the in-loop metrics logger so the SECOND step raises
    # mid-training (the encode is fused into the jitted step now, so the
    # per-batch Python-level hook is the logger at log_every=1)
    class Boom(Exception):
        pass

    ccfg = contrastive.ContrastiveConfig(num_epochs=1, batch_size=4, log_every=1)
    orig = contrastive.MetricsLogger
    calls = {"n": 0}

    class ExplodingLogger(orig):
        def log(self, metrics):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise Boom()
            return super().log(metrics)

    contrastive.MetricsLogger = ExplodingLogger
    try:
        with pytest.raises(Boom):
            contrastive.train_contrastive(
                cfg, params, records, tower="clip", ccfg=ccfg, tower_cfg=TINY_CLIP,
                checkpoint_path=str(tmp_path / "c.msgpack"),
            )
    finally:
        contrastive.MetricsLogger = orig
    assert (tmp_path / "c.msgpack.backup.msgpack").exists()


def test_snapshot_resume_continues_from_step(tmp_path):
    """Periodic .state snapshot + resume (guarded-driver retry path): a
    second train_contrastive call with a higher max_steps must continue
    from the snapshot's step, not restart from 0."""
    cfg, records, params = _setup()
    ck = str(tmp_path / "clip.msgpack")
    ccfg = contrastive.ContrastiveConfig(
        num_epochs=50, batch_size=6, max_steps=4, save_every=2, log_every=1)
    contrastive.train_contrastive(
        cfg, params, records, tower="clip", ccfg=ccfg, tower_cfg=TINY_CLIP,
        checkpoint_path=ck,
    )
    assert (tmp_path / "clip.msgpack.state").exists()
    ccfg2 = contrastive.ContrastiveConfig(
        num_epochs=50, batch_size=6, max_steps=7, save_every=2, log_every=1)
    _, logger = contrastive.train_contrastive(
        cfg, params, records, tower="clip", ccfg=ccfg2, tower_cfg=TINY_CLIP,
        checkpoint_path=ck,
    )
    steps = [r["step"] for r in logger.history if "clip_loss" in r]
    assert steps == [5, 6, 7], steps  # resumed at 4, ran 3 more

    # resuming past the target trains zero steps but still exports
    _, logger3 = contrastive.train_contrastive(
        cfg, params, records, tower="clip",
        ccfg=contrastive.ContrastiveConfig(
            num_epochs=50, batch_size=6, max_steps=5, save_every=2),
        checkpoint_path=ck, tower_cfg=TINY_CLIP,
    )
    assert not [r for r in logger3.history if "clip_loss" in r]
