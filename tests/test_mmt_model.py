"""Shape/behavior tests for the full MultimodalTransformer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.utils.config import ModalityConfig, ModelConfig

SMALL = ModelConfig(
    num_encoder_layers=2,
    num_decoder_layers=2,
    ffn_dim=256,
)


def test_fused_layout_constants():
    cfg = ModelConfig()
    assert cfg.nmr_seq_len == 129
    assert cfg.ir_seq_len == 66
    assert cfg.fused_len() == 129 * 4 + 66  # 582
    ms = ModelConfig(modalities=ModalityConfig(use_ms=True))
    assert ms.nmr_seq_len == 193
    assert ms.ir_seq_len == 130
    # blank-COSY parity quirk (`models_MMT_v15_4.py:912`)
    assert cfg.cosy_blank_len == 65
    assert ModelConfig(parity_cosy_blank_65=False).cosy_blank_len == 129


def test_forward_shapes():
    cfg = SMALL
    model = mmt.MultimodalTransformer(cfg)
    batch = mmt.dummy_batch(cfg, batch_size=2)
    trg = jnp.zeros((2, 63), dtype=jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, trg, True)
    logits, fp, memory, kpm = model.apply(variables, batch, trg, True)
    assert logits.shape == (2, 63, cfg.smiles_vocab_size)
    assert fp.shape == (2, cfg.fingerprint_size)
    assert memory.shape == (2, cfg.fused_len(), cfg.hidden_size)
    assert kpm.shape == (2, cfg.fused_len())
    assert np.isfinite(np.asarray(logits)).all()


def test_encoder_only_output():
    cfg = SMALL
    model = mmt.MultimodalTransformer(cfg)
    batch = mmt.dummy_batch(cfg, batch_size=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, jnp.zeros((2, 4), jnp.int32), True)
    enc = model.apply(variables, batch, None, True)
    assert isinstance(enc, mmt.EncoderOutput)
    assert enc.memory.shape == (2, cfg.fused_len(), cfg.hidden_size)


def test_inactive_modality_blank_blocks():
    """Statically-inactive COSY produces a 65-token fully-masked zero block
    (parity mode) and the fused length shrinks accordingly."""
    cfg = ModelConfig(
        num_encoder_layers=1,
        num_decoder_layers=1,
        ffn_dim=64,
        modalities=ModalityConfig(use_cosy=False),
    )
    model = mmt.MultimodalTransformer(cfg)
    batch = mmt.dummy_batch(cfg, batch_size=1)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, jnp.zeros((1, 4), jnp.int32), True)
    enc = model.apply(variables, batch, None, True)
    expected = 129 * 3 + 65 + 66
    assert enc.memory.shape[1] == expected
    # the COSY block's key-padding mask is all True (masked)
    kpm = np.asarray(enc.memory_key_padding_mask)
    cosy_block = kpm[:, 129 * 3 : 129 * 3 + 65]
    assert cosy_block.all()


def test_stacked_encoder_param_shape():
    cfg = SMALL
    params = mmt.init_params(cfg, jax.random.PRNGKey(0))
    w = params["modality_encoders"]["layers_0"]["self_attn"]["in_proj_weight"]
    assert w.shape == (5, 3 * cfg.hidden_size, cfg.hidden_size)


def test_modality_sensitivity():
    """Changing one modality's input changes the output; per-sample blanked
    (all-masked) modalities do not."""
    cfg = SMALL
    model = mmt.MultimodalTransformer(cfg)
    b0 = mmt.dummy_batch(cfg, batch_size=1)
    variables = model.init({"params": jax.random.PRNGKey(0)}, b0, jnp.zeros((1, 4), jnp.int32), True)

    enc0 = model.apply(variables, b0, None, True)
    b1 = b0._replace(src_1h=b0.src_1h + 0.5)
    enc1 = model.apply(variables, b1, None, True)
    assert not np.allclose(np.asarray(enc0.memory), np.asarray(enc1.memory))

    # with mask all-pad on 1H, perturbing 1H spectrum values still changes
    # the 1H block itself (embeddings pass through) but NOT other blocks'
    # attention results... the fused encoder sees the 1H embeddings only
    # through masked positions, so other blocks must be unaffected.
    mask_all = jnp.ones_like(b0.mask_1h)
    b2 = b0._replace(mask_1h=mask_all)
    b3 = b1._replace(mask_1h=mask_all)
    enc2 = model.apply(variables, b2, None, True)
    enc3 = model.apply(variables, b3, None, True)
    m2 = np.asarray(enc2.memory)[:, 129:, :]
    m3 = np.asarray(enc3.memory)[:, 129:, :]
    np.testing.assert_allclose(m2, m3, atol=1e-6)
