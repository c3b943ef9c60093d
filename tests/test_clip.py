"""CLIP stack tests: Roberta-tower parity vs transformers, projection-head
parity vs torch, loss semantics, candidate scoring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalspectraltransformer_tpu.rank import clip

SMALL = clip.CLIPConfig(
    text_vocab_size=50,
    text_hidden=64,
    text_layers=2,
    text_heads=4,
    text_ffn=128,
    text_max_len=32,
    cb_embedding=96,
    mt_embedding=48,
    projection_dim=40,
    dropout=0.0,
)


def test_roberta_tower_parity_with_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.RobertaConfig(
        vocab_size=SMALL.text_vocab_size,
        hidden_size=SMALL.text_hidden,
        num_hidden_layers=SMALL.text_layers,
        num_attention_heads=SMALL.text_heads,
        intermediate_size=SMALL.text_ffn,
        max_position_embeddings=SMALL.text_max_len + 2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.RobertaModel(hf_cfg, add_pooling_layer=True).eval()

    B, T = 3, 11
    rng = np.random.default_rng(0)
    tokens = rng.integers(2, SMALL.text_vocab_size, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[0, 7:] = 0
    tokens[0, 7:] = 0

    with torch.no_grad():
        out = hf(torch.tensor(tokens), attention_mask=torch.tensor(mask))
        ref = out.pooler_output.numpy()

    params = clip.from_hf_roberta(SMALL, hf.state_dict())
    model = clip.RobertaStyleEncoder(SMALL)
    ours = model.apply({"params": params}, jnp.asarray(tokens), jnp.asarray(mask), True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def test_projection_head_residual_shape():
    head = clip.ProjectionHead(projection_dim=40, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 96)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    y = head.apply(variables, x)
    assert y.shape == (5, 40)
    # LayerNorm output: per-row mean ~0
    np.testing.assert_allclose(np.asarray(y).mean(axis=1), 0.0, atol=1e-5)


def test_clip_loss_reference_semantics():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    cb = rng.normal(size=(6, 40)).astype(np.float32)
    mt = rng.normal(size=(6, 40)).astype(np.float32)
    T = 1.0

    # torch oracle implementing the documented reference formula
    # (`models_CLIP_v15_4.py:292-302`)
    cb_t, mt_t = torch.tensor(cb), torch.tensor(mt)
    logits = cb_t @ mt_t.T / T
    targets = F.softmax((mt_t @ mt_t.T + cb_t @ cb_t.T) / 2 * T, dim=-1)
    tl = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
    il = (-targets.T * F.log_softmax(logits.T, dim=-1)).sum(1)
    ref = ((tl + il) / 2).mean().item()

    out = clip.clip_loss(jnp.asarray(cb), jnp.asarray(mt), T)
    assert float(out.mean_loss) == pytest.approx(ref, abs=1e-5)
    assert out.per_sample_loss.shape == (6,)


def test_clip_loss_prefers_aligned_embeddings():
    rng = np.random.default_rng(3)
    e = rng.normal(size=(8, 16)).astype(np.float32)
    aligned = clip.clip_loss(jnp.asarray(e * 3), jnp.asarray(e * 3)).mean_loss
    shuffled = clip.clip_loss(jnp.asarray(e * 3), jnp.asarray(np.roll(e, 1, axis=0) * 3)).mean_loss
    assert float(aligned) < float(shuffled)


def test_score_candidates():
    model = clip.CLIPRanker(SMALL)
    C, T = 4, 12
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(1, 50, (C, T)))
    mask = jnp.ones((C, T), jnp.int32)
    fp = jnp.asarray(rng.normal(size=(SMALL.mt_embedding,)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), tokens, mask, jnp.tile(fp[None], (C, 1)), True)
    out = clip.score_candidates(variables, SMALL, tokens, mask, fp)
    assert out.losses.shape == (C,)
    assert out.dot_similarity.shape == (C,)
    assert np.isfinite(np.asarray(out.dot_similarity)).all()


def test_score_candidates_batch_matches_per_molecule():
    """One batched call over M molecules == M separate score_candidates
    calls (each molecule keeps its own CxC contrastive block)."""
    model = clip.CLIPRanker(SMALL)
    M, C, T = 3, 4, 12
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(1, 50, (M, C, T)))
    mask = jnp.ones((M, C, T), jnp.int32)
    fps = jnp.asarray(rng.normal(size=(M, SMALL.mt_embedding)), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), tokens[0], mask[0], jnp.tile(fps[0][None], (C, 1)), True
    )
    batched = clip.score_candidates_batch(variables, SMALL, tokens, mask, fps)
    assert batched.losses.shape == (M, C)
    for m in range(M):
        single = clip.score_candidates(variables, SMALL, tokens[m], mask[m], fps[m])
        np.testing.assert_allclose(np.asarray(batched.losses[m]), np.asarray(single.losses), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(batched.dot_similarity[m]), np.asarray(single.dot_similarity), rtol=2e-5, atol=2e-5
        )


def test_from_torch_clip_conversion():
    """Reference CLIPModel checkpoint layout loads into CLIPRanker and the
    converted projection heads reproduce torch outputs."""
    import numpy as np
    import torch
    import torch.nn as torch_nn

    from multimodalspectraltransformer_tpu.rank import clip as clip_mod

    cfg = clip_mod.CLIPConfig(text_layers=1, text_heads=2, text_hidden=16,
                              text_ffn=32, cb_embedding=8, projection_dim=4,
                              text_vocab_size=20, text_max_len=12, dropout=0.0)

    # build a torch state dict with the reference's key layout
    class TorchHead(torch_nn.Module):
        def __init__(self, emb, proj):
            super().__init__()
            self.projection = torch_nn.Linear(emb, proj)
            self.fc = torch_nn.Linear(proj, proj)
            self.layer_norm = torch_nn.LayerNorm(proj)

        def forward(self, x):
            p = self.projection(x)
            y = self.fc(torch_nn.functional.gelu(p))
            return self.layer_norm(y + p)

    torch.manual_seed(0)
    cb_head = TorchHead(8, 4)
    mt_head = TorchHead(512, 4)
    sd = {}
    for name, mod in (("CB_projection", cb_head), ("MT_projection", mt_head)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    # minimal roberta + LL1 keys
    from transformers import RobertaConfig, RobertaModel

    rb = RobertaModel(RobertaConfig(hidden_size=16, num_hidden_layers=1,
                                    num_attention_heads=2, intermediate_size=32,
                                    vocab_size=20, max_position_embeddings=14))
    for k, v in rb.state_dict().items():
        sd[f"CB_model.chemberta.{k}"] = v
    ll1 = torch_nn.Linear(16, 8)
    sd["CB_model.LL1.weight"] = ll1.weight
    sd["CB_model.LL1.bias"] = ll1.bias

    params = clip_mod.from_torch_clip(cfg, sd)

    # converted MT head == torch head on a random spectrum fingerprint
    import jax

    x = np.random.RandomState(0).randn(3, 512).astype(np.float32)
    model = clip_mod.ProjectionHead(cfg.projection_dim, dropout=0.0)
    out = model.apply({"params": params["MT_projection"]}, x, True)
    ref = mt_head(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
