"""Q-Former / BLIP tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalspectraltransformer_tpu.rank import qformer
from multimodalspectraltransformer_tpu.rank.clip import CLIPConfig

QCFG = qformer.QFormerConfig(
    hidden=64, num_heads=4, ffn_dim=128, num_layers=4, num_queries=8,
    encoder_width=64, projection_dim=32, dropout=0.0,
)
TCFG = CLIPConfig(
    text_vocab_size=50, text_hidden=64, text_layers=2, text_heads=4,
    text_ffn=128, text_max_len=32, cb_embedding=64, projection_dim=32, dropout=0.0,
)


def _setup():
    model = qformer.BLIPRanker(QCFG, TCFG)
    rng = np.random.default_rng(0)
    B, S, T = 3, 20, 10
    tokens = jnp.asarray(rng.integers(1, 50, (B, T)))
    mask = jnp.ones((B, T), jnp.int32)
    memory = jnp.asarray(rng.normal(size=(B, S, 128)), jnp.float32)
    kpm = jnp.zeros((B, S), bool).at[0, 15:].set(True)
    variables = model.init(jax.random.PRNGKey(0), tokens, mask, memory, kpm, True)
    return model, variables, tokens, mask, memory, kpm


def test_blip_shapes_and_loss():
    model, variables, tokens, mask, memory, kpm = _setup()
    text, spec = model.apply(variables, tokens, mask, memory, kpm, True)
    assert text.shape == (3, 32) and spec.shape == (3, 32)
    out = qformer.blip_loss(text, spec, 1.0)
    assert np.isfinite(float(out.mean_loss))


def test_qformer_cross_attention_every_other_layer():
    model, variables, *_ = _setup()
    qp = variables["params"]["qformer"]
    assert "cross_attn" in qp["layers_0"]
    assert "cross_attn" not in qp["layers_1"]
    assert "cross_attn" in qp["layers_2"]
    assert qp["query_tokens"].shape == (8, 64)


def test_spectrum_embedding_depends_on_memory():
    model, variables, tokens, mask, memory, kpm = _setup()
    s1 = model.apply(variables, memory, kpm, True, method="embed_spectrum")
    s2 = model.apply(variables, memory + 1.0, kpm, True, method="embed_spectrum")
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    # masked memory positions don't affect the embedding
    mem_mod = memory.at[0, 16, :].set(99.0)  # masked position for row 0
    s3 = model.apply(variables, mem_mod, kpm, True, method="embed_spectrum")
    np.testing.assert_allclose(np.asarray(s1[0]), np.asarray(s3[0]), atol=1e-5)


def test_attention_map_capture():
    """Q-Former explainability: attention maps via mutable intermediates
    (reference save_attention, Qformer_v15_4.py:147-159)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalspectraltransformer_tpu.rank import qformer as qf

    cfg = qf.QFormerConfig(hidden=32, num_heads=2, ffn_dim=64, num_layers=2,
                           num_queries=4, encoder_width=32, projection_dim=16)
    model = qf.QFormer(cfg)
    memory = jnp.ones((2, 6, 32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, memory, None, True)
    maps = qf.attention_maps(variables, cfg, memory)
    assert set(maps) == {"layers_0", "layers_1"}
    # layer 0 has cross-attention (frequency 2); layer 1 does not
    assert maps["layers_0"]["cross"] is not None
    assert maps["layers_0"]["cross"].shape == (2, 2, 4, 6)
    assert maps["layers_1"]["cross"] is None
    s = np.asarray(maps["layers_0"]["cross"])
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-5)  # rows are softmaxed


def test_from_hf_bert_conversion():
    """bert-base-style weights load into the Q-Former's self-attn/FFN/norms
    and change its output (reference init_Qformer from bert-base-uncased)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformers import BertConfig, BertModel

    from multimodalspectraltransformer_tpu.rank import qformer as qf

    qcfg = qf.QFormerConfig(hidden=32, num_heads=2, ffn_dim=64, num_layers=2,
                            num_queries=4, encoder_width=32, projection_dim=16)
    bert = BertModel(BertConfig(hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=2, intermediate_size=64,
                                vocab_size=50, max_position_embeddings=16))
    overlay = qf.from_hf_bert(qcfg, bert.state_dict())
    model = qf.QFormer(qcfg)
    memory = jnp.ones((2, 5, 32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, memory, None, True)
    before = model.apply(variables, memory, None, True)
    merged = {"params": qf.merge_params(dict(variables["params"]), overlay)}
    after = model.apply(merged, memory, None, True)
    assert after.shape == before.shape
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # converted in_proj matches the concatenated q/k/v torch weights
    w = np.asarray(merged["params"]["layers_0"]["self_attn"]["in_proj_weight"])
    qw = bert.state_dict()["encoder.layer.0.attention.self.query.weight"].numpy()
    np.testing.assert_allclose(w[:32], qw)
