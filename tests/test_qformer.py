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
    variables = model.init({"params": jax.random.PRNGKey(0)}, memory, None, deterministic=True)
    maps = qf.attention_maps(variables, cfg, memory)
    assert set(maps) == {"layers_0", "layers_1"}
    # layer 0 has cross-attention (frequency 2); layer 1 does not
    assert maps["layers_0"]["cross"] is not None
    assert maps["layers_0"]["cross"].shape == (2, 2, 4, 6)
    assert maps["layers_1"]["cross"] is None
    s = np.asarray(maps["layers_0"]["cross"])
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-5)  # rows are softmaxed


LMCFG = qformer.QFormerConfig(
    hidden=64, num_heads=4, ffn_dim=128, num_layers=4, num_queries=8,
    encoder_width=64, projection_dim=32, dropout=0.0, vocab_size=43,
    max_text_len=12,
)


def _setup_lm():
    model = qformer.BLIPRanker(LMCFG, TCFG)
    rng = np.random.default_rng(1)
    B, S, T = 2, 14, 8
    tokens = jnp.asarray(rng.integers(4, 43, (B, T)))
    att = jnp.ones((B, T), jnp.int32)
    memory = jnp.asarray(rng.normal(size=(B, S, 128)), jnp.float32)
    kpm = jnp.zeros((B, S), bool).at[1, 10:].set(True)
    variables = model.init(jax.random.PRNGKey(2), tokens, att, memory, kpm, method="init_all")
    return model, variables, tokens, att, memory, kpm


def test_itm_and_lm_heads():
    """LAVIS BertLMHeadModel surface (Qformer_v15_4.py:967-1131): ITM 2-way
    match logits over jointly encoded [queries; text], LM next-token logits
    for causal text over the query prefix."""
    model, variables, tokens, att, memory, kpm = _setup_lm()
    pad = 1 - att
    itm = model.apply(variables, tokens, pad, memory, kpm, method="itm_logits")
    assert itm.shape == (2, 2)
    lm = model.apply(variables, tokens, pad, memory, kpm, method="lm_logits")
    assert lm.shape == (2, 8, 43)
    loss_itm = qformer.itm_loss(itm, jnp.asarray([1, 0]))
    loss_lm = qformer.lm_loss(lm, tokens, pad.astype(jnp.float32) * 0)
    assert np.isfinite(float(loss_itm)) and np.isfinite(float(loss_lm))
    # ITM must depend on the pairing: shuffled memory changes the logits
    itm2 = model.apply(variables, tokens, pad, memory[::-1], kpm[::-1], method="itm_logits")
    assert not np.allclose(np.asarray(itm), np.asarray(itm2))


def test_lm_queries_blind_to_text():
    """In LM mode the query rows must not see text (BLIP-2 two-phase
    semantics): query states are invariant to the text content."""
    model, variables, tokens, att, memory, kpm = _setup_lm()
    pad = jnp.zeros_like(tokens)
    qf_vars = {"params": variables["params"]["qformer"]}
    mem_p = memory @ variables["params"]["mmt_proj"]["kernel"] + variables["params"]["mmt_proj"]["bias"]
    q1, _ = qformer.QFormer(LMCFG).apply(qf_vars, mem_p, kpm, tokens, pad, mode="lm")
    q2, _ = qformer.QFormer(LMCFG).apply(qf_vars, mem_p, kpm, (tokens + 7) % 43, pad, mode="lm")
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)


def test_lm_generate_matches_teacher_forced():
    """Past-KV incremental generation must reproduce the full-prefix
    teacher-forced argmax roll-out token for token (the cache-correctness
    property; reference past_key_values plumbing Qformer_v15_4.py:111-277)."""
    model, variables, tokens, att, memory, kpm = _setup_lm()
    max_len = 6
    gen = qformer.lm_generate_greedy(variables, LMCFG, memory, kpm, max_len)
    assert gen.shape == (2, max_len)

    # oracle: grow the prefix, full forward each step, with the same
    # freeze-after-EOS semantics as lm_generate_greedy
    seq = np.full((2, 1), 3, np.int64)  # SOS
    done = np.zeros(2, bool)
    for _ in range(max_len):
        pad = np.zeros_like(seq, np.float32)
        logits = model.apply(
            variables, jnp.asarray(seq), jnp.asarray(pad), memory, kpm, method="lm_logits"
        )
        nxt = np.argmax(np.asarray(logits)[:, -1], axis=-1)
        nxt = np.where(done, 2, nxt)
        done |= nxt == 2
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(gen), seq[:, 1:])

    # freeze property: nothing but EOS may follow the first EOS
    g = np.asarray(gen)
    for row in g:
        hits = np.nonzero(row == 2)[0]
        if hits.size:
            assert (row[hits[0]:] == 2).all()


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
    variables = model.init({"params": jax.random.PRNGKey(0)}, memory, None, deterministic=True)
    before = model.apply(variables, memory, None, deterministic=True)
    merged = {"params": qf.merge_params(dict(variables["params"]), overlay)}
    after = model.apply(merged, memory, None, deterministic=True)
    assert after.shape == before.shape
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # converted in_proj matches the concatenated q/k/v torch weights
    w = np.asarray(merged["params"]["layers_0"]["self_attn"]["in_proj_weight"])
    qw = bert.state_dict()["encoder.layer.0.attention.self.query.weight"].numpy()
    np.testing.assert_allclose(w[:32], qw)


def test_from_hf_bert_all_12_layers_and_embeddings():
    """The reference seeds from 12-layer bert-base
    (models_BLIP_v15_4.py:526-540); all 12 layers + word/position
    embeddings must convert."""
    from transformers import BertConfig, BertModel

    from multimodalspectraltransformer_tpu.rank import qformer as qf

    qcfg = qf.QFormerConfig(hidden=32, num_heads=2, ffn_dim=64, num_layers=12,
                            num_queries=4, encoder_width=32, projection_dim=16,
                            vocab_size=50, max_text_len=16)
    bert = BertModel(BertConfig(hidden_size=32, num_hidden_layers=12,
                                num_attention_heads=2, intermediate_size=64,
                                vocab_size=50, max_position_embeddings=16))
    overlay = qf.from_hf_bert(qcfg, bert.state_dict())
    assert {f"layers_{i}" for i in range(12)} <= set(overlay)
    # text embeddings convert when vocab sizes match
    assert "text_embeddings" in overlay
    we = overlay["text_embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_allclose(
        we, bert.state_dict()["embeddings.word_embeddings.weight"].numpy()
    )
    # every layer got BERT's self-attn + both FFN copies
    for i in range(12):
        layer = overlay[f"layers_{i}"]
        assert "self_attn" in layer and "linear1" in layer and "linear1_text" in layer
