"""Checkpoint conversion round-trip and structural compatibility."""

import jax
import numpy as np

from multimodalspectraltransformer_tpu.models import convert, mmt
from multimodalspectraltransformer_tpu.utils.config import ModelConfig

CFG = ModelConfig(num_encoder_layers=2, num_decoder_layers=2, ffn_dim=64)


def _tree_paths(tree, prefix=""):
    out = set()
    if isinstance(tree, dict):
        for k, v in tree.items():
            out |= _tree_paths(v, f"{prefix}/{k}")
    else:
        out.add(prefix)
    return out


def test_round_trip_identity():
    params = mmt.init_params(CFG, jax.random.PRNGKey(0))
    params = jax.tree.map(np.asarray, params)
    # the MF table's 213th row is ours alone (overflow guard); torch never
    # stores it, so zero it for an exact round trip
    params["embed_mf"]["embedding"] = np.asarray(params["embed_mf"]["embedding"]).copy()
    params["embed_mf"]["embedding"][-1] = 0.0
    sd = convert.to_torch_state_dict(CFG, params)
    back = convert.from_torch_state_dict(CFG, sd)
    assert _tree_paths(back) == _tree_paths(params)
    for pa, pb in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_exported_keys_match_reference_naming():
    params = mmt.init_params(CFG, jax.random.PRNGKey(0))
    sd = convert.to_torch_state_dict(CFG, jax.tree.map(np.asarray, params))
    # spot-check the exact key strings the reference model would produce
    assert "linear_spec_embedding_1H.point_embedding_layer_1H.fc_H.weight" in sd
    assert "encoder_1H.layers.0.self_attn.in_proj_weight" in sd
    assert "encoder_cross.layers.1.linear2.bias" in sd
    assert "decoder.layers.0.multihead_attn.out_proj.weight" in sd
    assert "pe_trg.weight" in sd
    assert sd["linear_embedding_MF.embedding.weight"].shape == (212, 128)
    # torch Linear layout [out, in]
    assert sd["fc_out.weight"].shape == (CFG.smiles_vocab_size, CFG.hidden_size)


def test_converted_params_run_forward():
    params = mmt.init_params(CFG, jax.random.PRNGKey(0))
    sd = convert.to_torch_state_dict(CFG, jax.tree.map(np.asarray, params))
    back = convert.from_torch_state_dict(CFG, sd)
    model = mmt.MultimodalTransformer(CFG)
    batch = mmt.dummy_batch(CFG, 2)
    enc = jax.jit(lambda p, b: model.apply({"params": p}, b, None, True))(back, batch)
    assert np.isfinite(np.asarray(enc.memory)).all()
