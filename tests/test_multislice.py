"""Multi-slice (DCN) mesh: train step over a (dcn, data, model) mesh on the
virtual 8-device CPU backend must match the single-device step (SURVEY.md
§5.8 — DP-only crossing over DCN, TP confined to a slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalspectraltransformer_tpu import parallel
from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.train import create_state, train_step
from multimodalspectraltransformer_tpu.utils.config import MMTConfig, ModelConfig, TrainConfig

MCFG = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
# fast_dropout_rng off: the sharded-vs-single-device parity assertions
# must not depend on rbg bit stability across shardings (not a JAX
# guarantee); threefry IS stable across shardings.
CFG = MMTConfig(model=MCFG, train=TrainConfig(learning_rate=1e-3, fast_dropout_rng=False))


def _batch(n=8):
    records = dp.synthetic_dataset(n, seed=2)
    loader = dp.Loader(records, MCFG, batch_size=n)
    return next(iter(loader.epoch(0)))


def test_multislice_mesh_axes_and_sharding():
    mesh = parallel.make_multislice_mesh(slices=2, data=2, model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.devices.shape == (2, 2, 2)
    bs = parallel.batch_sharding(mesh)
    x = jax.device_put(jnp.zeros((8, 4)), bs)
    # batch spread over dcn*data = 4 shards
    assert len({d for d in x.devices()}) == 8 or x.sharding.num_devices == 8


def test_multislice_train_step_matches_single_device():
    batch = _batch(8)
    model = mmt.MultimodalTransformer(MCFG)
    params = mmt.init_params(MCFG, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)

    # single device (copy params: train_step donates its state buffers and
    # device_put to the resident device aliases instead of copying)
    b1 = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), jax.devices()[0]), batch)
    p1 = jax.tree.map(lambda x: jnp.array(x, copy=True), params)

    # 2 slices x 2 data x 2 model
    mesh = parallel.make_multislice_mesh(slices=2, data=2, model=2)
    shardings = parallel.param_shardings(mesh, params, tensor_parallel=True)
    p2 = jax.device_put(params, shardings)
    bs = parallel.batch_sharding(mesh)
    b2 = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), bs), batch)

    # Parity property: the sharded GRADIENTS equal the single-device ones up
    # to reduction-order fp noise. (Comparing post-Adam params is ill-posed:
    # the first Adam step is ~lr*sign(g), so elements with g ~ 0 flip sign on
    # any reduction-order change and the comparison is flaky by construction.)
    # Grads are computed BEFORE train_step, which donates the param buffers.
    from multimodalspectraltransformer_tpu.train.step import loss_fn

    def grads_of(ps, bt):
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(ps, model, CFG, bt, rng)
        return g

    g1 = jax.tree.leaves(jax.jit(grads_of)(p1, b1))
    g2 = jax.tree.leaves(jax.jit(grads_of)(p2, b2))
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5)

    s1 = create_state(CFG.train, p1)
    s1, m1 = train_step(model, CFG, s1, b1, rng)
    s2 = create_state(CFG.train, p2)
    s2, m2 = train_step(model, CFG, s2, b2, rng)
    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=2e-5, atol=2e-5)


def test_sharded_fanout_decode_matches_single_device():
    """Fan-out/beam decoding sharded over the mesh data axis (params
    replicated, encoder memory batch-sharded via shard_for_inference) must
    produce the identical tokens as the single-device sampler — the
    embarrassingly-parallel inference path of SURVEY §5.8."""
    from multimodalspectraltransformer_tpu.decode import samplers

    batch = _batch(8)
    model = mmt.MultimodalTransformer(MCFG)
    params = mmt.init_params(MCFG, jax.random.PRNGKey(0))
    enc = jax.jit(lambda p, b: model.apply({"params": p}, b, None, True))(params, batch.inputs)
    mem, kpm = enc.memory, enc.memory_key_padding_mask
    rng = jax.random.PRNGKey(3)

    ref_mn = samplers.multinomial_decode(params, MCFG, mem, kpm, rng, 1.0, 12, fanout=4)
    ref_beam = samplers.beam_search(params, MCFG, mem, kpm, 3, 1.0, 12)

    mesh = parallel.make_mesh(data=8, model=1)
    p_s, mem_s, kpm_s = parallel.shard_for_inference(mesh, params, mem, kpm)
    out_mn = samplers.multinomial_decode(p_s, MCFG, mem_s, kpm_s, rng, 1.0, 12, fanout=4)
    out_beam = samplers.beam_search(p_s, MCFG, mem_s, kpm_s, 3, 1.0, 12)

    np.testing.assert_array_equal(np.asarray(ref_mn.tokens), np.asarray(out_mn.tokens))
    np.testing.assert_array_equal(np.asarray(ref_beam.tokens), np.asarray(out_beam.tokens))
    np.testing.assert_allclose(
        np.asarray(ref_beam.scores), np.asarray(out_beam.scores), rtol=1e-5, atol=1e-6
    )


def test_sharded_harness_round_matches_single_device():
    """The FULL evaluation pipeline (encode -> teacher-forced -> greedy ->
    fan-out MNS -> spectral-error ranking) run with evaluate_molecules(
    mesh=...) must produce identical results to the single-device run —
    the sharded-decode property through the harness, not one sampler call."""
    import numpy as np

    from multimodalspectraltransformer_tpu.eval import harness
    from multimodalspectraltransformer_tpu.sim import factory
    from multimodalspectraltransformer_tpu.utils.config import DecodeConfig

    records = factory.simulate_records(
        ["CCO", "CC(C)=O", "Cc1ccccc1", "CCN", "CC(N)C(=O)O", "c1ccncc1",
         "CCOC(C)=O", "CC(O)CC"],
        use_default_models=False,
    )
    params = mmt.init_params(MCFG, jax.random.PRNGKey(0))
    dcfg = DecodeConfig(max_len=12, fanout=4, multinom_runs=2,
                        max_temp_rounds=1, mw_filter=False, lookahead=False)
    ref_res, ref_sum = harness.evaluate_molecules(
        records, params, MCFG, dcfg, jax.random.PRNGKey(9)
    )
    mesh = parallel.make_mesh(data=8, model=1)
    sh_res, sh_sum = harness.evaluate_molecules(
        records, params, MCFG, dcfg, jax.random.PRNGKey(9), mesh=mesh
    )
    assert [r.greedy for r in ref_res] == [r.greedy for r in sh_res]
    assert [r.corr_sampling_prob for r in ref_res] == pytest.approx(
        [r.corr_sampling_prob for r in sh_res], rel=1e-4
    )
    assert [sorted(c.smiles for c in r.candidates) for r in ref_res] == [
        sorted(c.smiles for c in r.candidates) for r in sh_res
    ]
    assert np.isclose(ref_sum.greedy_tanimoto, sh_sum.greedy_tanimoto)

    # non-divisible batch: 6 records on a data=8 mesh must pad internally
    # (repeat-last) and trim the duplicates, not raise on device_put
    short = records[:6]
    np_res, _ = harness.evaluate_molecules(
        short, params, MCFG, dcfg, jax.random.PRNGKey(9)
    )
    sp_res, _ = harness.evaluate_molecules(
        short, params, MCFG, dcfg, jax.random.PRNGKey(9), mesh=mesh
    )
    assert len(sp_res) == 6
    assert [r.greedy for r in np_res] == [r.greedy for r in sp_res]
