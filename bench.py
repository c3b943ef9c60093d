"""Headline benchmark: four-modality beam-search SMILES generation throughput
on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's measured end-to-end evaluation wall
time is median ~83 s/molecule on a V100 (simulate + 10-candidate MNS + CLIP
+ SGNN error + rank; `scripts/ZINC_0_250.txt` chunk timestamps). The closest
measured per-molecule figure for the reference's *generation* stage alone is
not logged, so vs_baseline is reported against the 1/83 mol/s end-to-end
number; the benchmark description states exactly what this run covers so the
comparison basis is explicit. As more pipeline stages land (CLIP scoring,
spectral-error ranking), this bench grows to cover them on-device.

This run covers: full-size (~26M param) MMT encoder over all five modalities
+ KV-cached beam-search decode (beam 5, up to 128 tokens, no early exit -
worst case) for a batch of molecules.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from multimodalspectraltransformer_tpu.decode import samplers
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.utils.config import ModelConfig

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
BEAM = int(os.environ.get("BENCH_BEAM", "5"))
MAX_LEN = int(os.environ.get("BENCH_MAX_LEN", "128"))
REPS = int(os.environ.get("BENCH_REPS", "3"))

# V100 reference end-to-end: median 83 s/mol (BASELINE.md)
BASELINE_MOLS_PER_SEC = 1.0 / 83.0


def main() -> None:
    cfg = ModelConfig()
    model = mmt.MultimodalTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    params = mmt.init_params(cfg, rng, batch_size=2)

    batch = mmt.dummy_batch(cfg, BATCH)
    batch = batch._replace(
        src_1h=jax.random.uniform(rng, batch.src_1h.shape),
        src_13c=jax.random.uniform(jax.random.fold_in(rng, 1), batch.src_13c.shape),
        src_hsqc=jax.random.uniform(jax.random.fold_in(rng, 2), batch.src_hsqc.shape),
        src_cosy=jax.random.uniform(jax.random.fold_in(rng, 3), batch.src_cosy.shape),
        src_ir=jax.random.uniform(jax.random.fold_in(rng, 4), batch.src_ir.shape),
        mw=jnp.linspace(100.0, 350.0, BATCH),
    )

    encode = jax.jit(lambda p, b: model.apply({"params": p}, b, None, True))

    def generate(params, batch):
        enc = encode(params, batch)
        return samplers.beam_search(
            params, cfg, enc.memory, enc.memory_key_padding_mask, BEAM, 1.0, MAX_LEN,
            early_exit=False,  # honest worst-case: full-length decode
            compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        )

    import numpy as np

    # warmup/compile
    out = generate(params, batch)
    np.asarray(out.tokens)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = generate(params, batch)
        np.asarray(out.tokens)  # device->host fetch forces full execution
        times.append(time.perf_counter() - t0)

    best = min(times)
    mols_per_sec = BATCH / best
    print(
        json.dumps(
            {
                "metric": (
                    f"mols/sec/chip four-modality encode + beam{BEAM} "
                    f"KV-cached bf16 SMILES decode (len {MAX_LEN}, batch {BATCH}, "
                    "shared cross-KV across beam lanes, untrained weights, no "
                    "early exit; baseline = reference V100 end-to-end 83 s/mol)"
                ),
                "value": round(mols_per_sec, 3),
                "unit": "mols/sec/chip",
                "vs_baseline": round(mols_per_sec / BASELINE_MOLS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
