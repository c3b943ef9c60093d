"""Headline benchmark on one TPU chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's measured end-to-end evaluation wall
time is median ~83 s/molecule on a V100 (simulate + 10-candidate MNS + CLIP
+ SGNN error + rank; `scripts/ZINC_0_250.txt` chunk timestamps).

Default mode (BENCH_MODE=e2e): the SAME pipeline stages per molecule —
encode + greedy + 128-way multinomial fan-out with temperature escalation
+ validity/MW/dedup filters + CLIP scoring + simulated HSQC/COSY
spectral-error ranking — so vs_baseline is apples-to-apples.

BENCH_MODE=beam: the generation stage alone — full-size (~26M param) MMT
encode over all five modalities + KV-cached ancestry beam decode (beam 5,
up to 128 tokens, no early exit — worst case) for a batch of molecules.
"""

from __future__ import annotations

import json
import os
import time

import jax


def _fail_fast_if_tunnel_down() -> None:
    """The axon TPU backend rides a loopback relay (127.0.0.1:8083). When
    the relay is down, jax.devices() hangs or errors minutes later deep in
    a compile call; probe the socket up front so a driver run during an
    outage records a clear one-line reason instead of a timeout."""
    if os.environ.get("JAX_PLATFORMS", "axon") != "axon":
        return
    import socket

    for attempt in range(10):  # relay outages usually heal in minutes
        s = socket.socket()
        s.settimeout(5)
        try:
            s.connect(("127.0.0.1", 8083))
            return
        except OSError:
            time.sleep(30)
        finally:
            s.close()
    raise SystemExit("bench: TPU tunnel relay (127.0.0.1:8083) unreachable for 5 min; aborting")


_fail_fast_if_tunnel_down()

# persistent compilation cache: the driver re-runs this cold every round;
# cached executables cut the cold start from minutes to seconds
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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


def main_e2e() -> None:
    """BENCH_MODE=e2e: the reference's full per-molecule evaluation pipeline
    (§3.2): encode + greedy + 128-way MNS sampling with temperature
    escalation + validity/MW/dedup filters + CLIP scoring + simulated
    HSQC/COSY spectral errors + ranking. Directly comparable to the
    reference's median 83 s/molecule V100 logs."""
    import jax
    import numpy as np

    from multimodalspectraltransformer_tpu.data import pipeline as dp
    from multimodalspectraltransformer_tpu.eval import harness
    from multimodalspectraltransformer_tpu.rank.clip import CLIPConfig, CLIPRanker
    from multimodalspectraltransformer_tpu.train.contrastive import clip_tokenize
    from multimodalspectraltransformer_tpu.utils.config import DecodeConfig

    # Liveness heartbeat on stderr: first TPU compiles of fresh decode
    # executables are device-bound and silent — guarded drivers kill on
    # stale-log + cpu-idle (see scripts/r4_driver.sh guard()).
    import sys as _sys
    import threading as _th
    import time as _t

    def _beat():
        t0 = _t.time()
        while True:
            _t.sleep(120)
            print(f"[bench] heartbeat {_t.time()-t0:.0f}s", file=_sys.stderr, flush=True)

    _th.Thread(target=_beat, daemon=True).start()

    # 48 molecules/batch is the measured throughput sweet spot (24: ~16
    # mols/s, 48: ~19, 96: ~15.8 — 6144 fan-out lanes fill the chip while
    # the host filter still hides under the lookahead round)
    n_mols = int(os.environ.get("BENCH_MOLS", "48"))
    cfg = ModelConfig()
    params = mmt.init_params(cfg, jax.random.PRNGKey(0))

    # Trained-weights mode: BENCH_PARAMS=<params.msgpack> (or a committed
    # weights/mmt_r2_params.msgpack) benches the trained checkpoint on
    # factory-simulated spectra of unseen molecules — the same basis as the
    # reference's 83 s/mol logs (trained model, its own simulator's data).
    # The model's own sampling then provides the candidates, so no injected
    # extras are needed to load the CLIP/simulation/ranking stages.
    params_path = os.environ.get("BENCH_PARAMS", "")
    if params_path.lower() in ("none", "untrained"):
        params_path = ""
    elif not params_path:
        # explicit preference order over committed files only — never a
        # speculative name (a future commit by that name would silently
        # change the bench basis; VERDICT r3 weak #8). The basename is
        # pinned into the metric string below.
        for name in ("mmt_r4_phase3.msgpack.gz", "mmt_r3_phase1.msgpack.gz",
                     "mmt_r2_70k.msgpack.gz", "mmt_r2_45k.msgpack.gz"):
            default_w = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "weights", name)
            if os.path.exists(default_w):
                params_path = default_w
                break
    trained = bool(params_path)
    if trained:
        from multimodalspectraltransformer_tpu.data import molrandom
        from multimodalspectraltransformer_tpu.sim import factory
        from multimodalspectraltransformer_tpu.train import checkpoint as _ckpt

        params = _ckpt.import_params_msgpack(params, params_path)
        records = factory.simulate_records(
            molrandom.random_corpus(n_mols * 2, seed=123)[:n_mols]
        )
    else:
        records = dp.synthetic_dataset(n_mols, seed=0)
    # CLIP stage: load the committed TRAINED ranking tower when present
    # (weights/clip_r3.msgpack bundle); otherwise a random-init 2-layer
    # stand-in that carries the same per-candidate FLOP load (annotated in
    # the metric string — a random tower scores, it does not rank).
    clip_path = ""
    for name in ("clip_r4.msgpack.gz", "clip_r3.msgpack.gz", "clip_r3.msgpack"):
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights", name)
        if os.path.exists(p):
            clip_path = p
            break
    if clip_path:
        from multimodalspectraltransformer_tpu.rank.clip import load_bundle

        cvars, ccfg = load_bundle(clip_path)
        clip_desc = "trained CLIP ranker"
    else:
        ccfg = CLIPConfig(text_layers=2)
        toks, mask = clip_tokenize(["CCO"], 64)
        cvars = CLIPRanker(ccfg).init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            jnp.asarray(toks), jnp.asarray(mask), jnp.zeros((1, 512)), True,
        )
        clip_desc = "random-init 2-layer CLIP (FLOP load only, not a functional ranker)"
    dcfg = DecodeConfig(max_len=64, fanout=128, multinom_runs=10, max_temp_rounds=5,
                        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"))

    # Untrained weights sample almost no valid SMILES, which would let the
    # CLIP / spectral-simulation / ranking stages run empty and overstate
    # throughput. Inject `multinom_runs` realistic candidates per molecule
    # (graph-mutation neighbors of the target) through the harness's
    # rank-external-candidates path so every stage carries the same load it
    # would with a trained model. Built once, outside the timed section —
    # candidate *provision* is not a pipeline stage; their scoring is.
    from multimodalspectraltransformer_tpu.train.molgen import MolGenConfig, generate_neighbors

    extras = None
    if not trained:
        extras = [
            generate_neighbors(r.smiles, MolGenConfig(generations_per_target=dcfg.multinom_runs))
            for r in records
        ]

    # warmup: compile every stage once before timing — including the device
    # spectral scorer (simulate_errors=True), whose auction-kernel compile
    # would otherwise land inside the first timed rep on a cold XLA cache.
    # CLIP runs on a fixed candidate block so one executable serves every
    # molecule.
    harness.evaluate_molecules(
        records, params, cfg, dcfg, clip_bundle=(cvars, ccfg), simulate_errors=True,
        clip_block=dcfg.multinom_runs, extra_candidates=extras,
    )

    reps = max(1, int(os.environ.get("BENCH_E2E_REPS", "2")))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        results, summary = harness.evaluate_molecules(
            records, params, cfg, dcfg, clip_bundle=(cvars, ccfg), simulate_errors=True,
            clip_block=dcfg.multinom_runs, extra_candidates=extras,
        )
        times.append(time.perf_counter() - t0)
    best = min(times)
    mean = sum(times) / len(times)
    mols_per_sec = len(results) / best
    print(json.dumps({
        "metric": (
            f"mols/sec/chip FULL pipeline: encode + greedy + 128-way MNS "
            f"(10 candidates, temp escalation) + filters + {clip_desc} + simulated "
            f"HSQC/COSY spectral-error ranking ({len(results)} molecules, "
            f"{'trained checkpoint ' + os.path.basename(params_path) + ', model-sampled candidates' if trained else 'untrained weights, injected candidates'}, "
            f"best of {reps} reps; mean-of-reps in mols_per_sec_mean; "
            "baseline = reference V100 same pipeline 83 s/mol)"
        ),
        "value": round(mols_per_sec, 3),
        "unit": "mols/sec/chip",
        "vs_baseline": round(mols_per_sec / BASELINE_MOLS_PER_SEC, 1),
        "mols_per_sec_mean": round(len(results) / mean, 3),
    }))


def main() -> None:
    # default: the apples-to-apples end-to-end pipeline (the reference's
    # 83 s/mol covers these same stages). BENCH_MODE=beam measures the
    # generation stage alone (worst-case full-length beam decode).
    if os.environ.get("BENCH_MODE", "e2e") == "e2e":
        return main_e2e()
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
