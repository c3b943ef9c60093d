"""Chunked batch-evaluation sweep driver.

Replaces the reference's SLURM driver family (`scripts/script_PC_0_250.py`
and siblings: 1000-molecule sweeps, chunk loop at `:821-857`, results
pickled per chunk, already-done chunks skipped by index on restart
`:829-830`). Differences by design: chunks are JSON (not pickle), resume is
content-addressed (a chunk re-runs if its molecule list changed), and the
whole sweep runs in one process — pod-scale fan-out shards chunks over
hosts with --shard/--num-shards instead of one SLURM job per script.

Usage:
  python scripts/eval_sweep.py --smiles mols.txt --out sweep/ \
      --chunk-size 50 [--params params.msgpack] [--small] \
      [--shard 0 --num-shards 4] [--synthetic 1000]

Each chunk writes sweep/chunk_NNN.json with per-molecule results + summary;
a final sweep/summary.json aggregates (greedy exact, MNS top-rank exact,
mean tanimoto, top-k accuracy, mols/sec) — the metrics of BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--smiles", default="", help="txt/csv of SMILES (or use --synthetic)")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--chunk-size", type=int, default=50)
    p.add_argument("--params", default="")
    p.add_argument("--small", action="store_true")
    p.add_argument("--max-len", type=int, default=64)
    p.add_argument("--fanout", type=int, default=128)
    p.add_argument("--multinom-runs", type=int, default=10)
    p.add_argument("--rounds", type=int, default=20)
    p.add_argument("--no-sim-errors", action="store_true")
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main() -> int:
    args = parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    from multimodalspectraltransformer_tpu.data import pipeline as dp
    from multimodalspectraltransformer_tpu.eval import harness
    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.sim import factory
    from multimodalspectraltransformer_tpu.utils.config import DecodeConfig, ModelConfig

    if args.synthetic:
        records = dp.synthetic_dataset(args.synthetic, seed=args.seed)
    else:
        if not args.smiles:
            raise SystemExit("one of --smiles FILE or --synthetic N is required")
        from multimodalspectraltransformer_tpu.cli import _read_smiles

        smiles = _read_smiles(args.smiles)
        records = factory.simulate_records(smiles)
    print(f"[sweep] {len(records)} molecules", flush=True)

    mcfg = ModelConfig.small() if args.small else ModelConfig()
    if args.params:
        from multimodalspectraltransformer_tpu.train import checkpoint as ckpt

        template = mmt.init_params(mcfg, jax.random.PRNGKey(0))
        params = ckpt.import_params_msgpack(template, args.params)
    else:
        params = mmt.init_params(mcfg, jax.random.PRNGKey(args.seed))

    dcfg = DecodeConfig(
        max_len=args.max_len, fanout=args.fanout,
        multinom_runs=args.multinom_runs, max_temp_rounds=args.rounds,
    )

    chunks = [records[i : i + args.chunk_size] for i in range(0, len(records), args.chunk_size)]
    my_chunks = [(ci, c) for ci, c in enumerate(chunks) if ci % args.num_shards == args.shard]

    # resume digests must cover the checkpoint AND decode config, not just
    # the molecules — a re-run with a different --params must not silently
    # reuse the old model's chunks
    if args.params:
        with open(args.params, "rb") as f:
            params_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    else:
        params_hash = f"init{args.seed}"
    run_key = (
        f"{params_hash}#f{args.fanout}.m{args.multinom_runs}.r{args.rounds}"
        f".l{args.max_len}.s{int(not args.no_sim_errors)}"
    )

    all_results = []
    for ci, chunk in my_chunks:
        path = os.path.join(args.out, f"chunk_{ci:04d}.json")
        digest = hashlib.sha256(
            ("|".join(r.smiles for r in chunk) + "#" + run_key).encode()
        ).hexdigest()[:16]
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
            if prev.get("digest") == digest:  # content-addressed resume
                print(f"[sweep] chunk {ci} done, skipping", flush=True)
                all_results.append(prev)
                continue
        t0 = time.time()
        results, summary = harness.evaluate_molecules(
            chunk, params, mcfg, dcfg,
            rng=jax.random.PRNGKey(args.seed + ci),
            simulate_errors=not args.no_sim_errors,
        )
        payload = {
            "chunk": ci,
            "digest": digest,
            "wall_s": time.time() - t0,
            "summary": summary.__dict__,
            "molecules": [
                {
                    "target": r.target,
                    "greedy": r.greedy,
                    "greedy_exact": r.greedy_exact,
                    "greedy_tanimoto": r.greedy_tanimoto,
                    "mns_exact": r.mns_exact,
                    "best_tanimoto": r.best_tanimoto,
                    "corr_sampling_prob": r.corr_sampling_prob,
                    "n_candidates": len(r.candidates),
                }
                for r in results
            ],
        }
        with open(path, "w") as f:
            json.dump(payload, f)
        all_results.append(payload)
        s = payload["summary"]
        print(
            f"[sweep] chunk {ci}: {len(results)} mols in {payload['wall_s']:.1f}s | "
            f"greedy_exact={s.get('greedy_exact', 0):.3f} mns_exact={s.get('mns_exact', 0):.3f}",
            flush=True,
        )

    # aggregate over completed chunks of this shard
    mols = [m for p in all_results for m in p["molecules"]]
    if mols:
        agg = {
            "n": len(mols),
            "greedy_exact": sum(m["greedy_exact"] for m in mols) / len(mols),
            "mns_exact": sum(m["mns_exact"] for m in mols) / len(mols),
            "mean_best_tanimoto": sum(m["best_tanimoto"] for m in mols) / len(mols),
            "mean_greedy_tanimoto": sum(m["greedy_tanimoto"] for m in mols) / len(mols),
            "total_wall_s": sum(p["wall_s"] for p in all_results),
            "mols_per_sec": len(mols) / max(sum(p["wall_s"] for p in all_results), 1e-9),
        }
        with open(os.path.join(args.out, f"summary_shard{args.shard}.json"), "w") as f:
            json.dump(agg, f, indent=2)
        print("[sweep] " + json.dumps(agg), flush=True)

    # cross-shard aggregation: when every shard's summary exists, merge
    # them into the sweep/summary.json the module docstring promises
    shard_files = [
        os.path.join(args.out, f"summary_shard{s}.json") for s in range(args.num_shards)
    ]
    if all(os.path.exists(p) for p in shard_files):
        shards = [json.load(open(p)) for p in shard_files]
        total_n = sum(s["n"] for s in shards)
        merged = {
            "n": total_n,
            "num_shards": args.num_shards,
            "greedy_exact": sum(s["greedy_exact"] * s["n"] for s in shards) / total_n,
            "mns_exact": sum(s["mns_exact"] * s["n"] for s in shards) / total_n,
            "mean_best_tanimoto": sum(s["mean_best_tanimoto"] * s["n"] for s in shards) / total_n,
            "mean_greedy_tanimoto": sum(s["mean_greedy_tanimoto"] * s["n"] for s in shards) / total_n,
            "total_wall_s": sum(s["total_wall_s"] for s in shards),
        }
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(merged, f, indent=2)
        print("[sweep] all shards done: " + json.dumps(merged), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
