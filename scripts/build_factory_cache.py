"""Pre-build a `cli train --factory-cache` pickle from a corpus file.

Runs the full data factory (trained-GNN shifts + IR, spectrum
reconstruction — `sim.factory.simulate_records`) over a SMILES corpus in
chunks with progress prints, writing the keyed cache pickle that
`cli train --factory N --factory-seed S --factory-cache PATH` accepts.
Decouples the ~hour-scale simulation of a multi-100k corpus from the
training launch (reference counterpart: the `gen_sim_aug_data` stage,
`execution_function_v15_4.py:105-141`).

Usage (on the chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/build_factory_cache.py \
        --corpus /tmp/corpus.txt --n 200000 --seed 21 --out /tmp/factory.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="text file, one SMILES per line")
    ap.add_argument("--n", type=int, required=True,
                    help="the --factory N the cache will be used with (key check)")
    ap.add_argument("--seed", type=int, required=True,
                    help="the --factory-seed the cache will be used with (key check)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--checkpoint-every", type=int, default=16,
                    help="crash-safety checkpoint cadence in CHUNKS (re-"
                         "pickling the whole list every chunk is O(n^2) I/O)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (keeps the TPU free for a "
                         "concurrent training/eval job; the factory GNN "
                         "batches are small enough that CPU is fine)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from multimodalspectraltransformer_tpu.sim import factory

    with open(args.corpus) as f:
        smiles = [ln.strip() for ln in f if ln.strip()]
    print(f"corpus: {len(smiles)} molecules from {args.corpus}", flush=True)
    if len(smiles) != args.n:
        print(
            f"[warn] corpus holds {len(smiles)} molecules but --n {args.n} was "
            "asserted for the cache key — a mismatched/truncated corpus would "
            "train on fewer records than requested",
            file=sys.stderr, flush=True,
        )

    records = []
    t_all = time.time()
    for lo in range(0, len(smiles), args.chunk):
        chunk = smiles[lo : lo + args.chunk]
        t0 = time.time()
        recs = factory.simulate_records(
            chunk, sample_ids=[f"f{lo + i}" for i in range(len(chunk))]
        )
        records.extend(recs)
        done = lo + len(chunk)
        rate = done / (time.time() - t_all)
        eta = (len(smiles) - done) / rate / 60
        print(
            f"factory {done}/{len(smiles)}: {len(recs)} records in "
            f"{time.time()-t0:.1f}s ({rate:.1f} mol/s, ETA {eta:.0f} min)",
            flush=True,
        )
        # crash-safety checkpoint: every K chunks (not every chunk — that
        # rewrites a growing multi-GB pickle ~100x over a 200k corpus),
        # written atomically (tmp + os.replace) so a crash mid-dump can't
        # corrupt the checkpoint it exists to protect
        if (lo // args.chunk + 1) % args.checkpoint_every == 0:
            tmp = args.out + ".partial.tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"n": args.n, "seed": args.seed, "done": done,
                             "records": records}, f)
            os.replace(tmp, args.out + ".partial")

    tmp = args.out + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"n": args.n, "seed": args.seed, "records": records}, f)
    os.replace(tmp, args.out)
    if os.path.exists(args.out + ".partial"):
        os.remove(args.out + ".partial")
    print(
        f"wrote {args.out}: {len(records)} records in {(time.time()-t_all)/60:.1f} min",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
