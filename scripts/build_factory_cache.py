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
    args = ap.parse_args()

    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from multimodalspectraltransformer_tpu.sim import factory

    with open(args.corpus) as f:
        smiles = [ln.strip() for ln in f if ln.strip()]
    print(f"corpus: {len(smiles)} molecules from {args.corpus}", flush=True)

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
        # checkpoint the partial cache so a crash doesn't lose hours
        tmp = args.out + ".partial"
        with open(tmp, "wb") as f:
            pickle.dump({"n": args.n, "seed": args.seed, "done": done,
                         "records": records}, f)

    with open(args.out, "wb") as f:
        pickle.dump({"n": args.n, "seed": args.seed, "records": records}, f)
    if os.path.exists(args.out + ".partial"):
        os.remove(args.out + ".partial")
    print(
        f"wrote {args.out}: {len(records)} records in {(time.time()-t_all)/60:.1f} min",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
