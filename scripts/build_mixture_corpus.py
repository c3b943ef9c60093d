"""Build the ZC2 mixture factory cache: zinclike corpus + adapt-half reals.

The r4 ZC eval scored 0.000 on the eval half while the memorization
control free-ran at 1.0 on adapt-half molecules trained with their REAL
SGNN spectra — so after the chemotype fix, the remaining gap is the input
distribution: adapted-GNN simulated spectra (13C NN-MAE 2.35 ppm residual,
full-modality records with independent 20% blanking) vs the testset's real
SGNN spectra (no IR, no 1H, SGNN peak statistics). This mixture teaches
both in one fine-tune:

  - the 151807-record fragment-recombination zinclike corpus (chemotype)
  - the 488 adapt-half molecules with their real spectra, duplicated --dup
    times (real input statistics INCLUDING the exact no-IR/no-1H blank
    pattern, ~17% of samples at dup=64)

Eval stays on the eval half (disjoint molecules) — same disclosed
adaptation protocol as the r3 SGNN distillation (scripts/sgnn_adapt.py).

Usage:
    python scripts/build_mixture_corpus.py --zc .cache/factory_zinc.pkl \
        --mem .cache/factory_adapt_mem.pkl --dup 64 \
        --out .cache/factory_zc2.pkl --key-seed 777
"""
from __future__ import annotations

import argparse
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--zc", default=".cache/factory_zinc.pkl")
    ap.add_argument("--mem", default=".cache/factory_adapt_mem.pkl")
    ap.add_argument("--dup", type=int, default=64,
                    help="adapt-half oversampling (mem cache already holds "
                         "32 dups; this is the TOTAL target multiple)")
    ap.add_argument("--out", default=".cache/factory_zc2.pkl")
    ap.add_argument("--key-seed", type=int, default=777)
    args = ap.parse_args()

    with open(args.zc, "rb") as f:
        zc = pickle.load(f)["records"]
    with open(args.mem, "rb") as f:
        mem = pickle.load(f)["records"]
    # mem holds uniques x32 with _m<d> suffixes; recover the uniques
    uniq = {}
    for r in mem:
        base = r.sample_id.split("_m")[0]
        if base not in uniq:
            uniq[base] = r
    reals = []
    for d in range(args.dup):
        for base, r in uniq.items():
            reals.append(type(r)(f"{base}_x{d}", r.smiles, h1=r.h1, c13=r.c13,
                                 hsqc=r.hsqc, cosy=r.cosy, ir=r.ir))
    records = list(zc) + reals
    rng = random.Random(args.key_seed)
    rng.shuffle(records)  # val split is the tail: keep it chemotype-mixed
    n = len(records)
    with open(args.out, "wb") as f:
        pickle.dump({"n": n, "seed": args.key_seed, "records": records}, f)
    print(f"wrote {args.out}: {len(zc)} zinclike + {len(uniq)} adapt uniques "
          f"x {args.dup} = {n} records "
          f"(train with --factory {n} --factory-seed {args.key_seed})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
