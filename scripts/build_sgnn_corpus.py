"""Build the SGNN-adapted training corpus (phase-4 of the r3 campaign).

Mixture written as a keyed --factory-cache pickle for `cli train`:

1. ADAPTED-SIM records — corpus SMILES re-simulated through the
   SGNN-adapted shift GNN (sim/weights_sgnn, from scripts/sgnn_adapt.py),
   MW-filtered toward the reference test set's 250-350 Da band, no IR
   (the reference test CSVs carry none).
2. REAL SGNN records — the ADAPT halves of the shipped test CSVs verbatim
   (their actual SGNN spectra), duplicated --real-dup times: the only true
   target-domain samples in the environment. EVAL-half molecules are
   excluded from every part of the mixture by canonical SMILES.
3. ORIGINAL-DOMAIN slice — a fraction of the in-domain factory records
   (old simulator, with IR) to anchor against catastrophic drift.

Usage:
    python scripts/build_sgnn_corpus.py --out /tmp/factory_sgnn.pkl \
        [--n 120000] [--real-dup 8] [--orig-frac 0.2] [--key-seed 777]

Then:
    cli train --factory <printed total> --factory-seed 777 \
        --factory-cache /tmp/factory_sgnn.pkl --params <phase2> ...
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side job

from multimodalspectraltransformer_tpu.chem import api as chem_api
from multimodalspectraltransformer_tpu.data.pipeline import (
    load_reference_testset,
    ref_testset_split,
)
from multimodalspectraltransformer_tpu.sim import distill
from multimodalspectraltransformer_tpu.sim.factory import simulate_records

REF_DIR = "/root/reference/MMT_website/Runfolder/CSV_files"
SGNN_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "multimodalspectraltransformer_tpu", "sim", "weights_sgnn")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/corpus_r3_300k.txt",
                    help="source SMILES, one per line")
    ap.add_argument("--orig-cache", default="/tmp/factory_r3_300k.pkl",
                    help="keyed pickle of original-domain records for the "
                         "anchor slice (empty to skip)")
    ap.add_argument("--weights", default=SGNN_WEIGHTS)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=120000,
                    help="adapted-sim record count")
    ap.add_argument("--mw-lo", type=float, default=200.0)
    ap.add_argument("--mw-hi", type=float, default=400.0)
    ap.add_argument("--real-dup", type=int, default=8)
    ap.add_argument("--orig-frac", type=float, default=0.2,
                    help="original-domain anchor records as a fraction of --n")
    ap.add_argument("--key-seed", type=int, default=777)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args()

    adapted = distill.load_shift_weights(args.weights)
    if adapted is None:
        print(f"no adapted weights at {args.weights} — run sgnn_adapt.py first",
              file=sys.stderr)
        sys.exit(1)
    shift_params, shift_model, stats = adapted

    # --- reference molecules: adapt halves join the mixture, eval halves
    # are excluded from everything
    chc = load_reference_testset(
        csv_13c=f"{REF_DIR}/ML_NMR_5M_XL_13C_test_10x100.csv",
        csv_hsqc=f"{REF_DIR}/ML_NMR_5M_XL_HSQC_test_10x100.csv",
        csv_cosy=f"{REF_DIR}/ML_NMR_5M_XL_COSY_test_10x100.csv")
    h1 = load_reference_testset(
        csv_1h=f"{REF_DIR}/ML_NMR_1H_combined_ZINC_test_10x100.csv")
    real_adapt, excluded = [], set()
    for r in chc + h1:
        can = chem_api.canonicalize(r.smiles)
        if can is None:
            continue
        excluded.add(can)
        if ref_testset_split(r.sample_id) == "adapt":
            real_adapt.append(
                type(r)(r.sample_id, can, h1=r.h1, c13=r.c13,
                        hsqc=r.hsqc, cosy=r.cosy, ir=None))

    # --- adapted-sim slice
    with open(args.corpus) as f:
        src = [ln.strip() for ln in f if ln.strip()]
    picked = []
    nat = chem_api._native()
    for smi in src:
        if len(picked) >= args.n:
            break
        mw = nat.mol_wt(smi) if nat is not None else chem_api.mol_wt(smi)
        if mw is None or not (args.mw_lo <= mw <= args.mw_hi):
            continue
        if smi in excluded:
            continue
        picked.append(smi)
    print(f"[sgnn-corpus] {len(picked)} corpus SMILES in "
          f"[{args.mw_lo},{args.mw_hi}] Da (asked {args.n}); "
          f"{len(real_adapt)} real adapt records", flush=True)

    records = []
    t0 = time.time()
    for s in range(0, len(picked), args.chunk):
        chunk = picked[s:s + args.chunk]
        recs = simulate_records(
            chunk, sample_ids=[f"a{s + i}" for i in range(len(chunk))],
            shift_params=shift_params, shift_model=shift_model, stats=stats,
            with_ir=False)
        records.extend(recs)
        done = s + len(chunk)
        rate = done / max(time.time() - t0, 1e-9)
        print(f"[sgnn-corpus] simulated {done}/{len(picked)} "
              f"({rate:.0f} mol/s)", flush=True)

    # --- real target-domain records, duplicated
    for d in range(args.real_dup):
        for r in real_adapt:
            records.append(type(r)(f"{r.sample_id}_d{d}", r.smiles, h1=r.h1,
                                   c13=r.c13, hsqc=r.hsqc, cosy=r.cosy, ir=None))

    # --- original-domain anchor slice
    n_orig = int(args.n * args.orig_frac)
    if n_orig and args.orig_cache and os.path.exists(args.orig_cache):
        with open(args.orig_cache, "rb") as f:
            cached = pickle.load(f)
        orig = cached["records"] if isinstance(cached, dict) else cached
        kept = [r for r in orig if r.smiles not in excluded][:n_orig]
        records.extend(kept)
        print(f"[sgnn-corpus] + {len(kept)} original-domain anchor records",
              flush=True)

    payload = {"n": len(records), "seed": args.key_seed, "records": records}
    tmp = args.out + ".partial"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, args.out)
    print(f"[sgnn-corpus] wrote {len(records)} records to {args.out} "
          f"(--factory {len(records)} --factory-seed {args.key_seed})",
          flush=True)


if __name__ == "__main__":
    main()
