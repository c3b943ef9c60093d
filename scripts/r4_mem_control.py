"""Build the adapt-half MEMORIZATION factory cache (host-side, instant).

Round-3's control grid (ACCURACY_r03adapthalf.md) found the exposure-bias
smoking gun: a checkpoint whose teacher-forced CE on adapt-half ZINC
molecules is 0.083 free-runs to only 0.094 exact on those SAME molecules.
Round 4 attacks the objective with two-pass scheduled sampling
(TrainConfig.ss_prob); this script prepares the isolation experiment's
data — the adapt half of the shipped test set verbatim (real SGNN
spectra), duplicated --dup times into a keyed --factory-cache pickle, so
a short fine-tune memorizes them under the new objective and
`accuracy_report --ref-split adapt` measures free-running recovery.

Success bar (VERDICT r3 task 2): free-running exact >= 0.5 on memorized
molecules (vs 0.094 with plain CE).

Usage:
    python scripts/r4_mem_control.py --out .cache/factory_adapt_mem.pkl \
        [--dup 32] [--key-seed 4242]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side job

from multimodalspectraltransformer_tpu.chem import api as chem_api
from multimodalspectraltransformer_tpu.data.pipeline import (
    load_reference_testset,
    ref_testset_split,
)

REF = "/root/reference/MMT_website/Runfolder/CSV_files"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dup", type=int, default=32)
    ap.add_argument("--key-seed", type=int, default=4242)
    args = ap.parse_args()

    chc = load_reference_testset(
        csv_13c=f"{REF}/ML_NMR_5M_XL_13C_test_10x100.csv",
        csv_hsqc=f"{REF}/ML_NMR_5M_XL_HSQC_test_10x100.csv",
        csv_cosy=f"{REF}/ML_NMR_5M_XL_COSY_test_10x100.csv",
    )
    adapt = []
    for r in chc:
        if ref_testset_split(r.sample_id) != "adapt":
            continue
        can = chem_api.canonicalize(r.smiles)
        if can is None:
            continue
        adapt.append(
            type(r)(r.sample_id, can, h1=r.h1, c13=r.c13,
                    hsqc=r.hsqc, cosy=r.cosy, ir=None)
        )
    records = []
    for d in range(args.dup):
        for r in adapt:
            records.append(
                type(r)(f"{r.sample_id}_m{d}", r.smiles, h1=r.h1, c13=r.c13,
                        hsqc=r.hsqc, cosy=r.cosy, ir=None)
            )
    n = len(records)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump({"n": n, "seed": args.key_seed, "records": records}, f)
    print(f"wrote {args.out}: {len(adapt)} adapt molecules x {args.dup} = {n} "
          f"records (train with --factory {n} --factory-seed {args.key_seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
