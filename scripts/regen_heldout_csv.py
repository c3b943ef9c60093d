"""Regenerate the pinned held-out evaluation bundle as reference-format CSVs.

The pinned held-out set is defined by `runs/accuracy_r2b/heldout_smiles.json`
(1000 seed-999 molecules, train-corpus overlaps excluded). The simulated
records for it are deterministic given the chemistry + factory code, so the
format-stable artifact is re-derivable; this script materializes it as the
`export_reference_csvs` tarball `scripts/accuracy_report.py --records-cache`
reads (data_{1H,13C,HSQC,COSY}_0.csv + IR_data/, same layout as the
reference's Runfolder CSVs, e.g.
`MMT_website/Runfolder/CSV_files/ML_NMR_5M_XL_13C_test_10x100.csv` schema).

Usage (host-only, a few minutes):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/regen_heldout_csv.py \
        --smiles runs/accuracy_r2b/heldout_smiles.json \
        --out runs/accuracy_r2b/heldout_csv.tar.gz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smiles", required=True, help="heldout_smiles.json")
    ap.add_argument("--out", required=True, help=".tar.gz path")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from multimodalspectraltransformer_tpu.sim import factory
    from multimodalspectraltransformer_tpu.sim.factory import export_reference_csvs

    with open(args.smiles) as f:
        meta = json.load(f)
    smiles = meta["smiles"]
    print(f"simulating {len(smiles)} held-out molecules...", flush=True)
    t0 = time.time()
    records = factory.simulate_records(smiles)
    print(f"{len(records)} records in {time.time()-t0:.0f}s", flush=True)

    tmp_dir = args.out + ".dir"
    export_reference_csvs(records, tmp_dir)
    tmp = args.out + ".tmp"
    with tarfile.open(tmp, "w:gz") as tf:
        tf.add(tmp_dir, arcname="heldout_csv")
    os.replace(tmp, args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
