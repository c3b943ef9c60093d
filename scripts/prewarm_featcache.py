"""Pre-warm the MMT_FEATURE_CACHE featurized-dataset .npz on the host CPU.

Host featurization of a multi-100k-record corpus costs tens of minutes
(CLAUDE.md: ~38 min / 269k records); on the 1-CPU box that time otherwise
lands at the START of a chip training run, idling the TPU. This script
reproduces cmd_train's exact Loader construction (same split, same
augmentation, same FeaturizeOptions — so the features_digest matches) and
runs the featurization + cache write with jax pinned to CPU, so it can run
`nice -n 19` alongside an unrelated chip job.

Usage (mirrors the train CLI flags that affect the digest):
  python scripts/prewarm_featcache.py --factory 291006 --factory-seed 3133 \
      --factory-cache /root/repo/.cache/factory_r3_300k.pkl \
      --val-n 1000 --augment 2 --feature-cache /root/repo/.cache/featcache_r3
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factory", type=int, required=True)
    ap.add_argument("--factory-seed", type=int, default=-1)
    ap.add_argument("--factory-cache", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--val-n", type=int, default=0)
    ap.add_argument("--augment", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--feature-cache", required=True)
    args = ap.parse_args()

    os.environ["MMT_FEATURE_CACHE"] = args.feature_cache
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from multimodalspectraltransformer_tpu import cli as mcli
    from multimodalspectraltransformer_tpu.data.pipeline import (
        FeaturizeOptions,
        Loader,
        augment_records,
    )

    mcfg = mcli._model_cfg(args)
    args.params = ""
    records = mcli._load_records(args, mcfg)
    print(f"loaded {len(records)} records", flush=True)
    n_val = max(1, int(len(records) * 0.1))
    if args.val_n:
        n_val = min(n_val, args.val_n)
    train_records = records[:-n_val]
    n_train = len(train_records)
    opts = FeaturizeOptions(
        blank_percentage=0.0,
        randomize_smiles=False,
        use_given_smiles_form=args.augment > 1,
    )
    if args.augment > 1:
        train_records = augment_records(train_records, args.augment, seed=args.seed)
        print(f"augmented {n_train} -> {len(train_records)} records", flush=True)
    loader = Loader(train_records, mcfg, batch_size=args.batch_size,
                    seed=args.seed, opts=opts)
    t0 = time.time()
    out = loader._featurize_all(max_bytes=1 << 62)
    if out is None:
        print("featurization fell back (stochastic?) — nothing cached", flush=True)
        return 1
    big, kept = out
    import numpy as np

    nbytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(big))
    print(
        f"featurized {len(kept)} rows, {nbytes / (1 << 30):.2f} GiB compact, "
        f"{time.time() - t0:.0f}s; cache dir {args.feature_cache}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
