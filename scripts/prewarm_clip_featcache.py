"""Pre-warm the featurized-dataset cache for the `train-clip` data path.

cmd_train_clip's record pipeline differs from cmd_train's (it holds out the
first --eval-n records and drops SMILES that would truncate under the trg
framing), so its Loader.features_digest differs from the train prewarm and
scripts/prewarm_featcache.py's entry never hits. This script reproduces
cmd_train_clip's exact construction (split -> _drop_truncating_records ->
Loader(order_strategy="weight_sorted")) and writes the .npz with jax pinned
to CPU, so it can run `nice -n 19` alongside a chip job and the CL stage
starts stepping immediately instead of featurizing ~290k records first.

Usage (mirror the train-clip flags that affect the digest):
  nice -n 19 python scripts/prewarm_clip_featcache.py --factory 291006 \
      --factory-seed 3133 --factory-cache .cache/factory_r3_300k.pkl \
      --eval-n 256 --feature-cache .cache/featcache_r3
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
    ap.add_argument("--eval-n", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--feature-cache", required=True)
    args = ap.parse_args()

    os.environ["MMT_FEATURE_CACHE"] = args.feature_cache
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from multimodalspectraltransformer_tpu import cli as mcli
    from multimodalspectraltransformer_tpu.data.pipeline import Loader
    from multimodalspectraltransformer_tpu.train.contrastive import (
        _drop_truncating_records,
    )

    mcfg = mcli._model_cfg(args)
    args.params = ""
    args.synthetic = 0
    records = mcli._load_records(args, mcfg)
    print(f"loaded {len(records)} records", flush=True)
    if args.eval_n > 0:
        records = records[args.eval_n :]
    records = _drop_truncating_records(records, mcfg)
    loader = Loader(
        records, mcfg, args.batch_size, seed=0, order_strategy="weight_sorted"
    )
    print(f"digest {loader.features_digest()}; featurizing...", flush=True)
    t0 = time.time()
    dd = loader.device_dataset()
    print(
        f"done in {time.time()-t0:.0f}s; device_dataset "
        f"{'ok' if dd is not None else 'FELL BACK (see reason above)'}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
