"""Export the newest Orbax training snapshot as a bf16 msgpack checkpoint.

A wall-clock-bounded campaign kills `cli train` mid-run; the end-of-run
`params.msgpack` then never gets written, but `--save-every` snapshots live
in <run>/ckpt. This restores the latest step on CPU and exports it in the
same format `export_ckpt` (driver helper) produces, so downstream evals
never depend on a clean training exit.

Usage: python scripts/export_latest.py <run_dir> <out.msgpack.gz>
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    run_dir, out = sys.argv[1], sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
    from multimodalspectraltransformer_tpu.train.state import create_state
    from multimodalspectraltransformer_tpu.utils.config import (
        ModelConfig,
        TrainConfig,
    )

    final = os.path.join(run_dir, "params.msgpack")
    template = mmt.init_params(ModelConfig(), jax.random.PRNGKey(0))
    if os.path.exists(final):
        params = ckpt.import_params_msgpack(template, final)
        step = "final"
    else:
        ckpt_dir = os.path.join(run_dir, "ckpt")
        if not os.path.isdir(ckpt_dir):
            print(f"no params.msgpack and no {ckpt_dir}", file=sys.stderr)
            return 1
        state = create_state(TrainConfig(), template)
        manager = ckpt.CheckpointManager(ckpt_dir)
        restored = manager.restore(state)
        manager.close()
        if restored is None:
            print(f"no restorable step in {ckpt_dir}", file=sys.stderr)
            return 1
        params, step = restored.params, int(restored.step)
    ckpt.export_params_msgpack(params, out, dtype="bfloat16")
    print(f"exported {out} (step {step})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
