"""Tail-average the params of the last K Orbax checkpoints.

Polyak-style checkpoint averaging: the mean of the last few saved
parameter sets usually beats the final step by a point or two of exact
match at zero training cost. The reference saves every checkpoint but
never averages (`MT_functions_v15_4.py:107-112`, save_top_k=-1); this is
a first-party improvement.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/average_checkpoints.py \
        --ckpt-dir runs/r2_cont/ckpt --out runs/r2_cont/params_avg.msgpack \
        [--last 3] [--steps 40000 42500 45000] [--small] [--lr 1e-4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--last", type=int, default=3)
    p.add_argument("--steps", type=int, nargs="*", default=None)
    p.add_argument("--small", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--bf16", action="store_true",
                   help="the run used mixed precision (template must match)")
    p.add_argument("--cpu", action=argparse.BooleanOptionalAction, default=True,
                   help="averaging is host work; keep it off the chip (--no-cpu to allow the TPU backend)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
    from multimodalspectraltransformer_tpu.train.state import create_state
    from multimodalspectraltransformer_tpu.utils.config import ModelConfig, TrainConfig

    mcfg = ModelConfig.small() if args.small else ModelConfig()
    params = mmt.init_params(mcfg, jax.random.PRNGKey(0))
    template = create_state(
        TrainConfig(learning_rate=args.lr, mixed_precision=args.bf16), params
    )

    mgr = ckpt.CheckpointManager(args.ckpt_dir)
    steps = args.steps
    if not steps:
        all_steps = sorted(
            int(d) for d in os.listdir(args.ckpt_dir) if d.isdigit()
        )
        steps = all_steps[-args.last :]
    if not steps:
        print("no checkpoints found", file=sys.stderr)
        return 1
    print(f"averaging steps {steps}")

    acc = None
    for s in steps:
        state = mgr.restore(template, step=s)
        assert state is not None, f"step {s} missing"
        leaves = jax.tree.map(lambda x: np.asarray(x, np.float64), state.params)
        acc = leaves if acc is None else jax.tree.map(np.add, acc, leaves)
    n = float(len(steps))
    avg = jax.tree.map(
        lambda t, a: np.asarray(a / n, np.asarray(t).dtype), template.params, acc
    )
    ckpt.export_params_msgpack(avg, args.out)
    print(f"wrote {args.out} (mean of {len(steps)} checkpoints)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
