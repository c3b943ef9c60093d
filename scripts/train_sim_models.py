"""Distill the rule teachers into the factory GNNs and commit the weights.

Usage (on the TPU chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_sim_models.py \
        [--corpus 20000] [--shift-steps 6000] [--ir-steps 4000]

Trains `sim.gnn.NMRShiftModel` on `sim.shift_rules` targets and
`sim.gnn.IRModel` on `sim.ir_rules` targets over a generated drug-like
corpus (`data.molrandom`), then saves msgpack weights + meta JSON into
`multimodalspectraltransformer_tpu/sim/weights/` where
`sim.factory.simulate_records` picks them up as the default predictors
(the SGNN / chemprop-IR replacement, `sgnn_code_pl_v15_4.py:427-454`,
`ir_simulation_v15_4.py:26-35`).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--gnn-steps", type=int, default=4)
    ap.add_argument("--shift-steps", type=int, default=6000)
    ap.add_argument("--ir-steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--skip-ir", action="store_true")
    args = ap.parse_args()

    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from multimodalspectraltransformer_tpu.data import molrandom
    from multimodalspectraltransformer_tpu.sim import distill

    t0 = time.time()
    corpus = molrandom.random_corpus(args.corpus, seed=args.seed)
    print(f"corpus: {len(corpus)} molecules in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    data = distill.build_teacher_dataset(corpus, with_ir=not args.skip_ir)
    print(
        f"teacher dataset: {len(data['n_atoms'])} graphs in {time.time()-t0:.1f}s",
        flush=True,
    )

    t0 = time.time()
    params, stats, report = distill.train_shift_model(
        data,
        hidden=args.hidden,
        steps=args.gnn_steps,
        batch_size=args.batch,
        n_steps=args.shift_steps,
        seed=args.seed,
    )
    report["corpus_size"] = len(corpus)
    report["wall_s"] = round(time.time() - t0, 1)
    distill.save_shift_weights(params, stats, report)
    print("shift model:", json.dumps(report), flush=True)

    if not args.skip_ir:
        t0 = time.time()
        ir_params, ir_report = distill.train_ir_model(
            data,
            hidden=args.hidden,
            steps=args.gnn_steps,
            batch_size=max(64, args.batch // 2),
            n_steps=args.ir_steps,
            seed=args.seed,
        )
        ir_report["corpus_size"] = len(corpus)
        ir_report["wall_s"] = round(time.time() - t0, 1)
        distill.save_ir_weights(ir_params, ir_report)
        print("ir model:", json.dumps(ir_report), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
