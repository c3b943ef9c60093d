"""Control experiment isolating WHY the reference's shipped test set scores ~0.

Two confounded shifts separate it from the in-domain eval:
  (a) SPECTRA: real SGNN outputs vs our adapted-GNN simulation (residual
      13C NN-MAE 2.35 ppm after sgnn_adapt),
  (b) MOLECULES: ZINC 250-350 chemotypes vs molrandom's generated corpus.

This evaluates the SAME adapt-half ZINC molecules as the r03adapthalf
diagnostic, but with spectra SIMULATED by the adapted GNN (1H and IR
blanked to match the shipped 13C/HSQC/COSY modality set). The fine-tuned
checkpoint trained on 100k adapted-sim records:
  high score  -> molecules are decodable; the residual spectra error (a)
                 is what kills the real eval;
  low score   -> the ZINC chemotype distribution (b) itself is outside
                 the training corpus, actionable by corpus enrichment.

Usage: python scripts/control_adapted_sim_eval.py --params <ckpt> [--n 128]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/MMT_website/Runfolder/CSV_files"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--chunk-size", type=int, default=48)
    ap.add_argument("--split", default="adapt", choices=["adapt", "eval"])
    ap.add_argument("--keep-1h", action="store_true")
    ap.add_argument("--sim-weights",
                    default="multimodalspectraltransformer_tpu/sim/weights_sgnn",
                    help="shift-GNN weights dir used BOTH to simulate the "
                         "query spectra and to score candidates (the "
                         "simulator-matched control)")
    ap.add_argument("--out", default="",
                    help="output json path (default "
                         "runs/control_adapted_sim_<split>.json); r4 advisor: "
                         "distinct experiments must never share a filename")
    args = ap.parse_args()

    import jax

    from multimodalspectraltransformer_tpu.data.pipeline import (
        load_reference_testset,
        ref_testset_split,
    )
    from multimodalspectraltransformer_tpu.eval import harness
    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.sim import distill
    from multimodalspectraltransformer_tpu.sim.factory import simulate_records
    from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache
    from multimodalspectraltransformer_tpu.utils.config import DecodeConfig, ModelConfig

    enable_compilation_cache()
    chc = load_reference_testset(
        csv_13c=f"{REF}/ML_NMR_5M_XL_13C_test_10x100.csv",
        csv_hsqc=f"{REF}/ML_NMR_5M_XL_HSQC_test_10x100.csv",
        csv_cosy=f"{REF}/ML_NMR_5M_XL_COSY_test_10x100.csv")
    half = [r for r in chc if ref_testset_split(r.sample_id) == args.split][: args.n]
    print(f"[control] {len(half)} {args.split}-half molecules", flush=True)

    sp, sm, stats = distill.load_shift_weights(args.sim_weights)
    t0 = time.time()
    sims = simulate_records(
        [r.smiles for r in half], sample_ids=[r.sample_id for r in half],
        shift_params=sp, shift_model=sm, stats=stats, with_ir=False)
    if not args.keep_1h:
        sims = [dataclasses.replace(r, h1=None) for r in sims]
    print(f"[control] simulated {len(sims)} records in {time.time()-t0:.0f}s",
          flush=True)

    mcfg = ModelConfig()
    template = mmt.init_params(mcfg, jax.random.PRNGKey(0))
    params = ckpt.import_params_msgpack(template, args.params)
    dcfg = DecodeConfig(max_len=64, fanout=128, multinom_runs=10,
                        max_temp_rounds=10, mw_filter=True,
                        compute_dtype="bfloat16")
    sim_kwargs = {"shift_params": sp, "shift_model": sm, "stats": stats}

    agg: list = []
    for ci in range(0, len(sims), args.chunk_size):
        chunk = sims[ci : ci + args.chunk_size]
        t0 = time.time()
        results, summary = harness.evaluate_molecules(
            chunk, params, mcfg, dcfg, jax.random.PRNGKey(1234 + ci),
            simulate_errors=True, sim_kwargs=sim_kwargs)
        agg.extend(results)
        print(f"[control] chunk {ci // args.chunk_size}: {len(chunk)} mols "
              f"{time.time()-t0:.0f}s | greedy {summary.greedy_exact:.3f} "
              f"mns {summary.mns_exact:.3f}", flush=True)

    import numpy as np

    sim_label = os.path.basename(args.sim_weights.rstrip("/"))
    out = {
        "control": "simulator-matched free-running decode "
                   f"(queries simulated by {sim_label}, same weights score "
                   "candidates; NOT the real-SGNN external benchmark)",
        "script": "scripts/control_adapted_sim_eval.py",
        "split": args.split,
        "n": len(agg),
        "sim_weights": args.sim_weights,
        "spectra": f"{sim_label} (1H blanked)" if not args.keep_1h else sim_label,
        "greedy_exact": float(np.mean([r.greedy_exact for r in agg])),
        "mns_exact": float(np.mean([r.mns_exact for r in agg])),
        "best_tanimoto": float(np.mean([r.best_tanimoto for r in agg])),
        "params": args.params,
    }
    print(json.dumps(out, indent=1))
    out_path = args.out or f"runs/control_adapted_sim_{args.split}.json"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[control] wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
