"""The REAL-experimental-data workflow on the reference's shipped
AstraZeneca molecules (VERDICT r2 missing #2): 5 molecules with measured
1H/13C/HSQC/COSY + IR spectra.

Reference counterpart: the `/run_model_exp_data` route
(`MMT_website/app.py:831`) driving a checkpoint fine-tuned on real data
through the ``real_data_linear`` blend head (`models_MMT_v15_4.py:546,
965-971`), with real-data fine-tuning freezing everything except chosen
paths (`MT_functions_v15_4.py:124-133`).

Stages here: (1) zero-shot evaluate the trained checkpoint on the real
spectra; (2) reference-style real-data fine-tune — ONLY the
``real_data_linear`` blend head trains (frozen backbone, lr_finetuning
5e-5) on the 5 records with SMILES-randomization augmentation; (3)
re-evaluate through the blend path. Writes REAL_DATA_DEMO.md.

Run on the chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/real_data_demo.py \
        --params weights/mmt_r3.msgpack.gz
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REAL_DIR = "/root/reference/MMT_website/Runfolder/CSV_files/website_real_example"


def evaluate(records, params, mcfg, dcfg, seed=0):
    import jax

    from multimodalspectraltransformer_tpu.eval import harness

    results, summary = harness.evaluate_molecules(
        records, params, mcfg, dcfg, rng=jax.random.PRNGKey(seed),
        simulate_errors=True,
    )
    mols = []
    for r in results:
        ranked = harness.rank_candidates_by_error(r)
        mols.append({
            "target": r.target,
            "greedy": r.greedy,
            "greedy_valid": r.greedy_valid,
            # harness semantics (r4 advisor): greedy_exact canonicalizes
            # both sides; mns_exact is ANY-candidate exact — identical to
            # harness.summarize, so zero-shot and LOO rows are comparable
            "greedy_exact": bool(r.greedy_exact),
            "mns_exact": bool(r.mns_exact),
            "greedy_tanimoto": round(r.greedy_tanimoto, 3),
            "corr_sampling_prob": float(r.corr_sampling_prob),
            "n_candidates": len(r.candidates),
            "best_tanimoto": round(r.best_tanimoto, 3),
            "top3": [
                {"smiles": c.smiles, "tanimoto": round(c.tanimoto, 3),
                 "exact": c.exact}
                for c in ranked[:3]
            ],
        })
    return mols, summary


def agg(mols: list) -> dict:
    """Fold aggregation with the same metric definitions as
    harness.summarize (mean over molecules of the per-result fields)."""
    return {
        "greedy_exact": float(np.mean([m["greedy_exact"] for m in mols])),
        "mns_exact": float(np.mean([m["mns_exact"] for m in mols])),
        "best_tanimoto": float(np.mean([m["best_tanimoto"] for m in mols])),
    }


def measured_sigma(records) -> tuple[float, float]:
    """Per-nucleus NN-MAE of the measured spectra vs our simulator on the
    same molecules — the jitter/warp scale that makes the fine-tune's
    domain randomization match the real measurement deviation."""
    from multimodalspectraltransformer_tpu.sim import factory

    sims = factory.simulate_records([r.smiles for r in records])
    d13, d1 = [], []
    for real, sim in zip(records, sims):
        if real.c13 and sim.c13:
            sc = np.asarray([float(x) for x in sim.c13])
            d13 += [float(np.min(np.abs(sc - float(x)))) for x in real.c13]
        if real.h1 and sim.h1:
            sh = np.asarray([float(p[0]) for p in sim.h1])
            d1 += [float(np.min(np.abs(sh - float(p[0])))) for p in real.h1]
    s13 = float(np.mean(d13)) if d13 else 3.0
    s1 = float(np.mean(d1)) if d1 else 0.2
    return s13, s1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True)
    ap.add_argument("--dir", default=REAL_DIR)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--steps2", type=int, default=400,
                    help="steps for the decoder+blend jitter-matched arm")
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--fanout", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from multimodalspectraltransformer_tpu.data import pipeline as dp
    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
    from multimodalspectraltransformer_tpu.train.loop import run_training
    from multimodalspectraltransformer_tpu.utils.config import (
        DataConfig, DecodeConfig, MMTConfig, ModelConfig, TrainConfig,
    )

    records = dp.load_real_example(args.dir)
    print(f"[real] {len(records)} experimental molecules", flush=True)

    mcfg = ModelConfig()
    template = mmt.init_params(mcfg, jax.random.PRNGKey(0))
    params = ckpt.import_params_msgpack(template, args.params)
    dcfg = DecodeConfig(
        max_len=64, fanout=args.fanout, multinom_runs=10,
        max_temp_rounds=args.rounds, mw_filter=True, compute_dtype="bfloat16",
        greedy_in_pool=True,
    )

    print("[real] zero-shot evaluation...", flush=True)
    zero_mols, zero_sum = evaluate(records, params, mcfg, dcfg)

    # ---- reference-style real-data fine-tune: blend head only, LEAVE-ONE-
    # OUT (VERDICT r3 weak #5/task 8): with 5 molecules, fine-tuning and
    # evaluating on overlapping inputs proves nothing — so each molecule is
    # evaluated under a blend head trained on the OTHER FOUR only, rotated.
    blend_mcfg = dataclasses.replace(mcfg, use_real_data=True)

    def loo_arm(label: str, trainable: tuple, steps: int, **tcfg_extra):
        arm_mols = []
        for i, held in enumerate(records):
            print(f"[real] LOO fold {i} ({label}): fine-tuning on the other "
                  f"{len(records) - 1}...", flush=True)
            fold_train = [r for j, r in enumerate(records) if j != i]
            cfg = MMTConfig(
                model=blend_mcfg,
                train=TrainConfig(
                    learning_rate=args.lr, num_epochs=1000,
                    trainable_only=trainable,
                    save_interval_steps=10**9, mixed_precision=True,
                    **tcfg_extra,
                ),
                data=DataConfig(batch_size=len(fold_train)),
            )
            train_records = dp.augment_records(fold_train, 8, seed=0)
            loader = dp.Loader(
                train_records, blend_mcfg, batch_size=min(16, len(train_records)),
                seed=0, opts=dp.FeaturizeOptions(use_given_smiles_form=True),
            )
            result = run_training(
                cfg, loader, init_params=params, max_steps=steps, log_every=50,
            )
            fold_mols, _ = evaluate([held], result.state.params, blend_mcfg, dcfg)
            arm_mols.extend(fold_mols)
        return arm_mols

    # arm 1: the reference's path — blend head alone
    blend_mols = loo_arm("blend head", ("real_data_linear",), args.steps)
    blend_sum = agg(blend_mols)

    # arm 2 (r4 verdict task 7): decoder + output head + blend head, with
    # device-side jitter/warp matched to the MEASURED deviation of these
    # spectra vs our simulator — the domain-randomization transforms the
    # blank/warp campaign already uses (train/step.py), scaled by data
    s13, s1 = measured_sigma(records)
    print(f"[real] measured sigma: 13C {s13:.2f} ppm, 1H {s1:.3f} ppm",
          flush=True)
    deco_mols = loo_arm(
        "decoder+blend, jitter-matched",
        ("decoder", "fc_out", "real_data_linear"), args.steps2,
        jitter_13c_ppm=s13, jitter_1h_ppm=s1, jitter_gate_p=0.5,
        warp_13c_ppm=s13, warp_1h_ppm=s1,
    )
    deco_sum = agg(deco_mols)

    out = {
        "zero_shot": {"summary": {"greedy_exact": zero_sum.greedy_exact,
                                  "mns_exact": zero_sum.mns_exact,
                                  "best_tanimoto": zero_sum.avg_best_tanimoto},
                      "molecules": zero_mols},
        "real_data_blend": {"summary": blend_sum, "molecules": blend_mols},
        "real_data_decoder": {"summary": deco_sum, "molecules": deco_mols,
                              "sigma_13c_ppm": s13, "sigma_1h_ppm": s1,
                              "finetune_steps": args.steps2},
        "params": args.params,
        "finetune_steps": args.steps,
    }
    with open(os.path.join(REPO, "REAL_DATA_DEMO.json"), "w") as f:
        json.dump(out, f, indent=1)

    md = [
        "# Real experimental data demo (AstraZeneca molecules)",
        "",
        "The reference ships 5 AZ molecules with MEASURED 1H/13C/HSQC/COSY",
        "+ IR spectra (`website_real_example/`). This runs the framework's",
        "experimental-data workflow on them (reference `/run_model_exp_data`,",
        "`MMT_website/app.py:831`): zero-shot evaluation of the trained",
        "checkpoint, then the reference's real-data fine-tuning path — the",
        f"`real_data_linear` blend head trained alone ({args.steps} steps,",
        "frozen backbone, `TrainConfig.trainable_only`), evaluation through",
        "the blended decode (`models_MMT_v15_4.py:965-971`) under a",
        "**leave-one-out protocol**: each molecule is scored by a blend head",
        "fine-tuned on the other four only, so the fine-tune never sees its",
        "evaluation molecule (5 molecules leave no honest alternative).",
        "",
        "Real spectra are far out of the simulated training domain (measured",
        "shifts, solvent effects, peak-picking noise), so exact recovery on 5",
        "molecules is not expected — the demo evidences the full path runs",
        "end-to-end: candidates generated, CLIP/spectral scoring, ranked",
        "output per molecule.",
        "",
        "| stage | greedy exact | MNS exact | mean best tanimoto |",
        "|---|---|---|---|",
        f"| zero-shot | {zero_sum.greedy_exact:.2f} | {zero_sum.mns_exact:.2f} | {zero_sum.avg_best_tanimoto:.3f} |",
        f"| + blend head (LOO) | {blend_sum['greedy_exact']:.2f} | {blend_sum['mns_exact']:.2f} | {blend_sum['best_tanimoto']:.3f} |",
        f"| + decoder+blend, jitter-matched (LOO) | {deco_sum['greedy_exact']:.2f} | {deco_sum['mns_exact']:.2f} | {deco_sum['best_tanimoto']:.3f} |",
        "",
        f"The decoder arm trains decoder/fc_out/blend for {args.steps2} steps",
        "with device-side jitter+warp at the MEASURED deviation of these",
        f"spectra vs our simulator ({s13:.2f} ppm 13C / {s1:.3f} ppm 1H",
        "NN-MAE) — domain randomization centered on the actual sim2real gap.",
        "",
        "## Per-molecule: zero-shot vs leave-one-out arms",
        "",
        "| molecule | zs best tan | blend LOO | decoder LOO | zs top-rank tan |",
        "|---|---|---|---|---|",
    ]
    for mz, m, md2 in zip(zero_mols, blend_mols, deco_mols):
        zs_top = mz["top3"][0]["tanimoto"] if mz["top3"] else "-"
        md.append(
            f"| `{m['target'][:40]}` | {mz['best_tanimoto']} | {m['best_tanimoto']} "
            f"| {md2['best_tanimoto']} | {zs_top} |"
        )
    md += ["", f"Checkpoint: `{args.params}`. Reproduce: this script's docstring."]
    with open(os.path.join(REPO, "REAL_DATA_DEMO.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(out["zero_shot"]["summary"]), flush=True)
    print(json.dumps(out["real_data_blend"]["summary"]), flush=True)
    print(json.dumps(out["real_data_decoder"]["summary"]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
