"""Command-line interface — the replacement for the reference's SLURM
driver scripts (`scripts/script_PC_0_250.py` and siblings) and execution
dispatcher (`execution_function_v15_4.py`).

Subcommands:
  simulate    SMILES (csv/txt) -> simulated spectra CSVs (the data factory)
  train       train the MMT on spectra CSVs (or --synthetic fixtures)
  train-clip  train the CLIP/BLIP contrastive ranking tower
  evaluate    run the full evaluation harness, print a metrics JSON
  improve     run the self-improvement fine-tuning cycle
  vectorize   build/query a fingerprint vector DB
  serve       run the web serving console (job queue + SSE, port 8083)
  bench       run the throughput benchmark (one JSON line)

Examples:
  python -m multimodalspectraltransformer_tpu.cli simulate --smiles mols.txt --out simdata/
  python -m multimodalspectraltransformer_tpu.cli train --synthetic 256 --steps 100 --out run1/
  python -m multimodalspectraltransformer_tpu.cli evaluate --synthetic 32 --params run1/params.msgpack
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _read_smiles(path: str) -> list[str]:
    if path.endswith(".csv"):
        import pandas as pd

        df = pd.read_csv(path)
        col = "SMILES" if "SMILES" in df.columns else df.columns[0]
        return [str(s) for s in df[col].tolist()]
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def cmd_simulate(args) -> int:
    from .sim import factory

    smiles = _read_smiles(args.smiles)
    records = factory.simulate_records(smiles)
    paths = factory.export_reference_csvs(records, args.out, run_id=args.run_id)
    print(json.dumps({"n_molecules": len(records), "paths": paths}))
    return 0


def _model_cfg(args):
    from .utils.config import ModelConfig

    return ModelConfig.small() if args.small else ModelConfig()


def _load_records(args, mcfg):
    from .data import pipeline as dp

    if getattr(args, "factory", 0):
        import pickle

        from .data import molrandom
        from .sim import factory as sim_factory

        fseed = getattr(args, "factory_seed", -1)
        fseed = fseed if fseed >= 0 else args.seed
        cache = getattr(args, "factory_cache", "")
        if cache and os.path.exists(cache):
            with open(cache, "rb") as f:
                cached = pickle.load(f)
            # keyed caches record their generation params; legacy caches are
            # bare lists — for those only the count is checkable
            if isinstance(cached, dict):
                if cached.get("n") != args.factory or cached.get("seed") != fseed:
                    raise SystemExit(
                        f"--factory-cache {cache} was generated with "
                        f"n={cached.get('n')} seed={cached.get('seed')}, but this run "
                        f"asked for n={args.factory} seed={fseed}; delete the cache "
                        "or point --factory-cache elsewhere"
                    )
                recs = cached["records"]
                # the key records asserted flags, not the actual corpus: a
                # truncated build (crash mid-simulation) would otherwise
                # train silently on far fewer records than requested
                if len(recs) > args.factory or len(recs) < args.factory * 0.8:
                    print(
                        f"[warn] --factory-cache {cache} holds {len(recs)} records "
                        f"but its key asserts n={args.factory} — the cache looks "
                        "truncated or over-full; delete it to regenerate",
                        file=sys.stderr, flush=True,
                    )
                return recs
            if len(cached) > args.factory or len(cached) < args.factory * 0.8:
                print(
                    f"[warn] --factory-cache {cache} holds {len(cached)} records but "
                    f"this run asked for --factory {args.factory} (legacy unkeyed "
                    "cache: seed not checkable) — delete it to regenerate",
                    file=sys.stderr, flush=True,
                )
            return cached
        smiles = molrandom.random_corpus(args.factory, seed=fseed)
        records = sim_factory.simulate_records(
            smiles, sample_ids=[f"f{i}" for i in range(len(smiles))]
        )
        if cache:
            with open(cache, "wb") as f:
                pickle.dump({"n": args.factory, "seed": fseed, "records": records}, f)
        return records
    if args.synthetic:
        return dp.synthetic_dataset(args.synthetic, seed=args.seed)
    return dp.load_spectra_csvs(
        csv_1h=args.csv_1h, csv_13c=args.csv_13c,
        csv_hsqc=args.csv_hsqc, csv_cosy=args.csv_cosy,
        ir_folder=args.ir_folder, limit=args.limit,
    )


def _load_params(args, mcfg):
    import jax

    from .models import mmt
    from .train import checkpoint as ckpt

    template = mmt.init_params(mcfg, jax.random.PRNGKey(args.seed))
    if args.params:
        if not os.path.exists(args.params):
            # an explicitly requested checkpoint must never silently fall
            # back to random init (near-zero metrics would look like a
            # real bad result)
            raise SystemExit(f"--params {args.params!r} does not exist")
        return ckpt.import_params_msgpack(template, args.params)
    if args.torch_checkpoint:
        from .models import convert

        return convert.load_torch_checkpoint(mcfg, args.torch_checkpoint)
    return template


def _start_heartbeat(tag: str) -> None:
    """120 s stdout ticker on a daemon thread: a fresh train/eval executable
    can compile server-side for >15 min with the client silent and CPU-idle
    — exactly the stale+idle predicate guarded drivers kill on (see
    scripts/r4_driver.sh guard() and CLAUDE.md round-4 notes)."""
    import threading
    import time as _t

    def _beat():
        t0 = _t.time()
        while True:
            _t.sleep(120)
            rss = "?"
            try:  # host RSS in the heartbeat: leaks show as a growth curve
                with open("/proc/self/status") as f:
                    for line in f:
                        if line.startswith("VmRSS"):
                            rss = f"{int(line.split()[1]) // 1024}MB"
                            break
            except OSError:
                pass
            print(f"[{tag}] heartbeat {_t.time()-t0:.0f}s rss={rss}", flush=True)

    threading.Thread(target=_beat, daemon=True).start()


def cmd_train(args) -> int:
    from .data.pipeline import Loader
    from .train import checkpoint as ckpt
    from .train.loop import run_training
    from .utils.config import DataConfig, MMTConfig, TrainConfig

    _start_heartbeat("train")
    if getattr(args, "feature_cache", ""):
        os.environ["MMT_FEATURE_CACHE"] = args.feature_cache
    mcfg = _model_cfg(args)
    cfg = MMTConfig(
        model=mcfg,
        train=TrainConfig(
            learning_rate=args.lr, num_epochs=args.epochs,
            save_interval_steps=args.save_every,
            mixed_precision=getattr(args, "bf16", False),
            blank_percentage=getattr(args, "blank", 0.0),
            jitter_1h_ppm=getattr(args, "jitter_1h", 0.0),
            jitter_13c_ppm=getattr(args, "jitter_13c", 0.0),
            warp_1h_ppm=getattr(args, "warp_1h", 0.0),
            warp_13c_ppm=getattr(args, "warp_13c", 0.0),
            ss_prob=getattr(args, "ss_prob", 0.0),
            ss_ramp_steps=getattr(args, "ss_ramp", 2000),
        ),
        data=DataConfig(batch_size=args.batch_size),
    )
    records = _load_records(args, mcfg)
    if not records:
        print(json.dumps({"error": "no records loaded"}))
        return 1
    n_val = max(1, int(len(records) * 0.1))
    if getattr(args, "val_n", 0):
        # a multi-100k corpus doesn't need a 10% validation split: the val
        # pass runs through the host loader every epoch (featurization is
        # re-paid per epoch), so an oversized split buys minutes of host
        # time per epoch and no signal
        n_val = min(n_val, args.val_n)
    n_train = len(records) - n_val
    if n_train < 1:
        print(json.dumps({"error": f"{len(records)} records is too few to split train/val"}))
        return 1
    from .data.pipeline import FeaturizeOptions, augment_records

    train_records = records[:-n_val]
    augment = getattr(args, "augment", 1)
    opts = FeaturizeOptions(
        blank_percentage=getattr(args, "blank_host", 0.0),
        randomize_smiles=getattr(args, "randomize_smiles", False),
        use_given_smiles_form=augment > 1,
    )
    if augment > 1:
        train_records = augment_records(train_records, augment, seed=args.seed)
        print(f"augmented {n_train} -> {len(train_records)} records", file=sys.stderr)
    # clamp AFTER augmentation: the expanded set may well fill the batch
    bs = max(1, min(args.batch_size, len(train_records)))
    if bs != args.batch_size:
        print(f"note: batch size clamped to {bs} ({len(train_records)} training records)", file=sys.stderr)
    loader = Loader(train_records, mcfg, batch_size=bs, seed=args.seed, opts=opts)
    val = Loader(records[-n_val:], mcfg, batch_size=min(bs, n_val), seed=args.seed, drop_remainder=False)

    os.makedirs(args.out, exist_ok=True)
    init = _load_params(args, mcfg) if (args.params or args.torch_checkpoint) else None
    result = run_training(
        cfg, loader, val_loader=val, init_params=init,
        metrics_path=os.path.join(args.out, "metrics.jsonl"),
        checkpoint_dir=os.path.join(args.out, "ckpt"),
        seed=args.seed, max_steps=args.steps,
        gen_metrics_every=args.gen_metrics_every,
        log_every=getattr(args, "log_every", 1),
    )
    ckpt.export_params_msgpack(result.state.params, os.path.join(args.out, "params.msgpack"))
    print(json.dumps({
        "steps": result.steps,
        "train_loss": result.train_loss,
        "val_loss": result.val_loss,
        "params": os.path.join(args.out, "params.msgpack"),
    }))
    return 0


def cmd_evaluate(args) -> int:
    import jax

    from .eval.harness import evaluate_molecules
    from .utils.config import DecodeConfig

    mcfg = _model_cfg(args)
    records = _load_records(args, mcfg)
    params = _load_params(args, mcfg)
    dcfg = DecodeConfig(
        max_len=args.max_len, fanout=args.fanout,
        multinom_runs=args.multinom_runs, max_temp_rounds=args.rounds,
        mw_filter=not args.no_mw_filter,
        beam_candidates=args.beam_candidates, greedy_in_pool=args.mix,
    )
    clip_bundle = None
    if getattr(args, "clip_params", ""):
        from .rank import clip as clip_mod

        clip_bundle = clip_mod.load_bundle(args.clip_params)
    results, summary = evaluate_molecules(
        records, params, mcfg, dcfg, jax.random.PRNGKey(args.seed),
        simulate_errors=not args.no_sim_errors,
        clip_bundle=clip_bundle,
        clip_block=dcfg.multinom_runs if clip_bundle else 0,
    )
    out = dataclasses.asdict(summary)
    out["top_k_accuracy"] = {str(k): v for k, v in summary.top_k_accuracy.items()}
    print(json.dumps(out))
    if args.results_out:
        import pickle

        with open(args.results_out, "wb") as f:
            pickle.dump(results, f)
    return 0


def cmd_improve(args) -> int:
    import jax

    _start_heartbeat("improve")

    from .sim import factory
    from .train.improvement_cycle import ImprovementCycleConfig, run_improvement_cycle
    from .train.molgen import MolGenConfig
    from .train import checkpoint as ckpt
    from .utils.config import DataConfig, MMTConfig, TrainConfig

    mcfg = _model_cfg(args)
    cfg = MMTConfig(
        model=mcfg,
        train=TrainConfig(learning_rate=args.lr, num_epochs=1, save_interval_steps=10_000),
        data=DataConfig(batch_size=args.batch_size),
    )
    smiles = _read_smiles(args.smiles)
    targets = factory.simulate_records(smiles)
    params = _load_params(args, mcfg)
    icfg = ImprovementCycleConfig(
        max_cycles=args.cycles,
        ic_threshold=args.threshold,
        molgen=MolGenConfig(generations_per_target=args.generations),
        steps_per_cycle=args.steps,
        include_targets_in_training=args.include_targets,
        model_neighbors=args.model_neighbors,
    )
    os.makedirs(args.out, exist_ok=True)
    cycles_path = os.path.join(args.out, "cycles.jsonl")

    def _persist(r):
        # long IC runs can be cut off by a wall-clock budget — append each
        # cycle's convergence point as it lands so the curve survives
        with open(cycles_path, "a") as f:
            f.write(json.dumps({
                "cycle": r.cycle, "n_augmented": r.n_augmented,
                "train_loss": r.train_loss,
                "corr_sampling_prob": r.summary.corr_sampling_prob,
                "greedy_exact": r.summary.greedy_exact,
            }) + "\n")

    new_params, reports = run_improvement_cycle(cfg, targets, params, icfg,
                                                on_cycle=_persist)
    ckpt.export_params_msgpack(new_params, os.path.join(args.out, "params.msgpack"))
    print(json.dumps([
        {"cycle": r.cycle, "n_augmented": r.n_augmented, "train_loss": r.train_loss,
         "corr_sampling_prob": r.summary.corr_sampling_prob,
         "greedy_exact": r.summary.greedy_exact}
        for r in reports
    ]))
    return 0


def cmd_bench(args) -> int:
    # explicit flags win over any stale BENCH_* exports in the shell
    os.environ["BENCH_BATCH"] = str(args.batch)
    os.environ["BENCH_BEAM"] = str(args.beam)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()
    return 0


def cmd_serve(args) -> int:
    from .serve import ServerState, serve
    mcfg = _model_cfg(args)
    state = ServerState(model_cfg=mcfg)
    if args.params:
        state.load_checkpoint(args.params)
    serve(port=args.port, state=state)
    return 0


def cmd_train_clip(args) -> int:
    import jax

    _start_heartbeat("train-clip")

    # Feature cache: explicit --feature-cache wins; otherwise honor a
    # "<factory-cache>.featcache" sidecar (one line: the prewarmed cache dir)
    # so already-launched drivers with fixed argv still skip the ~40 min
    # host featurization of a 300k corpus.
    fc = getattr(args, "feature_cache", "")
    if not fc:
        sidecar = (getattr(args, "factory_cache", "") or "") + ".featcache"
        if sidecar != ".featcache" and os.path.exists(sidecar):
            with open(sidecar) as f:
                fc = f.read().strip()
            print(f"[train-clip] feature cache via sidecar: {fc}", flush=True)
    if fc:
        os.environ["MMT_FEATURE_CACHE"] = fc

    from .data import pipeline as dp
    from .models import mmt
    from .train import contrastive
    from .utils.config import MMTConfig

    mcfg = _model_cfg(args)
    cfg = MMTConfig(model=mcfg)
    records = _load_records(args, mcfg)
    if args.params:
        from .train import checkpoint as ckpt

        template = mmt.init_params(mcfg, jax.random.PRNGKey(0))
        params = ckpt.import_params_msgpack(template, args.params)
    else:
        params = mmt.init_params(mcfg, jax.random.PRNGKey(args.seed))
    heldout = []
    if args.eval_n > 0:
        heldout, records = records[: args.eval_n], records[args.eval_n :]
    if args.out:
        os.makedirs(args.out, exist_ok=True)
    # runtime step override: an already-launched guarded driver has its
    # argv baked in (retry re-invokes the expanded command line), so a
    # too-ambitious --steps can only be corrected via this file. Scoped to
    # the RUN directory (r4 advisor: a stale CWD-level override silently
    # replaced --steps for unrelated future runs).
    steps = args.steps
    override_path = os.path.join(args.out, "clip_steps_override") if args.out else ""
    if override_path and os.path.exists(override_path):
        with open(override_path) as f:
            steps = int(f.read().strip())
        print(f"[train-clip] steps override: {args.steps} -> {steps} "
              f"({override_path})", flush=True)
    ccfg = contrastive.ContrastiveConfig(
        learning_rate=args.lr, num_epochs=args.epochs,
        batch_size=args.batch_size, max_steps=steps,
        log_every=getattr(args, "log_every", 50),
        save_every=getattr(args, "save_every", 500),
    )
    variables, logger = contrastive.train_contrastive(
        cfg, params, records, tower=args.tower, ccfg=ccfg,
        metrics_path=os.path.join(args.out, "metrics.jsonl") if args.out else None,
        checkpoint_path=os.path.join(args.out, f"{args.tower}.msgpack") if args.out else None,
    )
    if args.out and args.tower == "clip":
        # bundle (msgpack + config sidecar) so harness/bench can reload
        # without knowing the training-time CLIPConfig
        from .rank import clip as clip_mod

        _, tcfg, _ = contrastive.make_tower("clip")
        clip_mod.save_bundle(os.path.join(args.out, "clip.msgpack"), variables, tcfg)
    last = [r for r in logger.history if f"{args.tower}_loss" in r]
    out = {"steps": len(last), "final_loss": last[-1][f"{args.tower}_loss"] if last else None}
    if heldout:
        out["retrieval"] = contrastive.retrieval_accuracy(
            variables, cfg, params, heldout, tower=args.tower,
            batch_size=args.batch_size,
        )
    print(json.dumps(out))
    return 0


def cmd_vectorize(args) -> int:
    from .eval import vectordb

    smiles = _read_smiles(args.smiles)
    db = vectordb.build_morgan_db(smiles, n_bits=args.bits)
    db.save(args.out)
    if args.csv:
        db.export_csv(args.out + ".csv")
    print(json.dumps({"n": len(db), "out": args.out}))
    if args.query:
        scores, idx, names, valid = vectordb.query_smiles(db, [args.query], k=args.k)
        if not valid[0]:
            print(json.dumps({"query": args.query, "error": "query SMILES is invalid"}))
            return 1
        print(json.dumps({"query": args.query, "hits": names[0], "scores": scores[0].tolist()}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mmst", description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--small", action="store_true", help="2-layer model for quick runs")
        sp.add_argument("--params", default="", help="params.msgpack to load")
        sp.add_argument("--torch-checkpoint", default="", help="reference .pth/.ckpt to convert")
        sp.add_argument("--synthetic", type=int, default=0, help="use N synthetic molecules")
        sp.add_argument("--factory", type=int, default=0,
                        help="generate N drug-like molecules and simulate real factory spectra")
        sp.add_argument("--factory-seed", type=int, default=-1, help="corpus seed (default: --seed)")
        sp.add_argument("--factory-cache", default="", help="pickle cache for factory records")
        sp.add_argument("--csv-1h", default="")
        sp.add_argument("--csv-13c", default="")
        sp.add_argument("--csv-hsqc", default="")
        sp.add_argument("--csv-cosy", default="")
        sp.add_argument("--ir-folder", default="")
        sp.add_argument("--limit", type=int, default=0)

    sp = sub.add_parser("simulate", help="SMILES -> simulated spectra CSVs")
    sp.add_argument("--smiles", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--run-id", default="0")
    sp.set_defaults(fn=cmd_simulate)

    sp = sub.add_parser("train", help="train the MMT")
    add_common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--epochs", type=int, default=10)
    sp.add_argument("--steps", type=int, default=0)
    sp.add_argument("--batch-size", type=int, default=64)
    sp.add_argument("--save-every", type=int, default=1000)
    sp.add_argument("--gen-metrics-every", type=int, default=0)
    sp.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (fp32 master params) — ~2x step throughput")
    sp.add_argument("--val-n", type=int, default=0,
                    help="cap the validation split at N records (default: 10%% of the corpus)")
    sp.add_argument("--log-every", type=int, default=10,
                    help="metrics cadence; every log forces a device sync")
    sp.add_argument("--randomize-smiles", action="store_true",
                    help="per-epoch SMILES-randomization augmentation (reference smi_randomizer; forces host featurization)")
    sp.add_argument("--augment", type=int, default=1,
                    help="pre-expanded SMILES-variant augmentation factor (deterministic; keeps the HBM-resident dataset path)")
    sp.add_argument("--blank", type=float, default=0.0,
                    help="random modality blanking percentage (reference "
                         "blank_percentage), applied ON DEVICE per batch — "
                         "keeps the HBM-resident dataset path")
    sp.add_argument("--jitter-1h", type=float, default=0.0,
                    help="device-side per-peak 1H ppm jitter sigma (sim2real "
                         "domain randomization; half the samples per batch)")
    sp.add_argument("--jitter-13c", type=float, default=0.0,
                    help="device-side per-peak 13C ppm jitter sigma")
    sp.add_argument("--warp-1h", type=float, default=0.0,
                    help="device-side smooth 1H-axis warp sigma (ppm), "
                         "applied consistently to 1H/HSQC-H/COSY coordinates "
                         "(structured sim2real randomization: models a "
                         "different simulator, not per-peak noise)")
    sp.add_argument("--warp-13c", type=float, default=0.0,
                    help="device-side smooth 13C-axis warp sigma (ppm), "
                         "applied consistently to 13C peaks and HSQC "
                         "C-coordinates")
    sp.add_argument("--ss-prob", type=float, default=0.0,
                    help="two-pass scheduled-sampling mix-in probability "
                         "(exposure-bias mitigation; decoder inputs are "
                         "replaced by the model's own sampled predictions "
                         "at this ramped per-position rate)")
    sp.add_argument("--ss-ramp", type=int, default=2000,
                    help="steps to ramp --ss-prob from 0 to its full value")
    sp.add_argument("--blank-host", type=float, default=0.0,
                    help="legacy host-side blanking during featurization "
                         "(stochastic featurization; forces the slow host "
                         "data path — prefer --blank)")
    sp.add_argument("--feature-cache", default="",
                    help="directory for the featurized-dataset disk cache "
                         "(sets MMT_FEATURE_CACHE; skips the multi-minute host "
                         "featurization on repeat runs over the same corpus)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("evaluate", help="run the evaluation harness")
    add_common(sp)
    sp.add_argument("--max-len", type=int, default=64)
    sp.add_argument("--fanout", type=int, default=128)
    sp.add_argument("--multinom-runs", type=int, default=10)
    sp.add_argument("--rounds", type=int, default=20)
    sp.add_argument("--no-mw-filter", action="store_true")
    sp.add_argument("--no-sim-errors", action="store_true")
    sp.add_argument("--beam-candidates", type=int, default=0,
                    help="also pool the top-K beam hypotheses per molecule")
    sp.add_argument("--clip-params", default="",
                    help="trained CLIP bundle (msgpack + .json sidecar from "
                         "train-clip) to score candidates with")
    sp.add_argument("--mix", action="store_true",
                    help="also pool the greedy hypothesis (reference sampling_method='mix')")
    sp.add_argument("--results-out", default="")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("improve", help="self-improvement fine-tuning cycle")
    add_common(sp)
    sp.add_argument("--smiles", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--lr", type=float, default=5e-5)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--cycles", type=int, default=5)
    sp.add_argument("--threshold", type=float, default=0.6)
    sp.add_argument("--generations", type=int, default=30)
    sp.add_argument("--steps", type=int, default=0)
    sp.add_argument("--include-targets", action="store_true")
    sp.add_argument("--model-neighbors", action="store_true",
                    help="also sample neighbors from the MMT decoder itself")
    sp.set_defaults(fn=cmd_improve)

    sp = sub.add_parser("bench", help="throughput benchmark")
    sp.add_argument("--batch", type=int, default=128)
    sp.add_argument("--beam", type=int, default=5)
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("serve", help="web serving console (port 8083)")
    sp.add_argument("--port", type=int, default=8083)
    sp.add_argument("--small", action="store_true")
    sp.add_argument("--params", default="")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("train-clip", help="train the CLIP/BLIP ranking tower")
    add_common(sp)
    sp.add_argument("--tower", choices=("clip", "blip"), default="clip")
    sp.add_argument("--out", default="")
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--epochs", type=int, default=3)
    sp.add_argument("--steps", type=int, default=0)
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--eval-n", type=int, default=0,
                    help="hold out the first N records and report contrastive retrieval R@1/R@5 after training")
    sp.add_argument("--log-every", type=int, default=50,
                    help="metric materialization cadence; every float(loss) is a "
                         "device sync (~32 ms RPC on the tunneled backend)")
    sp.add_argument("--save-every", type=int, default=500,
                    help="tower+optimizer snapshot cadence (resume on retry)")
    sp.add_argument("--feature-cache", default="",
                    help="featurized-dataset disk cache dir (sets "
                         "MMT_FEATURE_CACHE; falls back to a "
                         "<factory-cache>.featcache sidecar file)")
    sp.set_defaults(fn=cmd_train_clip)

    sp = sub.add_parser("vectorize", help="build a fingerprint vector DB")
    sp.add_argument("--smiles", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--bits", type=int, default=512)
    sp.add_argument("--csv", action="store_true", help="also export reference-format CSV")
    sp.add_argument("--query", default="", help="optionally query one SMILES")
    sp.add_argument("--k", type=int, default=10)
    sp.set_defaults(fn=cmd_vectorize)
    return p


def main(argv=None) -> int:
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()  # repeat CLI runs skip minutes of XLA compiles
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
