"""Held-out accuracy report: the BASELINE.md metrics on factory data.

Builds a held-out corpus DISJOINT from the training corpus (different
generator seed, overlaps removed by canonical SMILES), simulates spectra
through the same trained-GNN factory the training data used, evaluates the
trained checkpoint chunk by chunk with the full MNS harness (128-way
fan-out, MW filter, temperature escalation, spectral-error ranking), and
writes ACCURACY.md + ACCURACY_r02.json at the repo root.

Mirrors the reference's 1000-molecule SLURM sweeps
(`scripts/script_PC_0_250.py:821-857`, logs `scripts/ZINC_0_250.txt`) whose
headline numbers are MNS top-rank exact 0.911 / greedy exact 0.624.

Usage (on the chip, after `cli train --factory ...`):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/accuracy_report.py \
        --params runs/r2_full/params.msgpack --n 1000 \
        [--train-seed 11 --train-n 50000] [--heldout-seed 999]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--params", required=True)
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--train-seed", type=int, default=11)
    p.add_argument("--train-n", type=int, default=50000)
    p.add_argument("--extra-exclude", default="",
                   help="additional training corpora the checkpoint has seen, "
                        "as comma-separated 'seed:n' pairs (e.g. '11:150000'); "
                        "a continued checkpoint must exclude EVERY corpus it "
                        "trained on, not just the latest")
    p.add_argument("--exclude-corpus-file", default="",
                   help="comma-separated text files of additional training "
                        "SMILES to exclude exactly (e.g. a MW-banded corpus "
                        "whose generation flags seed:n can't express)")
    p.add_argument("--heldout-seed", type=int, default=999)
    p.add_argument("--records-cache", default="", help="pickle of pre-simulated held-out records (skips on-chip simulation)")
    p.add_argument("--ref-testset", default="",
                   help="directory holding the reference's SHIPPED test CSVs "
                        "(ML_NMR_5M_XL_{13C,HSQC,COSY}_test_10x100.csv + "
                        "ML_NMR_1H_combined_ZINC_test_10x100.csv); evaluates "
                        "on those molecules/spectra instead of factory-"
                        "simulated held-out data — the like-for-like external "
                        "benchmark (reference MMT_website/Runfolder/CSV_files)")
    p.add_argument("--ref-modalities", default="1h,13c,hsqc,cosy",
                   help="comma subset of 1h,13c,hsqc,cosy to load from "
                        "--ref-testset (no IR exists there)")
    p.add_argument("--ref-split", default="all", choices=["all", "eval", "adapt"],
                   help="restrict --ref-testset molecules to one half of the "
                        "stable sample-id hash split used by scripts/"
                        "sgnn_adapt.py: adapted checkpoints MUST be scored "
                        "with --ref-split eval (the 'adapt' half supplied "
                        "training signal)")
    p.add_argument("--sim-weights", default="",
                   help="alternate shift-GNN weights dir for the harness's "
                        "candidate-spectra simulation (e.g. sim/weights_sgnn "
                        "from scripts/sgnn_adapt.py — candidate errors are "
                        "then scored in the same simulator domain as the "
                        "--ref-testset inputs)")
    p.add_argument("--chunk-size", type=int, default=48)
    p.add_argument("--fanout", type=int, default=128)
    p.add_argument("--multinom-runs", type=int, default=10)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--max-len", type=int, default=64)
    p.add_argument("--beam", type=int, default=0,
                   help="also pool the top-K beam hypotheses per molecule "
                        "(beyond the reference's multinomial-only protocol)")
    p.add_argument("--mix", action="store_true",
                   help="also pool the greedy hypothesis per molecule "
                        "(the reference's sampling_method='mix')")
    p.add_argument("--clip-params", default="",
                   help="trained CLIP bundle (rank/clip.save_bundle format): "
                        "score every candidate with the trained ranker and "
                        "report top-k under CLIP-influenced rankings next to "
                        "the protocol error-rank table (reference CLIP usage: "
                        "run_batch_gen_val_MMT_v15_4.py:428-482)")
    p.add_argument("--band-max-len", action="store_true",
                   help="opt-in decode-length banding from target lengths "
                        "(exploratory only: headline comparisons must not "
                        "use ground-truth length information)")
    p.add_argument("--mw-band", default="",
                   help="restrict the held-out corpus to one MW band 'lo,hi' "
                        "(mirrors the reference's per-band n=1000 sweeps, e.g. "
                        "'250,350'); applies at held-out generation time")
    p.add_argument("--out", default="runs/accuracy_r02")
    p.add_argument("--tag", default="r02")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True,
                   help="bf16 decode (default); --no-bf16 for an fp32 run")
    p.add_argument("--small", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (re-aggregation from cached chunks)")
    return p.parse_args()


def main() -> int:
    args = parse_args()
    os.makedirs(args.out, exist_ok=True)

    # Liveness heartbeat from the very start: the pre-records phase
    # (exclusion-corpus regeneration) and the first chunk's TPU compiles can
    # both run >15 min with no output — guarded drivers kill stale+idle.
    import threading

    def _beat():
        t0h = time.time()
        while True:
            time.sleep(120)
            print(f"[acc] heartbeat {time.time()-t0h:.0f}s", flush=True)

    threading.Thread(target=_beat, daemon=True).start()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from multimodalspectraltransformer_tpu.data import molrandom
    from multimodalspectraltransformer_tpu.eval import harness
    from multimodalspectraltransformer_tpu.models import mmt
    from multimodalspectraltransformer_tpu.sim import factory
    from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
    from multimodalspectraltransformer_tpu.utils.config import DecodeConfig, ModelConfig

    # ---- reference shipped test set (external benchmark) ----------------
    ref_records = None
    if args.ref_testset:
        from multimodalspectraltransformer_tpu.chem import api as chem_mod
        from multimodalspectraltransformer_tpu.data import pipeline as dp

        mods = {m.strip() for m in args.ref_modalities.lower().split(",") if m.strip()}
        d = args.ref_testset
        ref_records = dp.load_reference_testset(
            csv_13c=os.path.join(d, "ML_NMR_5M_XL_13C_test_10x100.csv") if "13c" in mods else "",
            csv_hsqc=os.path.join(d, "ML_NMR_5M_XL_HSQC_test_10x100.csv") if "hsqc" in mods else "",
            csv_cosy=os.path.join(d, "ML_NMR_5M_XL_COSY_test_10x100.csv") if "cosy" in mods else "",
            csv_1h=os.path.join(d, "ML_NMR_1H_combined_ZINC_test_10x100.csv") if "1h" in mods else "",
            limit=0 if args.ref_split != "all" else args.n,
        )
        if args.ref_split != "all":
            ref_records = [r for r in ref_records
                           if dp.ref_testset_split(r.sample_id) == args.ref_split]
            if args.n:
                ref_records = ref_records[: args.n]
        # disjointness vs the training corpora is still checked: canonical
        # overlaps are dropped (expected ~0 — the corpora are generated,
        # the test set is ZINC)
        train_set = set(molrandom.random_corpus(args.train_n, seed=args.train_seed))
        for pair in filter(None, args.extra_exclude.split(",")):
            xseed, xn = (int(v) for v in pair.split(":"))
            train_set |= set(molrandom.random_corpus(xn, seed=xseed))
        for path in filter(None, args.exclude_corpus_file.split(",")):
            with open(path) as f:
                train_set |= {ln.strip() for ln in f if ln.strip()}
        n_loaded = len(ref_records)
        kept = []
        n_unparseable = 0
        for r in ref_records:
            can = chem_mod.canonicalize(r.smiles)
            if can is None:
                n_unparseable += 1
                continue
            if can in train_set:
                continue
            kept.append(r)
        n_overlap = n_loaded - n_unparseable - len(kept)
        ref_records = kept
        print(
            f"[acc] reference test set: {n_loaded} rows, "
            f"{n_unparseable} unparseable SMILES dropped, "
            f"{n_overlap} training-corpus overlaps dropped, "
            f"{len(ref_records)} evaluated (modalities: {sorted(mods)})",
            flush=True,
        )

    # ---- held-out corpus, disjoint from the training corpus -------------
    heldout_path = os.path.join(args.out, "heldout_smiles.json")
    if ref_records is not None:
        heldout_path = None  # molecules come from the shipped CSVs
    heldout_key = {
        "train_n": args.train_n, "train_seed": args.train_seed,
        "heldout_seed": args.heldout_seed, "n": args.n,
        "mw_band": args.mw_band, "extra_exclude": args.extra_exclude,
    }
    if args.exclude_corpus_file:
        heldout_key["exclude_corpus_file"] = args.exclude_corpus_file
    if heldout_path is None:
        heldout = [r.smiles for r in ref_records]
        # a --ref-split half holds ~500 molecules: evaluate the whole
        # split rather than tripping the too-few assertion below
        args.n = min(args.n, len(heldout))
    elif os.path.exists(heldout_path):
        with open(heldout_path) as f:
            cached = json.load(f)
        if isinstance(cached, list):
            # legacy format (bare list): trusted as a deliberately pinned
            # held-out set — but it cannot be validated against the flags
            print(f"[acc] using pinned held-out list {heldout_path} (legacy format, unvalidated)")
            heldout = cached[: args.n]
        else:
            mismatch = {k: (v, cached.get(k)) for k, v in heldout_key.items() if cached.get(k) != v}
            if mismatch:
                raise SystemExit(
                    f"[acc] {heldout_path} was built with different corpus flags: {mismatch}; "
                    "delete it or point --out at a fresh directory"
                )
            heldout = cached["smiles"][: args.n]
    else:
        t0 = time.time()
        train_set = set(molrandom.random_corpus(args.train_n, seed=args.train_seed))
        for pair in filter(None, args.extra_exclude.split(",")):
            xseed, xn = (int(v) for v in pair.split(":"))
            train_set |= set(molrandom.random_corpus(xn, seed=xseed))
        for path in filter(None, args.exclude_corpus_file.split(",")):
            with open(path) as f:
                train_set |= {ln.strip() for ln in f if ln.strip()}
        if args.mw_band:
            lo, hi = (float(x) for x in args.mw_band.split(","))
            # heavier bands have a lower yield per draw: oversample harder
            pool = molrandom.random_corpus(args.n * 2, seed=args.heldout_seed,
                                           min_mw=lo, max_mw=hi)
        else:
            pool = molrandom.random_corpus(args.n * 2, seed=args.heldout_seed)
        heldout = [s for s in pool if s not in train_set][: args.n]
        with open(heldout_path, "w") as f:
            json.dump({**heldout_key, "smiles": heldout}, f)
        print(
            f"[acc] held-out corpus: {len(heldout)} molecules "
            f"({len(pool) - len(heldout)} overlaps/surplus dropped) in {time.time()-t0:.0f}s",
            flush=True,
        )
    assert len(heldout) >= args.n * 0.9, "too few held-out molecules"

    mcfg = ModelConfig.small() if args.small else ModelConfig()
    template = mmt.init_params(mcfg, jax.random.PRNGKey(0))
    params = ckpt.import_params_msgpack(template, args.params)

    clip_bundle = None
    if args.clip_params:
        from multimodalspectraltransformer_tpu.rank import clip as clip_mod

        clip_bundle = clip_mod.load_bundle(args.clip_params)
        print(f"[acc] trained CLIP ranker loaded from {args.clip_params}", flush=True)

    sim_kwargs = None
    if args.sim_weights:
        from multimodalspectraltransformer_tpu.sim import distill

        alt = distill.load_shift_weights(args.sim_weights)
        if alt is None:
            raise SystemExit(f"--sim-weights {args.sim_weights}: no weights found")
        sim_kwargs = {"shift_params": alt[0], "shift_model": alt[1], "stats": alt[2]}
        print(f"[acc] candidate simulation uses shift weights from "
              f"{args.sim_weights}", flush=True)

    dcfg = DecodeConfig(
        max_len=args.max_len, fanout=args.fanout,
        multinom_runs=args.multinom_runs, max_temp_rounds=args.rounds,
        mw_filter=True, compute_dtype="bfloat16" if args.bf16 else None,
        beam_candidates=args.beam, greedy_in_pool=args.mix,
        band_max_len=args.band_max_len,
    )

    t0 = time.time()
    import gzip
    import pickle

    def _load_cached_records(path: str):
        """Pre-simulated held-out records from (preferred) a directory or
        .tar.gz of reference-format CSVs (`export_reference_csvs` layout:
        data_{1H,13C,HSQC,COSY}_0.csv + IR_data/<id>.csv — format-stable
        across refactors) or (legacy) a pickle of live SampleRecords."""
        from multimodalspectraltransformer_tpu.data import pipeline as dp

        if path.endswith((".tar.gz", ".tgz")):
            import tarfile
            import tempfile

            tmp = tempfile.mkdtemp(prefix="mmt_heldout_")
            with tarfile.open(path) as tf:
                tf.extractall(tmp, filter="data")
            # the csv bundle may be nested one level deep
            cand = [tmp] + [os.path.join(tmp, d) for d in os.listdir(tmp)]
            path = next(
                d for d in cand
                if os.path.isdir(d) and os.path.exists(os.path.join(d, "data_1H_0.csv"))
            )
        if os.path.isdir(path):
            return dp.load_spectra_csvs(
                csv_1h=os.path.join(path, "data_1H_0.csv"),
                csv_13c=os.path.join(path, "data_13C_0.csv"),
                csv_hsqc=os.path.join(path, "data_HSQC_0.csv"),
                csv_cosy=os.path.join(path, "data_COSY_0.csv"),
                ir_folder=os.path.join(path, "IR_data"),
            )
        with (gzip.open if path.endswith(".gz") else open)(path, "rb") as f:
            return pickle.load(f)

    if ref_records is not None:
        records = ref_records  # spectra come from the shipped CSVs as-is
    elif args.records_cache and os.path.exists(args.records_cache):
        records = _load_cached_records(args.records_cache)
        keep = set(heldout)
        records = [r for r in records if r.smiles in keep][: args.n]
        print(f"[acc] loaded {len(records)} cached records", flush=True)
    else:
        records = factory.simulate_records(heldout)
        if args.records_cache:
            if os.path.isdir(args.records_cache) or args.records_cache.endswith(
                (".tar.gz", ".tgz")
            ):
                from multimodalspectraltransformer_tpu.sim.factory import (
                    export_reference_csvs,
                )

                out_dir = args.records_cache
                if out_dir.endswith((".tar.gz", ".tgz")):
                    import tarfile

                    tmp_dir = out_dir + ".dir"
                    export_reference_csvs(records, tmp_dir)
                    with tarfile.open(out_dir, "w:gz") as tf:
                        tf.add(tmp_dir, arcname="heldout_csv")
                else:
                    export_reference_csvs(records, out_dir)
            else:
                with (gzip.open if args.records_cache.endswith(".gz") else open)(
                    args.records_cache, "wb"
                ) as f:
                    pickle.dump(records, f)
    print(f"[acc] records ready: {len(records)} in {time.time()-t0:.0f}s", flush=True)

    # chunk-result caching must be keyed on the checkpoint too: the same
    # held-out chunk evaluated under a different params file is different work
    with open(args.params, "rb") as f:
        params_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    if args.beam:
        params_hash += f"+beam{args.beam}"
    if args.clip_params:
        # chunks carry per-candidate CLIP scores: a run with(out) or with a
        # DIFFERENT trained ranker is different work
        with open(args.clip_params, "rb") as f:
            params_hash += "+clip" + hashlib.sha256(f.read()).hexdigest()[:8]

    chunks = [records[i : i + args.chunk_size] for i in range(0, len(records), args.chunk_size)]
    mols = []
    topk_results = []
    topk_clip_results = []
    t_all = time.time()
    for ci, chunk in enumerate(chunks):
        path = os.path.join(args.out, f"chunk_{ci:04d}.json")
        # keyed on the molecules, the checkpoint AND the decode config — a
        # re-run with different sweep settings must not reuse stale chunks
        decode_key = (
            f"f{args.fanout}.m{args.multinom_runs}.r{args.rounds}"
            f".l{args.max_len}.b{int(args.bf16)}.x{int(args.mix)}.v2"
            # .v2: decode-length banding + device-reduced seq probs landed in
            # round 4 — r3 chunks are not interchangeable
        )
        if args.ref_testset:
            # same SMILES can be evaluated against factory spectra or the
            # shipped reference spectra — different work, different digest
            decode_key += f".ref[{args.ref_modalities}]"
        digest = hashlib.sha256(
            ("|".join(r.smiles for r in chunk) + "#" + params_hash + "#" + decode_key).encode()
        ).hexdigest()[:16]
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
            if prev.get("digest") == digest:
                mols.extend(prev["molecules"])
                if "top_k_hits_clip" in prev:
                    topk_clip_results.append(
                        (prev["top_k_hits_clip"], prev["top_k_hits_cliponly"], prev["top_k_n"])
                    )
                if "top_k_hits" in prev:
                    topk_results.append((prev["top_k_hits"], prev["top_k_n"]))
                else:
                    # legacy chunk: reconstruct exact hit counts from the
                    # stored fractions (denominator = mols with candidates)
                    n_leg = sum(1 for m in prev["molecules"] if m["n_candidates"])
                    topk_results.append((
                        {k: round(v * n_leg) for k, v in prev.get("top_k", {}).items()},
                        n_leg,
                    ))
                continue
        t0 = time.time()
        results, summary = harness.evaluate_molecules(
            chunk, params, mcfg, dcfg, rng=jax.random.PRNGKey(1000 + ci),
            simulate_errors=True,
            sim_kwargs=sim_kwargs,
            clip_bundle=clip_bundle,
            clip_block=dcfg.multinom_runs if clip_bundle else 0,
        )
        hits, topk_n = harness.top_k_hits(results)
        top_k_hits = {str(k): v for k, v in hits.items()}
        clip_extra = {}
        if clip_bundle is not None:
            # same candidates, three rankings: protocol (error ranks only),
            # error+CLIP rank average, CLIP-only — the delta answers whether
            # a trained ranker moves top-1-by-error
            h3, n3 = harness.top_k_hits(
                results, keys=("hsqc_error", "cosy_error", "clip_loss")
            )
            hc, ncx = harness.top_k_hits(results, keys=("clip_loss",))
            assert n3 == topk_n and ncx == topk_n  # same pool, same filter
            clip_extra = {
                "top_k_hits_clip": {str(k): v for k, v in h3.items()},
                "top_k_hits_cliponly": {str(k): v for k, v in hc.items()},
            }
            topk_clip_results.append(
                (clip_extra["top_k_hits_clip"], clip_extra["top_k_hits_cliponly"], topk_n)
            )
        payload = {
            **clip_extra,
            "chunk": ci,
            "digest": digest,
            "wall_s": time.time() - t0,
            "top_k": {k: (v / topk_n if topk_n else 0.0) for k, v in top_k_hits.items()},
            "top_k_hits": top_k_hits,
            "top_k_n": topk_n,
            "molecules": [
                {
                    "target": r.target,
                    "greedy_exact": r.greedy_exact,
                    "greedy_tanimoto": r.greedy_tanimoto,
                    "mns_exact": r.mns_exact,
                    "best_tanimoto": r.best_tanimoto,
                    "corr_sampling_prob": r.corr_sampling_prob,
                    "n_candidates": len(r.candidates),
                    "rounds": r.sampling_rounds,
                }
                for r in results
            ],
        }
        with open(path, "w") as f:
            json.dump(payload, f)
        mols.extend(payload["molecules"])
        topk_results.append((top_k_hits, topk_n))
        print(
            f"[acc] chunk {ci+1}/{len(chunks)}: {len(results)} mols {payload['wall_s']:.0f}s | "
            f"greedy {summary.greedy_exact:.3f} mns {summary.mns_exact:.3f} "
            f"tani {summary.greedy_tanimoto:.3f}",
            flush=True,
        )

    n = len(mols)
    mean = lambda k: sum(float(m[k]) for m in mols) / max(n, 1)

    # MW-band stratification: the reference's headline numbers are per
    # molecular-weight band (ZINC 0-250 / PubChem 250-350 / 350-500 sweeps,
    # `scripts/ZINC_0_250.txt`, `PC_250_350.txt`, `PC_350_500.txt`), so the
    # apples-to-apples comparison is banded, not pooled.
    from multimodalspectraltransformer_tpu.chem import api as chem_api

    REF_BANDS = {
        (0, 250): {"mns": 0.911, "greedy": 0.624},
        (250, 350): {"mns": 0.483, "greedy": 0.228},
        (350, 500): {"mns": 0.166, "greedy": 0.046},
    }
    bands = {}
    for (lo, hi), ref_b in REF_BANDS.items():
        sel = [m for m in mols if lo <= chem_api.mol_wt(m["target"]) < hi]
        if not sel:
            continue
        bmean = lambda k: sum(float(m[k]) for m in sel) / len(sel)
        bands[f"{lo}-{hi}"] = {
            "n": len(sel),
            "mns_exact": bmean("mns_exact"),
            "greedy_exact": bmean("greedy_exact"),
            "best_tanimoto": bmean("best_tanimoto"),
            "greedy_tanimoto": bmean("greedy_tanimoto"),
            "reference_mns_exact": ref_b["mns"],
            "reference_greedy_exact": ref_b["greedy"],
        }
    # pool top-k by-error accuracy over all chunks: sum(hits) / sum(denominators)
    topk_agg: dict[str, float] = {}
    total_topk_n = sum(cn for _, cn in topk_results)
    for k in ("1", "3", "5", "10", "20"):
        if total_topk_n:
            topk_agg[k] = sum(ch.get(k, 0) for ch, _ in topk_results) / total_topk_n
    topk_clip_agg: dict[str, float] = {}
    topk_cliponly_agg: dict[str, float] = {}
    clip_topk_n = sum(cn for _, _, cn in topk_clip_results)
    for k in ("1", "3", "5", "10", "20"):
        if clip_topk_n:
            topk_clip_agg[k] = sum(c3.get(k, 0) for c3, _, _ in topk_clip_results) / clip_topk_n
            topk_cliponly_agg[k] = sum(cc.get(k, 0) for _, cc, _ in topk_clip_results) / clip_topk_n

    report = {
        "tag": args.tag,
        "n": n,
        "greedy_exact": mean("greedy_exact"),
        "greedy_tanimoto": mean("greedy_tanimoto"),
        "mns_exact": mean("mns_exact"),
        "best_tanimoto": mean("best_tanimoto"),
        "corr_sampling_prob": mean("corr_sampling_prob"),
        "top_k_by_error": topk_agg,
        "top_k_n": total_topk_n,
        **({"top_k_by_error_plus_clip": topk_clip_agg,
            "top_k_by_clip_only": topk_cliponly_agg,
            "clip_params": args.clip_params} if topk_clip_agg else {}),
        "mw_bands": bands,
        "wall_s_total": time.time() - t_all,
        "params": args.params,
        "fanout": args.fanout,
        "multinom_runs": args.multinom_runs,
        "beam_candidates": args.beam,
        "greedy_in_pool": args.mix,
        "heldout_seed": args.heldout_seed,
        "ref_testset": args.ref_testset,
        "ref_modalities": args.ref_modalities if args.ref_testset else "",
        "ref_split": args.ref_split if args.ref_testset else "",
        "sim_weights": args.sim_weights,
        "reference": {
            "zinc_0_250_mns_exact": 0.911,
            "zinc_0_250_greedy_exact": 0.624,
            "source": "scripts/ZINC_0_250.txt (V100, n=1000)",
        },
    }
    with open(os.path.join(REPO, f"ACCURACY_{args.tag}.json"), "w") as f:
        json.dump(report, f, indent=1)

    if args.ref_testset:
        provenance = [
            "**The reference's own shipped test set**: 1000 ZINC molecules",
            "(250-350 Da) with SGNN-simulated spectra from",
            "`MMT_website/Runfolder/CSV_files/` — spectra generated by the",
            f"REFERENCE's simulator, not ours. Modalities: {args.ref_modalities}",
            f"(no IR exists in the set). n = {n} evaluated.",
        ]
    else:
        provenance = [
            f"Held-out factory molecules (seed {args.heldout_seed}, disjoint from the",
            f"training corpus by canonical SMILES), n = {n}.",
        ]
    # Headline comparator: the ref testset IS the 250-350 Da band, so its
    # like-for-like bar is PC_250_350.txt (0.483/0.228), not the 0-250 one
    # (ADVICE r3: r03ref.md understated the comparison in its headline).
    if args.ref_testset:
        cmp_name, cmp_mns, cmp_greedy = "reference (PubChem 250-350, V100)", 0.483, 0.228
    else:
        cmp_name, cmp_mns, cmp_greedy = "reference (ZINC 0-250, V100)", 0.911, 0.624
    md = [
        f"# Accuracy report ({args.tag})",
        "",
        *provenance,
        f"Harness: {args.fanout}-way",
        f"fan-out MNS, {args.multinom_runs} candidates, MW filter, temperature",
        "escalation, trained-GNN spectral simulation, device spectral-error ranking.",
        "",
        f"| metric | value | {cmp_name} |",
        "|---|---|---|",
        f"| MNS top-rank exact recovery | **{report['mns_exact']:.3f}** | {cmp_mns} |",
        f"| greedy exact recovery | **{report['greedy_exact']:.3f}** | {cmp_greedy} |",
        f"| greedy tanimoto (mean) | {report['greedy_tanimoto']:.3f} | {'-' if args.ref_testset else 0.842} |",
        f"| best-candidate tanimoto (mean) | {report['best_tanimoto']:.3f} | {'-' if args.ref_testset else 0.967} |",
        f"| teacher-forced P(sequence) | {report['corr_sampling_prob']:.3f} | - |",
    ]
    for k, v in sorted(topk_agg.items(), key=lambda kv: int(kv[0])):
        # report BOTH denominators: over molecules with a rankable pool
        # (the reference's convention — empty keys dropped before dividing)
        # and over ALL molecules (no-candidate molecules count as misses),
        # so denominator shrinkage can't inflate the by-error rows
        v_all = v * total_topk_n / max(n, 1)
        md.append(
            f"| top-{k} by spectral-error rank | {v:.3f} "
            f"(n={total_topk_n}; over all {n}: {v_all:.3f}) | - |"
        )
    if topk_clip_agg:
        md += [
            "",
            "## CLIP re-ranking (trained ranker: `" + args.clip_params + "`)",
            "",
            "Same candidate pools, three rankings — the delta vs the protocol",
            "error-rank table above is what the trained CLIP ranker buys:",
            "",
            "| k | error ranks only (protocol) | error + CLIP rank avg | CLIP rank only |",
            "|---|---|---|---|",
        ]
        for k in ("1", "3", "5", "10", "20"):
            if k in topk_clip_agg:
                md.append(
                    f"| {k} | {topk_agg.get(k, 0.0):.3f} | {topk_clip_agg[k]:.3f} "
                    f"| {topk_cliponly_agg[k]:.3f} |"
                )
    if bands:
        md += [
            "",
            "## By molecular-weight band",
            "",
            "The reference's sweeps are stratified by MW (ZINC 0-250,",
            "PubChem 250-350 / 350-500); its recovery drops steeply with size,",
            "so the banded rows are the like-for-like comparison:",
            "",
            "| band (Da) | n | MNS exact | ref | greedy exact | ref | best tanimoto |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, b in bands.items():
            md.append(
                f"| {name} | {b['n']} | **{b['mns_exact']:.3f}** | {b['reference_mns_exact']} "
                f"| {b['greedy_exact']:.3f} | {b['reference_greedy_exact']} "
                f"| {b['best_tanimoto']:.3f} |"
            )
    if args.ref_testset:
        tail = [
            "This is the LIKE-FOR-LIKE external benchmark: the query spectra were",
            "simulated by the reference's own SGNN pipeline (shipped in its repo),",
            "so the model is inverting a simulator it never trained on. The",
            "closest reference bar is its 250-350 Da sweep (MNS 0.483, greedy",
            "0.228 — PubChem molecules, SGNN spectra, `scripts/PC_250_350.txt`);",
            "this set is ZINC molecules of the same MW band. Candidate spectral-",
            "error ranking still uses OUR factory simulator for candidate spectra",
            "(the reference re-runs SGNN), so top-k-by-error carries a",
            "simulator-mismatch penalty the reference's own runs don't have.",
        ]
    else:
        tail = [
            "The reference numbers are its own simulated-data regime (SGNN-trained",
            "spectra of ZINC molecules); ours is the equivalent closed loop on the",
            "first-party factory (rule-teacher-distilled GNN spectra of generated",
            "drug-like molecules). Both measure the same thing: can the model invert",
            "its own simulator's spectra back to the structure.",
        ]
    # A committed report must never cite an ephemeral checkpoint path:
    # /tmp and .cache get wiped between rounds, which made four r3 reports
    # unreproducible (VERDICT r3 weak #6). Name the committed weights/ file
    # the run must be exported to instead.
    ckpt_line = args.params
    if args.params.startswith(("/tmp", "/root/repo/.cache", ".cache")):
        ckpt_line = (
            f"{args.params} (EPHEMERAL — export to weights/ with "
            "train.checkpoint.export_params_msgpack and commit it; this "
            "report is not reproducible until that file is in git)"
        )
    md += [
        "",
        f"Checkpoint: `{ckpt_line}`. Reproduce: see this script's docstring.",
        "",
        *tail,
    ]
    # only the headline tag owns the top-level ACCURACY.md; variant passes
    # (banded, --mix protocol, probes) write ACCURACY_<tag>.md instead of
    # clobbering the headline report
    md_name = "ACCURACY.md" if args.tag in ("r02", "r03") else f"ACCURACY_{args.tag}.md"
    with open(os.path.join(REPO, md_name), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
