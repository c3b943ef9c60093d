"""Adapt the distilled shift GNN to the reference's SGNN simulator.

The reference's accuracy numbers are measured on SGNN-simulated spectra
(`scripts/ZINC_0_250.txt` — internally the `ZINC_250_350` experiment — and
the shipped test CSVs under `MMT_website/Runfolder/CSV_files/`). Our
factory's rule-distilled GNN disagrees with SGNN systematically (13C
nearest-peak MAE 2-3.5 ppm, with structured outliers up to ~27 ppm, e.g.
CHF2 carbons), which is why a checkpoint trained on factory spectra scores
~0 zero-shot on the reference test set: i.i.d. jitter augmentation cannot
model a *different simulator function*.

The only in-environment observations of the SGNN function are the shipped
test CSVs themselves (1000 molecules with 13C/HSQC/COSY + a disjoint 1000
with 1H). This script turns half of them into atom-level supervision:

1. SPLIT — each test file's molecules are split 50/50 by a stable hash of
   the sample id: the ADAPT half supplies training signal, the EVAL half is
   never touched by training. All adapted-model accuracy numbers must be
   reported on the EVAL half only (accuracy_report --ref-split eval).
2. ASSIGN — SGNN peak lists are unassigned; we align them to atoms with a
   monotone many-to-one DP (sorted predicted shifts vs sorted peaks; the
   sorted order is the optimal 1D transport). 13C lists are
   symmetry-consolidated (n_peaks <= n_carbons), so peaks may host several
   atoms. HSQC H-coordinates are attached to atoms through their aligned
   13C peak. The 1H-only file is clustered into multiplets (gap > 0.03 ppm)
   whose intensity-weighted centroids align to symmetry-averaged predicted
   H shifts (skip-allowed DP: overlapped multiplets merge clusters).
3. FINE-TUNE — sim.distill.train_shift_model warm-started from the
   committed sim/weights checkpoint, low LR, targets = assigned SGNN peaks.
   Adapted weights land in sim/weights_sgnn/ (the in-domain default
   sim/weights/ is untouched).
4. VALIDATE — peak-level NN-MAE / Hungarian HSQC distance on the EVAL
   half, before vs after (no gradient ever saw those molecules).

Usage:
    python scripts/sgnn_adapt.py [--steps 3000] [--lr 3e-4] \
        [--out multimodalspectraltransformer_tpu/sim/weights_sgnn] \
        [--report runs/sgnn_adapt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    # host-side job: keep the chip free. Guarded so importers (e.g.
    # accuracy_report --ref-split pulling split_of) keep their own backend.
    import jax

    jax.config.update("jax_platforms", "cpu")

from multimodalspectraltransformer_tpu.chem import api as chem_api
from multimodalspectraltransformer_tpu.chem.smiles import parse_smiles
from multimodalspectraltransformer_tpu.data.pipeline import load_reference_testset
from multimodalspectraltransformer_tpu.sim import distill, reconstruct
from multimodalspectraltransformer_tpu.sim.factory import (
    _predict_chunked,
    default_shift_model,
)

REF_DIR = "/root/reference/MMT_website/Runfolder/CSV_files"

# assignment gates: alignments farther than this from the prediction are
# treated as wrong correspondences and dropped from the training targets
GATE_C_PPM = 12.0
GATE_H_PPM = 1.2
CLUSTER_GAP_PPM = 0.03  # J=7 Hz at 400 MHz is 0.0175 ppm between lines


from multimodalspectraltransformer_tpu.data.pipeline import ref_testset_split as split_of  # noqa: E402


def monotone_align(pred_sorted: np.ndarray, peaks_sorted: np.ndarray,
                   skip_pen: float = np.inf) -> list:
    """Monotone many-to-one alignment: every prediction maps to one peak,
    peaks host >=1 prediction (or are skipped at `skip_pen` each — for 1H
    clusters that belong to no C-H prediction, e.g. exchangeable protons).
    Returns per-prediction peak index (into peaks_sorted), or None for
    predictions aligned to skipped peaks (never happens: predictions are
    never skipped; only peaks are). O(n*m) DP."""
    n, m = len(pred_sorted), len(peaks_sorted)
    if m == 0 or n == 0:
        return [None] * n
    INF = float("inf")
    cost = np.abs(pred_sorted[:, None] - peaks_sorted[None, :])
    f = np.full((n + 1, m + 1), INF)
    f[0][0] = 0.0
    # choice[i][j]: 0 = atom i joins peak j, 1 = atom i starts peak j,
    # 2 = peak j skipped
    choice = np.zeros((n + 1, m + 1), np.int8)
    for j in range(1, m + 1):
        if skip_pen < INF and f[0][j - 1] < INF:
            f[0][j] = f[0][j - 1] + skip_pen
            choice[0][j] = 2
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            best, arg = INF, 0
            if f[i - 1][j] < INF:
                v = f[i - 1][j] + cost[i - 1][j - 1]
                if v < best:
                    best, arg = v, 0
            if f[i - 1][j - 1] < INF:
                v = f[i - 1][j - 1] + cost[i - 1][j - 1]
                if v < best:
                    best, arg = v, 1
            if skip_pen < INF and f[i][j - 1] < INF:
                v = f[i][j - 1] + skip_pen
                if v < best:
                    best, arg = v, 2
            f[i][j] = best
            choice[i][j] = arg
    if not np.isfinite(f[n][m]):
        return [None] * n
    out: list = [None] * n
    i, j = n, m
    while i > 0 or j > 0:
        c = choice[i][j]
        if c == 2:
            j -= 1
        elif c == 1:
            out[i - 1] = j - 1
            i -= 1
            j -= 1
        else:
            out[i - 1] = j - 1
            i -= 1
    return out


def predict_all(records, params, model, stats):
    """Per-record (shift_c[n], shift_h[n], mol) with the given GNN."""
    mols = []
    keep = []
    for r in records:
        try:
            can = chem_api.canonicalize(r.smiles)
            mol = parse_smiles(can)
        except Exception:
            continue
        mols.append(mol)
        keep.append(r)
    outs, _ = _predict_chunked(params, model, mols)
    res = []
    for r, mol, o in zip(keep, mols, outs):
        if o is None:
            continue
        n = mol.num_atoms
        sc = o[0][:n] * stats.std_c + stats.mean_c
        sh = o[1][:n] * stats.std_h + stats.mean_h
        res.append((r, mol, sc, sh))
    return res


def cluster_multiplets(h1_peaks):
    """[(ppm, intensity)] -> [(centroid, total_intensity, n_lines)] by
    gap clustering (reference multiplets are rendered at 400 MHz; lines
    within one multiplet sit < ~0.02 ppm apart)."""
    pts = sorted((float(p[0]), float(p[1])) for p in h1_peaks)
    clusters = []
    cur = [pts[0]]
    for p in pts[1:]:
        if p[0] - cur[-1][0] > CLUSTER_GAP_PPM:
            clusters.append(cur)
            cur = [p]
        else:
            cur.append(p)
    clusters.append(cur)
    out = []
    for c in clusters:
        w = sum(i for _, i in c)
        if w <= 0:
            continue
        out.append((sum(s * i for s, i in c) / w, w, len(c)))
    return out


def build_assignment_dataset(chc_records, h1_records, params, model, stats,
                             max_nodes: int = 64):
    """ADAPT-half records -> compact GNN training arrays with SGNN-assigned
    per-atom targets. Returns (data dict, stats dict)."""
    nodes, edges, n_atoms = [], [], []
    tcs, mcs, ths, mhs = [], [], [], []
    info = {"mols": 0, "c_labels": 0, "h_hsqc_labels": 0, "h_clust_labels": 0,
            "c_gated": 0, "h_gated": 0, "skipped": 0}

    def add_record(mol, t_c, m_c, t_h, m_h):
        compact = distill.featurize_compact(mol, max_nodes)
        if compact is None:
            info["skipped"] += 1
            return
        nodes.append(compact[0])
        edges.append(compact[1])
        n_atoms.append(compact[2])
        tcs.append(t_c)
        mcs.append(m_c)
        ths.append(t_h)
        mhs.append(m_h)
        info["mols"] += 1

    # --- 13C/HSQC file ------------------------------------------------
    for r, mol, sc, sh in predict_all(chc_records, params, model, stats):
        if mol.num_atoms > max_nodes:
            info["skipped"] += 1
            continue
        t_c = np.zeros(max_nodes, np.float32)
        m_c = np.zeros(max_nodes, np.uint8)
        t_h = np.zeros(max_nodes, np.float32)
        m_h = np.zeros(max_nodes, np.uint8)
        carbons = [i for i, a in enumerate(mol.atoms) if a.symbol == "C"]
        if r.c13:
            peaks = np.array(sorted(float(x) for x in r.c13))
            order = sorted(carbons, key=lambda i: sc[i])
            if len(peaks) <= len(order):
                assign = monotone_align(
                    np.array([sc[i] for i in order]), peaks)
                for k, i in enumerate(order):
                    j = assign[k]
                    if j is None:
                        continue
                    if abs(sc[i] - peaks[j]) > GATE_C_PPM:
                        info["c_gated"] += 1
                        continue
                    t_c[i] = peaks[j]
                    m_c[i] = 1
                    info["c_labels"] += 1
        if r.hsqc and m_c.any():
            # attach each HSQC H coordinate to the atoms whose assigned 13C
            # peak matches its C coordinate
            by_peak: dict = {}
            for i in carbons:
                if m_c[i] and mol.total_h(i) > 0:
                    by_peak.setdefault(round(float(t_c[i]), 4), []).append(i)
            contrib: dict = {}
            for p in r.hsqc:
                hv, cv = float(p[0]), float(p[1])
                if not by_peak:
                    break
                keys = np.array(list(by_peak.keys()))
                k = keys[np.abs(keys - cv).argmin()]
                if abs(k - cv) > 0.5:
                    continue
                for i in by_peak[k]:
                    contrib.setdefault(i, []).append(hv)
            for i, hs in contrib.items():
                hv = float(np.mean(hs))
                if abs(sh[i] - hv) > GATE_H_PPM:
                    info["h_gated"] += 1
                    continue
                t_h[i] = hv
                m_h[i] = 1
                info["h_hsqc_labels"] += 1
        if m_c.any() or m_h.any():
            add_record(mol, t_c, m_c, t_h, m_h)
        else:
            info["skipped"] += 1

    # --- 1H-only file --------------------------------------------------
    for r, mol, sc, sh in predict_all(h1_records, params, model, stats):
        if not r.h1 or mol.num_atoms > max_nodes:
            info["skipped"] += 1
            continue
        t_c = np.zeros(max_nodes, np.float32)
        m_c = np.zeros(max_nodes, np.uint8)
        t_h = np.zeros(max_nodes, np.float32)
        m_h = np.zeros(max_nodes, np.uint8)
        hb = [i for i, a in enumerate(mol.atoms)
              if a.symbol == "C" and mol.total_h(i) > 0]
        if not hb:
            info["skipped"] += 1
            continue
        # symmetry-averaged prediction per environment (one multiplet per
        # symmetry class in the reference's generator)
        avg = reconstruct._sym_averaged(mol, sh, hb)
        env: dict = {}
        for i in hb:
            env.setdefault(round(avg[i], 6), []).append(i)
        env_shifts = np.array(sorted(env.keys()))
        clusters = cluster_multiplets(r.h1)
        centroids = np.array([c[0] for c in clusters])
        # skip-allowed: extra centroids (diastereotopic twins, exchangeable
        # protons) are simply left unassigned at skip_pen each
        assign = monotone_align(env_shifts, centroids, skip_pen=0.6)
        for k, es in enumerate(env_shifts):
            j = assign[k]
            if j is None:
                continue
            hv = float(centroids[j])
            if abs(es - hv) > GATE_H_PPM:
                info["h_gated"] += 1
                continue
            for i in env[round(float(es), 6)]:
                t_h[i] = hv
                m_h[i] = 1
                info["h_clust_labels"] += 1
        if m_h.any():
            add_record(mol, t_c, m_c, t_h, m_h)
        else:
            info["skipped"] += 1

    data = {
        "nodes": np.stack(nodes),
        "edges": np.stack(edges),
        "n_atoms": np.asarray(n_atoms, np.int32),
        "target_c": np.stack(tcs),
        "mask_c": np.stack(mcs),
        "target_h": np.stack(ths),
        "mask_h": np.stack(mhs),
    }
    return data, info


def eval_metrics(records, params, model, stats):
    """Peak-level agreement with SGNN on (clean) records: 13C NN-MAE of
    reference peaks to the reconstructed consolidated prediction, HSQC
    matched distance, 1H multiplet-centroid NN-MAE."""
    c_err, h_err, hsqc_err = [], [], []
    for r, mol, sc, sh in predict_all(records, params, model, stats):
        shifts = reconstruct.AtomShifts(sc, sh)
        if r.c13:
            mine = np.array(reconstruct.reconstruct_13c(mol, shifts))
            if len(mine):
                for x in r.c13:
                    c_err.append(float(np.abs(mine - float(x)).min()))
        if r.hsqc:
            mine = np.array(reconstruct.reconstruct_hsqc(mol, shifts))
            if len(mine):
                for p in r.hsqc:
                    d = np.abs(mine[:, 1] - float(p[1])) + \
                        10.0 * np.abs(mine[:, 0] - float(p[0]))
                    hsqc_err.append(float(d.min()))
        if r.h1:
            cents = np.array([c[0] for c in cluster_multiplets(r.h1)])
            hb = [i for i, a in enumerate(mol.atoms)
                  if a.symbol == "C" and mol.total_h(i) > 0]
            if hb:
                pred = np.array(sorted({round(v, 6) for v in
                                        reconstruct._sym_averaged(mol, sh, hb).values()}))
                for x in cents:
                    h_err.append(float(np.abs(pred - x).min()))
    out = {}
    if c_err:
        out["c13_nn_mae_ppm"] = float(np.mean(c_err))
        out["c13_nn_p90_ppm"] = float(np.percentile(c_err, 90))
    if hsqc_err:
        out["hsqc_match_dist"] = float(np.mean(hsqc_err))
    if h_err:
        out["h1_centroid_nn_mae_ppm"] = float(np.mean(h_err))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", default=REF_DIR)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "multimodalspectraltransformer_tpu", "sim", "weights_sgnn"))
    ap.add_argument("--report", default="runs/sgnn_adapt")
    args = ap.parse_args()

    chc = load_reference_testset(
        csv_13c=f"{args.ref_dir}/ML_NMR_5M_XL_13C_test_10x100.csv",
        csv_hsqc=f"{args.ref_dir}/ML_NMR_5M_XL_HSQC_test_10x100.csv",
        csv_cosy=f"{args.ref_dir}/ML_NMR_5M_XL_COSY_test_10x100.csv")
    h1 = load_reference_testset(
        csv_1h=f"{args.ref_dir}/ML_NMR_1H_combined_ZINC_test_10x100.csv")

    chc_adapt = [r for r in chc if split_of(r.sample_id) == "adapt"]
    chc_eval = [r for r in chc if split_of(r.sample_id) == "eval"]
    h1_adapt = [r for r in h1 if split_of(r.sample_id) == "adapt"]
    h1_eval = [r for r in h1 if split_of(r.sample_id) == "eval"]
    print(f"[adapt] split: CHC {len(chc_adapt)}/{len(chc_eval)} "
          f"1H {len(h1_adapt)}/{len(h1_eval)} (adapt/eval)", flush=True)

    base = default_shift_model()
    if base is None:
        print("[adapt] no committed base weights — aborting", file=sys.stderr)
        sys.exit(1)
    params0, model, stats0 = base

    data, info = build_assignment_dataset(chc_adapt, h1_adapt, params0, model, stats0)
    print(f"[adapt] assignment dataset: {info}", flush=True)

    before = {
        "chc_eval": eval_metrics(chc_eval, params0, model, stats0),
        "h1_eval": eval_metrics(h1_eval, params0, model, stats0),
    }
    print(f"[adapt] BEFORE: {json.dumps(before)}", flush=True)

    meta_path = os.path.join(distill.WEIGHTS_DIR, "nmr_shift.json")
    with open(meta_path) as f:
        meta = json.load(f)
    hid, gsteps = meta["report"]["hidden"], meta["report"]["steps"]

    params, stats, report = distill.train_shift_model(
        data, hidden=hid, steps=gsteps,
        batch_size=args.batch_size, n_steps=args.steps, lr=args.lr,
        seed=args.seed, val_frac=0.08, log_every=200,
        weight_decay=0.0,
        init_params=params0,
        init_stats={"mean_c": stats0.mean_c, "std_c": stats0.std_c,
                    "mean_h": stats0.mean_h, "std_h": stats0.std_h})

    from multimodalspectraltransformer_tpu.sim.factory import ShiftStats
    stats_t = ShiftStats(**stats)
    after = {
        "chc_eval": eval_metrics(chc_eval, params, model, stats_t),
        "h1_eval": eval_metrics(h1_eval, params, model, stats_t),
    }
    print(f"[adapt] AFTER: {json.dumps(after)}", flush=True)

    report.update({
        "provenance": "sgnn_adapt fine-tune on ADAPT halves of the shipped "
                      "reference test CSVs (see scripts/sgnn_adapt.py)",
        "assignment": info,
        "eval_before": before,
        "eval_after": after,
    })
    distill.save_shift_weights(params, stats, report, out_dir=args.out)
    os.makedirs(args.report, exist_ok=True)
    with open(os.path.join(args.report, "split.json"), "w") as f:
        json.dump({
            "chc_adapt": [r.sample_id for r in chc_adapt],
            "chc_eval": [r.sample_id for r in chc_eval],
            "h1_adapt": [r.sample_id for r in h1_adapt],
            "h1_eval": [r.sample_id for r in h1_eval],
        }, f)
    with open(os.path.join(args.report, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"[adapt] saved adapted weights to {args.out}", flush=True)


if __name__ == "__main__":
    main()
