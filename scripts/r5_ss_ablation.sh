#!/bin/bash
# Scheduled-sampling isolation (r4 verdict task 8): one ss=0 vs ss=0.25
# pair on the IDENTICAL corpus (factory_zc2), steps (3000), seed and init
# (weights/mmt_r4_zinc.msgpack.gz) — eval-half TF-P and MNS side by side.
# The r4 memorization control showed ss is neutral at the memorization
# limit; this measures it in the real mixture-training regime.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
REF=/root/reference/MMT_website/Runfolder/CSV_files
LOG() { echo "[r5ss $(date +%H:%M:%S)] $*"; }

train_arm() {  # $1=ss_prob $2=outdir
  timeout 3000 python -u -m multimodalspectraltransformer_tpu.cli train \
    --factory 183039 --factory-seed 777 \
    --factory-cache .cache/factory_zc2.pkl \
    --params weights/mmt_r4_zinc.msgpack.gz \
    --out "$2" --bf16 --batch-size 64 --lr 5e-5 \
    --steps 3000 --epochs 100 --save-every 1500 --val-n 1000 \
    --blank 0.2 --warp-13c 3.0 --warp-1h 0.25 --jitter-13c 1.0 --jitter-1h 0.08 \
    --ss-prob "$1" --ss-ramp 500 \
    --log-every 50 --feature-cache .cache/featcache_zc2
}

for arm in 0.0 0.25; do
  od=.cache/run_r5_ss${arm}
  if [ ! -f "$od/params.msgpack" ]; then
    LOG "training arm ss=$arm"
    train_arm "$arm" "$od" || { LOG "arm $arm train FAILED"; exit 1; }
  fi
  tag=r05ss${arm}
  if [ ! -f "ACCURACY_${tag}.json" ]; then
    LOG "eval arm ss=$arm (eval half, 13c/hsqc/cosy, n=256)"
    timeout 4000 python -u scripts/accuracy_report.py \
      --params "$od/params.msgpack" \
      --out "runs/accuracy_${tag}" --tag "$tag" --n 256 \
      --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
      --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
      || { LOG "arm $arm eval FAILED"; exit 1; }
  fi
done

python - <<'EOF'
import json
rows = []
for arm in ("0.0", "0.25"):
    d = json.load(open(f"ACCURACY_r05ss{arm}.json"))
    rows.append((arm, d["corr_sampling_prob"], d["mns_exact"], d["greedy_exact"]))
md = [
    "# Scheduled sampling isolation (round 5)",
    "",
    "One controlled pair — identical corpus (`factory_zc2`, 183k records),",
    "init (`weights/mmt_r4_zinc.msgpack.gz`), 3000 steps, seed, transforms —",
    "differing ONLY in `ss_prob`. Eval: reference test-set EVAL half,",
    "13c/hsqc/cosy, n=256 (real SGNN spectra). Reference hook re-designed:",
    "`models_MMT_v15_4.py:1222-1297`.",
    "",
    "| ss_prob | TF P(sequence) | MNS exact | greedy exact |",
    "|---|---|---|---|",
]
for arm, tfp, mns, ge in rows:
    md.append(f"| {arm} | {tfp:.2e} | {mns:.3f} | {ge:.3f} |")
md += ["", "Decision rule: if the rows are within noise, scheduled sampling",
       "stays OFF in campaign defaults (it costs a second decoder pass).",]
open("ACCURACY_r05ss.md", "w").write("\n".join(md) + "\n")
print("\n".join(md))
EOF
LOG "DONE"
