#!/bin/bash
# Round-4 driver, part 2 — replaces the tail of scripts/r4_driver.sh after
# the ZC result came back 0.000 with teacher-forced P ~5e-7 on the eval
# half (ACCURACY_r04zinc.json): after the chemotype fix, the dominant
# failure is the INPUT distribution (adapted-GNN sim spectra vs the
# testset's real SGNN spectra — the memorization control free-runs 1.0 and
# TF P 0.975 when trained on real spectra directly). Priority order:
#
#   ZC2 mixture fine-tune (zinclike corpus + adapt-half real-spectra
#       records x64 = 17%): teaches real input statistics INCLUDING the
#       exact no-IR/no-1H blank pattern; eval half stays disjoint. No
#       scheduled sampling (proven neutral; halves step cost).
#   CL  CLIP contrastive training (featcache + snapshot/resume landed
#       e4446af) + export + re-rank eval
#   BM  clean bench x3
#   P3  in-domain polish fine-tune + plain and beam/mix evals
#   LOO real-data leave-one-out demo
#   IC  improvement cycle, 120 targets
#
# Guard machinery identical to r4_driver.sh.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
REF=/root/reference/MMT_website/Runfolder/CSV_files
STALE=${STALE:-900}
LOG() { echo "[r4d2 $(date +%H:%M:%S)] $*"; }

grp_cpu() {
  local g=$1 total=0 p rest
  for p in $(ps -eo pid=,pgid= | awk -v g="$g" '$2==g{print $1}'); do
    [ -r "/proc/$p/stat" ] || continue
    rest=$(sed 's/.*) //' "/proc/$p/stat" 2>/dev/null) || continue
    set -- $rest
    total=$((total + ${12:-0} + ${13:-0}))
  done
  echo "$total"
}

guard() {
  local log=$1 tmo=$2; shift 2
  local watch=${WATCH:-$log}
  touch "$log"
  setsid "$@" >> "$log" 2>&1 &
  local pid=$!
  local start now m m2 cpu_prev cpu_now
  start=$(date +%s)
  cpu_prev=$(grp_cpu "$pid")
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    m=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
    m2=$(stat -c %Y "$watch" 2>/dev/null || echo 0)
    [ "$m2" -gt "$m" ] && m=$m2
    cpu_now=$(grp_cpu "$pid")
    if [ $((now - start)) -gt "$tmo" ]; then
      LOG "guard: killing pgid $pid (hard timeout) [$log]"
    elif [ $((now - m)) -gt "$STALE" ] && [ $((cpu_now - cpu_prev)) -lt 100 ]; then
      LOG "guard: killing pgid $pid (log stale $((now - m))s, group CPU idle) [$log]"
    else
      cpu_prev=$cpu_now
      continue
    fi
    kill -TERM -- -"$pid" 2>/dev/null
    sleep 15
    kill -KILL -- -"$pid" 2>/dev/null
    return 9
  done
  wait "$pid"
}

retry() {
  local n=$1; shift
  local i rc
  for i in $(seq 1 "$n"); do
    guard "$@"; rc=$?
    [ "$rc" -eq 0 ] && return 0
    LOG "attempt $i/$n failed rc=$rc"
    sleep 45
  done
  return 1
}

export_ckpt() {
  python -u - "$1" "$2" <<'EOF'
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
from multimodalspectraltransformer_tpu.utils.config import ModelConfig
template = mmt.init_params(ModelConfig(), jax.random.PRNGKey(0))
params = ckpt.import_params_msgpack(template, sys.argv[1])
ckpt.export_params_msgpack(params, sys.argv[2], dtype="bfloat16")
print("exported", sys.argv[2])
EOF
}

EXC="--train-seed 21 --train-n 200000 --extra-exclude 11:150000 --exclude-corpus-file /root/repo/.cache/corpus_r3_300k.txt"

# --- ZC2: mixture fine-tune ------------------------------------------------
if [ ! -f .cache/run_r4_zc2/params.msgpack ]; then
  LOG "ZC2: mixture fine-tune (183039 = 151807 zinclike + 488 reals x64)"
  WATCH=.cache/run_r4_zc2/metrics.jsonl \
  retry 8 /tmp/r4_zc2.log 9000 python -u -m multimodalspectraltransformer_tpu.cli train \
    --factory 183039 --factory-seed 777 \
    --factory-cache .cache/factory_zc2.pkl \
    --params weights/mmt_r4_zinc.msgpack.gz \
    --out .cache/run_r4_zc2 --bf16 --batch-size 64 --lr 5e-5 \
    --steps 10000 --epochs 100 --save-every 800 --val-n 1000 \
    --blank 0.2 --warp-13c 3.0 --warp-1h 0.25 --jitter-13c 1.0 --jitter-1h 0.08 \
    --log-every 50 --feature-cache .cache/featcache_zc2 \
    || LOG "ZC2 train FAILED"
fi
Z2=.cache/run_r4_zc2/params.msgpack
if [ -f "$Z2" ] && [ ! -f weights/mmt_r4_zc2.msgpack.gz ]; then
  export_ckpt "$Z2" weights/mmt_r4_zc2.msgpack.gz
fi
if [ -f weights/mmt_r4_zc2.msgpack.gz ] && [ ! -f ACCURACY_r04zc2.json ]; then
  LOG "ZC2 eval: EVAL half 13c,hsqc,cosy"
  retry 4 /tmp/r4_zc2_e1.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r4_zc2.msgpack.gz \
    --out runs/accuracy_r4_zc2 --tag r04zc2 --n 1000 \
    --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "ZC2 eval FAILED"
fi
if [ -f weights/mmt_r4_zc2.msgpack.gz ] && [ ! -f ACCURACY_r04zc21h.json ]; then
  LOG "ZC2 eval: EVAL half 1h"
  retry 3 /tmp/r4_zc2_e2.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r4_zc2.msgpack.gz \
    --out runs/accuracy_r4_zc21h --tag r04zc21h --n 1000 \
    --ref-testset "$REF" --ref-modalities 1h --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "ZC2 1h eval FAILED"
fi

# --- CL: CLIP contrastive training + re-rank eval --------------------------
if [ ! -f .cache/run_r4_clip/clip.msgpack ]; then
  LOG "CLIP training (featcache + resume)"
  WATCH=.cache/run_r4_clip/metrics.jsonl \
  retry 5 /tmp/r4_clip.log 10000 python -u -m multimodalspectraltransformer_tpu.cli train-clip \
    --factory 291006 --factory-seed 3133 \
    --factory-cache .cache/factory_r3_300k.pkl \
    --params weights/mmt_r3_phase1.msgpack.gz --tower clip \
    --out .cache/run_r4_clip --steps ${CLIP_STEPS:-20000} --epochs 20 \
    --batch-size 256 --lr 1e-4 --eval-n 256 --log-every 100 \
    --save-every 500 --feature-cache .cache/featcache_r3 || LOG "CLIP FAILED"
fi
if [ -f .cache/run_r4_clip/clip.msgpack ] && [ ! -f weights/clip_r4.msgpack.gz ]; then
  python - <<'EOF'
import gzip, shutil
with open(".cache/run_r4_clip/clip.msgpack", "rb") as fin, \
     gzip.open("weights/clip_r4.msgpack.gz", "wb") as fout:
    shutil.copyfileobj(fin, fout)
print("exported weights/clip_r4.msgpack.gz")
EOF
fi
if [ -f weights/clip_r4.msgpack.gz ] && [ ! -f ACCURACY_r04clip.json ]; then
  LOG "CLIP re-rank eval"
  mkdir -p runs/accuracy_r4_clip
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r4_clip/ 2>/dev/null
  retry 3 /tmp/r4_clip_rerank.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r3_phase1.msgpack.gz \
    --out runs/accuracy_r4_clip --tag r04clip --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --clip-params weights/clip_r4.msgpack.gz || LOG "CLIP re-rank FAILED"
fi

# --- BM: clean bench, 3 reps -----------------------------------------------
if [ ! -f .cache/bench_r4_done ]; then
  LOG "bench x3"
  ok=1
  for i in 1 2 3; do
    guard /tmp/r4_bench.log 1500 python -u bench.py || { ok=0; LOG "bench rep $i failed"; }
  done
  [ "$ok" = 1 ] && touch .cache/bench_r4_done
fi

# --- P3: in-domain polish fine-tune + evals --------------------------------
if [ -f .cache/featcache_r3.PREWARMED ] && [ ! -f .cache/run_r4_phase3/params.msgpack ]; then
  LOG "P3: polish fine-tune"
  WATCH=.cache/run_r4_phase3/metrics.jsonl \
  retry 10 /tmp/r4_p3.log 9500 python -u -m multimodalspectraltransformer_tpu.cli train \
    --factory 291006 --factory-seed 3133 \
    --factory-cache .cache/factory_r3_300k.pkl \
    --params weights/mmt_r3_phase1.msgpack.gz \
    --out .cache/run_r4_phase3 --bf16 --batch-size 64 --lr 3e-5 \
    --steps 15000 --epochs 100 --save-every 800 --val-n 1000 \
    --augment 2 --log-every 50 \
    --feature-cache .cache/featcache_r3 || LOG "P3 train FAILED"
fi
P3=.cache/run_r4_phase3/params.msgpack
if [ -f "$P3" ] && [ ! -f weights/mmt_r4_phase3.msgpack.gz ]; then
  export_ckpt "$P3" weights/mmt_r4_phase3.msgpack.gz
fi
if [ -f weights/mmt_r4_phase3.msgpack.gz ] && [ ! -f ACCURACY_r04p3.json ]; then
  mkdir -p runs/accuracy_r4_p3
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r4_p3/ 2>/dev/null
  LOG "P3 eval (plain)"
  retry 3 /tmp/r4_p3_eval.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r4_phase3.msgpack.gz --out runs/accuracy_r4_p3 \
    --tag r04p3 --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz || LOG "P3 eval FAILED"
fi
if [ -f weights/mmt_r4_phase3.msgpack.gz ] && [ ! -f ACCURACY_r04p3bm.json ]; then
  mkdir -p runs/accuracy_r4_p3bm
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r4_p3bm/ 2>/dev/null
  LOG "P3 eval (beam+mix pooled recall)"
  retry 3 /tmp/r4_p3_bm.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r4_phase3.msgpack.gz --out runs/accuracy_r4_p3bm \
    --tag r04p3bm --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --beam 5 --mix || LOG "P3 beam/mix eval FAILED"
fi

# --- LOO: real-data leave-one-out demo -------------------------------------
if ! grep -q "leave-one-out" REAL_DATA_DEMO.md 2>/dev/null; then
  CK=weights/mmt_r4_zc2.msgpack.gz
  [ -f "$CK" ] || CK=weights/mmt_r3_phase1.msgpack.gz
  LOG "real-data LOO demo ($CK)"
  retry 3 /tmp/r4_loo.log 7000 python -u scripts/real_data_demo.py \
    --params "$CK" || LOG "LOO demo FAILED"
fi

# --- IC: improvement cycle at scale ----------------------------------------
if [ -s .cache/ic_targets_120.txt ] && [ ! -f .cache/run_r4_ic/cycles.jsonl ]; then
  LOG "improvement cycle, 120 targets"
  STALE=3600 \
  retry 2 /tmp/r4_ic.log 12000 python -u -m multimodalspectraltransformer_tpu.cli improve \
    --smiles .cache/ic_targets_120.txt \
    --out .cache/run_r4_ic \
    --params weights/mmt_r3_phase1.msgpack.gz --cycles 8 --generations 30 \
    --model-neighbors --batch-size 16 --lr 5e-5 --threshold 0.4 || LOG "IC FAILED"
fi

LOG "ALL DONE"
