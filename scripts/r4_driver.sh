#!/bin/bash
# Round-4 guarded chip-work driver. Executes the campaign the r3 VERDICT
# ordered, highest-leverage first:
#
#   MC  scheduled-sampling memorization control (adapt-half, real SGNN
#       spectra): ss=0 baseline arm + ss arm; VERDICT task 2's bar is
#       free-running exact >= 0.5 on memorized molecules (r3: 0.094)
#   ZC  ZINC-chemotype fine-tune WITH scheduled sampling (tasks 1+2) +
#       eval-half reports + committed checkpoint export
#   CL  CLIP contrastive training + re-rank eval (task 3)
#   BM  clean end-to-end bench, 3 reps (task 6)
#   P3  in-domain polish fine-tune + plain/beam-mix evals (task 4)
#   IC  improvement cycle, 120 targets (task 5)
#
# Failure model unchanged from scripts/r3_driver2.sh: tunneled-backend
# silent-client-death hangs -> every chip stage runs under guard() in its
# own process group, killed by PGID when its liveness file (stdout log OR
# $WATCH metrics file) goes stale AND the group is CPU-idle, then retried;
# training checkpoints every 800 steps so retries are monotonic.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
REF=/root/reference/MMT_website/Runfolder/CSV_files
STALE=${STALE:-900}
LOG() { echo "[r4 $(date +%H:%M:%S)] $*"; }

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
    LOG "attempt $i/$n failed rc=$rc: ${4:-?}"
    sleep 45
  done
  return 1
}

export_ckpt() {  # export_ckpt <run_params.msgpack> <weights/NAME.msgpack.gz>
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

# --- MC: scheduled-sampling memorization control --------------------------
MEM=.cache/factory_adapt_mem.pkl
if [ -f "$MEM" ]; then
  NM=$(python -c "import pickle; print(pickle.load(open('$MEM','rb'))['n'])")
  # arm 0: plain CE (clean baseline for the pure-adapt protocol)
  if [ ! -f .cache/run_r4_mem0/params.msgpack ]; then
    LOG "MC arm ss=0 ($NM records)"
    WATCH=.cache/run_r4_mem0/metrics.jsonl \
    retry 6 /tmp/r4_mem0.log 4000 python -u -m multimodalspectraltransformer_tpu.cli train \
      --factory "$NM" --factory-seed 4242 --factory-cache "$MEM" \
      --params weights/mmt_r3_sgnn.msgpack.gz \
      --out .cache/run_r4_mem0 --bf16 --batch-size 64 --lr 5e-5 \
      --steps 3000 --epochs 100 --save-every 800 --val-n 256 \
      --log-every 50 || LOG "MC0 train FAILED"
  fi
  if [ -f .cache/run_r4_mem0/params.msgpack ] && [ ! -f ACCURACY_r04mem0.json ]; then
    retry 3 /tmp/r4_mem0_eval.log 5400 python -u scripts/accuracy_report.py \
      --params .cache/run_r4_mem0/params.msgpack \
      --out runs/accuracy_r4_mem0 --tag r04mem0 --n 128 \
      --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split adapt \
      --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
      $EXC || LOG "MC0 eval FAILED"
  fi
  # arm ss: two-pass scheduled sampling
  if [ ! -f .cache/run_r4_memss/params.msgpack ]; then
    LOG "MC arm ss=0.3"
    WATCH=.cache/run_r4_memss/metrics.jsonl \
    retry 6 /tmp/r4_memss.log 4000 python -u -m multimodalspectraltransformer_tpu.cli train \
      --factory "$NM" --factory-seed 4242 --factory-cache "$MEM" \
      --params weights/mmt_r3_sgnn.msgpack.gz \
      --out .cache/run_r4_memss --bf16 --batch-size 64 --lr 5e-5 \
      --steps 3000 --epochs 100 --save-every 800 --val-n 256 \
      --ss-prob 0.3 --ss-ramp 500 \
      --log-every 50 || LOG "MCss train FAILED"
  fi
  if [ -f .cache/run_r4_memss/params.msgpack ] && [ ! -f ACCURACY_r04memss.json ]; then
    retry 3 /tmp/r4_memss_eval.log 5400 python -u scripts/accuracy_report.py \
      --params .cache/run_r4_memss/params.msgpack \
      --out runs/accuracy_r4_memss --tag r04memss --n 128 \
      --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split adapt \
      --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
      $EXC || LOG "MCss eval FAILED"
  fi
fi

# --- ZC: ZINC-chemotype fine-tune + scheduled sampling --------------------
READY=.cache/factory_zinc.READY
if [ ! -f .cache/run_r4_zinc/params.msgpack ]; then
  LOG "ZC: waiting for host prep ($READY)"
  for _ in $(seq 1 360); do [ -f "$READY" ] && break; sleep 30; done
  if [ -f "$READY" ]; then
    NZ=$(cat "$READY")
    LOG "ZC: fine-tune on $NZ zinclike records (ss=0.25)"
    WATCH=.cache/run_r4_zinc/metrics.jsonl \
    retry 10 /tmp/r4_zinc.log 12000 python -u -m multimodalspectraltransformer_tpu.cli train \
      --factory "$NZ" --factory-seed 888 \
      --factory-cache .cache/factory_zinc.pkl \
      --params weights/mmt_r3_phase1.msgpack.gz \
      --out .cache/run_r4_zinc --bf16 --batch-size 64 --lr 5e-5 \
      --steps 18000 --epochs 100 --save-every 800 --val-n 1000 \
      --blank 0.2 --warp-13c 3.0 --warp-1h 0.25 --jitter-13c 1.0 --jitter-1h 0.08 \
      --ss-prob 0.25 --ss-ramp 2000 \
      --log-every 50 --feature-cache .cache/featcache_zinc \
      || LOG "ZC train FAILED"
  else
    LOG "ZC SKIPPED: prep never became ready"
  fi
fi
ZP=.cache/run_r4_zinc/params.msgpack
if [ -f "$ZP" ] && [ ! -f weights/mmt_r4_zinc.msgpack.gz ]; then
  LOG "ZC export (before evals: committed reports must cite a committed file)"
  export_ckpt "$ZP" weights/mmt_r4_zinc.msgpack.gz
fi
if [ -f weights/mmt_r4_zinc.msgpack.gz ] && [ ! -f ACCURACY_r04zinc.json ]; then
  LOG "ZC eval: EVAL half 13c,hsqc,cosy"
  retry 4 /tmp/r4_zinc_e1.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r4_zinc.msgpack.gz \
    --out runs/accuracy_r4_zinc --tag r04zinc --n 1000 \
    --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "ZC eval FAILED"
fi
if [ -f weights/mmt_r4_zinc.msgpack.gz ] && [ ! -f ACCURACY_r04zinc1h.json ]; then
  LOG "ZC eval: EVAL half 1h"
  retry 4 /tmp/r4_zinc_e2.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r4_zinc.msgpack.gz \
    --out runs/accuracy_r4_zinc1h --tag r04zinc1h --n 1000 \
    --ref-testset "$REF" --ref-modalities 1h --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "ZC 1h eval FAILED"
fi

# --- CL: CLIP contrastive training + re-rank eval -------------------------
if [ -f .cache/factory_r3_300k.pkl ] && [ ! -f .cache/run_r4_clip/clip.msgpack ]; then
  LOG "CLIP training"
  WATCH=.cache/run_r4_clip/metrics.jsonl \
  retry 3 /tmp/r4_clip.log 10000 python -u -m multimodalspectraltransformer_tpu.cli train-clip \
    --factory 291006 --factory-seed 3133 \
    --factory-cache .cache/factory_r3_300k.pkl \
    --params weights/mmt_r3_phase1.msgpack.gz --tower clip \
    --out .cache/run_r4_clip --steps 20000 --epochs 20 \
    --batch-size 256 --lr 1e-4 --eval-n 256 --log-every 100 || LOG "CLIP FAILED"
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

# --- BM: clean bench, 3 reps ----------------------------------------------
if [ ! -f .cache/bench_r4_done ]; then
  LOG "bench x3"
  ok=1
  for i in 1 2 3; do
    guard /tmp/r4_bench.log 1500 python -u bench.py || { ok=0; LOG "bench rep $i failed"; }
  done
  [ "$ok" = 1 ] && touch .cache/bench_r4_done
fi

# --- P3: in-domain polish fine-tune + evals -------------------------------
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

# --- IC: improvement cycle at scale ---------------------------------------
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
