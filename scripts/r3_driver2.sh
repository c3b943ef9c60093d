#!/bin/bash
# Round-3 guarded chip-work driver, part 2: resumes the r3_driver.sh chain
# and inserts the ZINC-chemotype campaign (the round's main accuracy lever,
# see scripts/zinc_corpus.py) before the improvement-cycle stage.
#
# Same failure model as r3_driver.sh: the tunneled backend's silent-client-
# death hang. Every chip stage runs under guard() in its own process group,
# killed BY PGID when its liveness file goes stale AND the group is CPU-idle,
# then retried; training stages checkpoint every 800 steps so retries are
# monotonic.
#
# Stages (artifact-gated, in order):
#   P3  train resume + plain/beam-mix evals   (from r3_driver.sh)
#   BM  clean end-to-end bench, 3 reps
#   CL  CLIP contrastive training + re-rank eval
#   ZC  ZINC-chemotype fine-tune (waits for scripts/r3_zinc_prep.sh's READY
#       marker) + EVAL-half accuracy + checkpoint export
#   IC  improvement cycle, 120 targets
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export MMT_FEATURE_CACHE=/root/repo/.cache/featcache_r3
REF=/root/reference/MMT_website/Runfolder/CSV_files
STALE=${STALE:-900}
LOG() { echo "[driver2 $(date +%H:%M:%S)] $*"; }

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

# guard <log> <hard-timeout-secs> <cmd...>; liveness = newest of <log> and
# $WATCH (training progress lands in metrics.jsonl, not stdout)
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

EXC="--train-seed 21 --train-n 200000 --extra-exclude 11:150000 --exclude-corpus-file /root/repo/.cache/corpus_r3_300k.txt"

# --- P3: polish fine-tune (resumes from the 800-step Orbax ckpts) ---
if [ ! -f /root/repo/.cache/run_r3_phase3/params.msgpack ]; then
  LOG "P3: polish fine-tune"
  WATCH=/root/repo/.cache/run_r3_phase3/metrics.jsonl \
  retry 10 /tmp/p3_train.log 9500 python -u -m multimodalspectraltransformer_tpu.cli train \
    --factory 291006 --factory-seed 3133 \
    --factory-cache /root/repo/.cache/factory_r3_300k.pkl \
    --params weights/mmt_r3_phase1.msgpack.gz \
    --out /root/repo/.cache/run_r3_phase3 --bf16 --batch-size 64 --lr 3e-5 \
    --steps 15000 --epochs 100 --save-every 800 --val-n 1000 \
    --augment 2 --log-every 50 \
    --feature-cache /root/repo/.cache/featcache_r3 || LOG "P3 train FAILED"
fi
P3=/root/repo/.cache/run_r3_phase3/params.msgpack
if [ -f "$P3" ] && [ ! -f ACCURACY_r03p3.json ]; then
  mkdir -p runs/accuracy_r3_p3
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_p3/ 2>/dev/null
  LOG "P3 eval (plain)"
  retry 3 /tmp/p3_eval.log 5400 python -u scripts/accuracy_report.py \
    --params "$P3" --out runs/accuracy_r3_p3 --tag r03p3 --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz || LOG "P3 eval FAILED"
fi
if [ -f "$P3" ] && [ ! -f ACCURACY_r03p3bm.json ]; then
  mkdir -p runs/accuracy_r3_p3bm
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_p3bm/ 2>/dev/null
  LOG "P3 eval (beam+mix pooled recall)"
  retry 3 /tmp/p3_eval_bm.log 5400 python -u scripts/accuracy_report.py \
    --params "$P3" --out runs/accuracy_r3_p3bm --tag r03p3bm --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --beam 5 --mix || LOG "P3 beam/mix eval FAILED"
fi

# --- BM: clean bench, 3 reps ---
if [ ! -f /root/repo/.cache/bench_r3_done ]; then
  LOG "bench x3"
  ok=1
  for i in 1 2 3; do
    guard /tmp/bench_r3_post.log 1500 python -u bench.py || { ok=0; LOG "bench rep $i failed"; }
  done
  [ "$ok" = 1 ] && touch /root/repo/.cache/bench_r3_done
fi

# --- CL: CLIP contrastive training + re-rank eval ---
if [ ! -f /root/repo/.cache/run_r3_clip/clip.msgpack ]; then
  LOG "CLIP training"
  WATCH=/root/repo/.cache/run_r3_clip/metrics.jsonl \
  retry 3 /tmp/clip_r3.log 10000 python -u -m multimodalspectraltransformer_tpu.cli train-clip \
    --factory 291006 --factory-seed 3133 \
    --factory-cache /root/repo/.cache/factory_r3_300k.pkl \
    --params weights/mmt_r3_phase1.msgpack.gz --tower clip \
    --out /root/repo/.cache/run_r3_clip --steps 20000 --epochs 20 \
    --batch-size 256 --lr 1e-4 --eval-n 256 --log-every 100 || LOG "CLIP FAILED"
fi
if [ -f /root/repo/.cache/run_r3_clip/clip.msgpack ] && [ ! -f ACCURACY_r03clip.json ]; then
  LOG "CLIP re-rank eval"
  mkdir -p runs/accuracy_r3_clip
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_clip/ 2>/dev/null
  CP="$P3"; [ -f "$CP" ] || CP=weights/mmt_r3_phase1.msgpack.gz
  retry 3 /tmp/clip_rerank.log 5400 python -u scripts/accuracy_report.py \
    --params "$CP" --out runs/accuracy_r3_clip --tag r03clip --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --clip-params /root/repo/.cache/run_r3_clip/clip.msgpack || LOG "CLIP re-rank FAILED"
fi

# --- ZC: ZINC-chemotype fine-tune + EVAL-half accuracy ---
READY=/root/repo/.cache/factory_zinc.READY
if [ ! -f /root/repo/.cache/run_r3_zinc/params.msgpack ]; then
  LOG "ZC: waiting for host prep ($READY)"
  for _ in $(seq 1 240); do [ -f "$READY" ] && break; sleep 30; done
  if [ -f "$READY" ]; then
    NZ=$(cat "$READY")
    INIT="$P3"; [ -f "$INIT" ] || INIT=weights/mmt_r3_phase1.msgpack.gz
    LOG "ZC: fine-tune on $NZ zinclike records from $INIT"
    WATCH=/root/repo/.cache/run_r3_zinc/metrics.jsonl \
    retry 10 /tmp/zinc_train.log 12000 python -u -m multimodalspectraltransformer_tpu.cli train \
      --factory "$NZ" --factory-seed 888 \
      --factory-cache /root/repo/.cache/factory_zinc.pkl \
      --params "$INIT" \
      --out /root/repo/.cache/run_r3_zinc --bf16 --batch-size 64 --lr 5e-5 \
      --steps 18000 --epochs 100 --save-every 800 --val-n 1000 \
      --blank 0.2 --warp-13c 3.0 --warp-1h 0.25 --jitter-13c 1.0 --jitter-1h 0.08 \
      --log-every 50 --feature-cache /root/repo/.cache/featcache_zinc \
      || LOG "ZC train FAILED"
  else
    LOG "ZC SKIPPED: prep never became ready"
  fi
fi
ZP=/root/repo/.cache/run_r3_zinc/params.msgpack
if [ -f "$ZP" ] && [ ! -f ACCURACY_r03zinc.json ]; then
  LOG "ZC eval: EVAL half 13c,hsqc,cosy"
  retry 4 /tmp/zinc_e1.log 5400 python -u scripts/accuracy_report.py \
    --params "$ZP" \
    --out runs/accuracy_r3_zinc --tag r03zinc --n 1000 \
    --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "ZC eval FAILED"
fi
if [ -f "$ZP" ] && [ ! -f ACCURACY_r03zinc1h.json ]; then
  LOG "ZC eval: EVAL half 1h"
  retry 4 /tmp/zinc_e2.log 5400 python -u scripts/accuracy_report.py \
    --params "$ZP" \
    --out runs/accuracy_r3_zinc1h --tag r03zinc1h --n 1000 \
    --ref-testset "$REF" --ref-modalities 1h --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "ZC 1h eval FAILED"
fi
if [ -f "$ZP" ] && [ ! -f weights/mmt_r3_zinc.msgpack.gz ]; then
  LOG "ZC export"
  python -u - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
from multimodalspectraltransformer_tpu.utils.config import ModelConfig
template = mmt.init_params(ModelConfig(), jax.random.PRNGKey(0))
params = ckpt.import_params_msgpack(template, "/root/repo/.cache/run_r3_zinc/params.msgpack")
ckpt.export_params_msgpack(params, "weights/mmt_r3_zinc.msgpack.gz", dtype="bfloat16")
print("exported weights/mmt_r3_zinc.msgpack.gz")
EOF
fi

# --- IC: improvement cycle at scale ---
if [ ! -f /root/repo/.cache/run_r3_ic/cycles.jsonl ]; then
  LOG "improvement cycle, 120 targets"
  STALE=3600 \
  retry 2 /tmp/ic_120.log 12000 python -u -m multimodalspectraltransformer_tpu.cli improve \
    --smiles /root/repo/.cache/ic_targets_120.txt \
    --out /root/repo/.cache/run_r3_ic \
    --params weights/mmt_r3_phase1.msgpack.gz --cycles 8 --generations 30 \
    --model-neighbors --batch-size 16 --lr 5e-5 --threshold 0.4 || LOG "IC FAILED"
fi

LOG "ALL DONE"
