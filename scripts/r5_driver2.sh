#!/bin/bash
# Round-5 chip campaign, part 2: the Z1M fine-tune + the final eval battery.
# Launched to REPLACE r5_driver.sh once its pre-training stages (CLIPEVAL,
# IC, PROF) are done — a fresh T0 gives the training stage a full window.
#
#   Z1M    1M-corpus fine-tune until T0+TRAIN_BUDGET (default 3h)
#   EXPORT newest snapshot -> weights/mmt_r5_z1m.msgpack.gz
#   CTRL   simulator-matched eval-half control (gate: greedy>=0.30/MNS>=0.50)
#   REF    external evals (13c,hsqc,cosy + 1h) on the shipped ZINC test set
#   LOO    real-data demo v3 (blend-only vs decoder+blend jitter-matched)
#   INDOM  in-domain held-out eval (beam+mix, unbanded)
#   BENCH  final bench reps
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
REF=/root/reference/MMT_website/Runfolder/CSV_files
STALE=${STALE:-900}
T0=$(date +%s)
TRAIN_END=$((T0 + ${TRAIN_BUDGET:-10800}))
LOG() { echo "[r5d2 $(date +%H:%M:%S)] $*"; }

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

# --- Z1M -------------------------------------------------------------------
LOG "waiting for .cache/factory_z1m.READY"
while [ ! -f .cache/factory_z1m.READY ]; do sleep 60; done
NZ=$(cat .cache/factory_z1m.READY)
NOW=$(date +%s)
REMAIN=$((TRAIN_END - NOW - 600))
STEPS=$((REMAIN * 11 / 2))            # conservative 5.5 steps/s
[ "$STEPS" -gt 80000 ] && STEPS=80000
if [ "$STEPS" -lt 8000 ]; then STEPS=8000; fi
LOG "Z1M fine-tune: n=$NZ, step budget $STEPS (remain ${REMAIN}s)"
while [ ! -f .cache/run_r5_z1m/DONE ]; do
  NOW=$(date +%s)
  TMO=$((TRAIN_END - NOW))
  if [ "$TMO" -lt 900 ]; then LOG "Z1M: deadline reached"; break; fi
  WATCH=.cache/run_r5_z1m/metrics.jsonl \
  guard /tmp/r5_z1m.log "$TMO" python -u -m multimodalspectraltransformer_tpu.cli train \
    --factory "$NZ" --factory-seed 555 \
    --factory-cache .cache/factory_z1m.pkl \
    --params weights/mmt_r4_zc2.msgpack.gz \
    --out .cache/run_r5_z1m --bf16 --batch-size 64 --lr 1e-4 \
    --steps "$STEPS" --epochs 100 --save-every 800 --val-n 1000 \
    --blank 0.2 --warp-13c 3.0 --warp-1h 0.25 --jitter-13c 1.0 --jitter-1h 0.08 \
    --log-every 50 --feature-cache .cache/featcache_z1m \
    && touch .cache/run_r5_z1m/DONE
  [ -f .cache/run_r5_z1m/params.msgpack ] && touch .cache/run_r5_z1m/DONE
  sleep 45
done

# --- EXPORT ----------------------------------------------------------------
if [ ! -f weights/mmt_r5_z1m.msgpack.gz ]; then
  nice -n 19 python -u scripts/export_latest.py .cache/run_r5_z1m \
    weights/mmt_r5_z1m.msgpack.gz || LOG "EXPORT FAILED"
fi

# --- CTRL ------------------------------------------------------------------
if [ -f weights/mmt_r5_z1m.msgpack.gz ] && [ ! -f runs/control_simmatched_eval_r5.json ]; then
  LOG "simulator-matched eval-half control"
  retry 2 /tmp/r5_ctrl.log 4200 python -u scripts/control_adapted_sim_eval.py \
    --params weights/mmt_r5_z1m.msgpack.gz --split eval --n 192 \
    --out runs/control_simmatched_eval_r5.json || LOG "CTRL FAILED"
fi

# --- REF -------------------------------------------------------------------
if [ -f weights/mmt_r5_z1m.msgpack.gz ] && [ ! -f ACCURACY_r05ref.json ]; then
  LOG "external eval: EVAL half 13c,hsqc,cosy"
  retry 2 /tmp/r5_ref.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r5_z1m.msgpack.gz \
    --out runs/accuracy_r5_ref --tag r05ref --n 1000 \
    --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    || LOG "REF eval FAILED"
fi
if [ -f weights/mmt_r5_z1m.msgpack.gz ] && [ ! -f ACCURACY_r05ref1h.json ]; then
  LOG "external eval: EVAL half 1h"
  retry 2 /tmp/r5_ref1h.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r5_z1m.msgpack.gz \
    --out runs/accuracy_r5_ref1h --tag r05ref1h --n 1000 \
    --ref-testset "$REF" --ref-modalities 1h --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    || LOG "REF 1h eval FAILED"
fi

# --- LOO: real-data demo v3 ------------------------------------------------
if [ ! -f REAL_DATA_DEMO.json ] || ! grep -q real_data_decoder REAL_DATA_DEMO.json; then
  LOG "real-data LOO demo v3"
  retry 2 /tmp/r5_loo.log 4200 python -u scripts/real_data_demo.py \
    --params weights/mmt_r4_phase3.msgpack.gz || LOG "LOO FAILED"
fi

# --- INDOM -----------------------------------------------------------------
if [ -f weights/mmt_r5_z1m.msgpack.gz ] && [ ! -f ACCURACY_r05z1m.json ]; then
  LOG "in-domain eval of z1m (beam+mix, unbanded)"
  mkdir -p runs/accuracy_r5_z1m
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r5_z1m/ 2>/dev/null
  retry 2 /tmp/r5_z1m_eval.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r5_z1m.msgpack.gz --out runs/accuracy_r5_z1m \
    --tag r05z1m --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --beam 5 --mix || LOG "INDOM eval FAILED"
fi

# --- BENCH -----------------------------------------------------------------
LOG "final bench"
guard /tmp/r5_bench.log 1700 python -u bench.py || LOG "bench rep failed"

LOG "ALL DONE"
