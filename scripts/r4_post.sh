#!/bin/bash
# Round-4 post-campaign chip work. Run AFTER scripts/r4_driver.sh prints
# "ALL DONE" (or kill the remaining driver stages if the round is ending):
#
#   PD  real-data LOO demo (VERDICT r3 task 8): leave-one-out blend-head
#       fine-tune over the 5 AZ molecules, REAL_DATA_DEMO.md v2. Uses the
#       ZINC-chemotype checkpoint when it exists (AZ molecules are in its
#       chemotype band), else phase-1.
#   ZB  supplementary ref-testset eval with beam+mix candidate pooling
#       (reference sampling_method='mix'): recall levers the plain ZC eval
#       doesn't use.
#
# Same guard()/retry machinery as r4_driver.sh (source of truth there).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
REF=/root/reference/MMT_website/Runfolder/CSV_files
STALE=${STALE:-900}
LOG() { echo "[r4post $(date +%H:%M:%S)] $*"; }

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

CKPT=weights/mmt_r4_zinc.msgpack.gz
[ -f "$CKPT" ] || CKPT=weights/mmt_r3_phase1.msgpack.gz

# --- PD: real-data leave-one-out demo -------------------------------------
if ! grep -q "leave-one-out" REAL_DATA_DEMO.md 2>/dev/null; then
  LOG "real-data LOO demo ($CKPT)"
  retry 3 /tmp/r4_loo.log 7000 python -u scripts/real_data_demo.py \
    --params "$CKPT" || LOG "LOO demo FAILED"
fi

# --- ZB: beam+mix pooled ref-testset eval ---------------------------------
EXC="--train-seed 21 --train-n 200000 --extra-exclude 11:150000 --exclude-corpus-file /root/repo/.cache/corpus_r3_300k.txt"
if [ -f weights/mmt_r4_zinc.msgpack.gz ] && [ ! -f ACCURACY_r04zincbm.json ]; then
  LOG "ZC eval: EVAL half, beam+mix pooling"
  retry 3 /tmp/r4_zinc_bm.log 7000 python -u scripts/accuracy_report.py \
    --params weights/mmt_r4_zinc.msgpack.gz \
    --out runs/accuracy_r4_zincbm --tag r04zincbm --n 1000 \
    --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    --beam 5 --mix \
    $EXC || LOG "ZC beam/mix eval FAILED"
fi

LOG "ALL DONE"
