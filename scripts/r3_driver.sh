#!/bin/bash
# Round-3 guarded chip-work driver.
#
# The tunneled backend's failure mode tonight is SILENT CLIENT DEATH: a
# client loses its relay connection mid-run and hangs forever on a futex
# while the chip stays healthy (CLAUDE.md 2026-08-19, 3 incidents in 2 h).
# `timeout` alone bounds each loss at hours. Every chip stage here runs
# under guard(): its own session/process group, killed BY PGID (never by
# pattern) when its log mtime goes stale, then retried — training
# auto-resumes from its Orbax ckpt dir and eval stages are idempotent.
#
# Stages (all wipe-proof paths, each skipped when its artifact exists):
#   E1/E2: SGNN-adapted checkpoint on the EVAL half of the reference's
#          shipped ZINC test set (13C/HSQC/COSY, then 1H-only)
#   P3:    no-blank polish fine-tune on the 291k in-domain cache + evals
#          (plain + beam/mix pooled recall)
#   BM:    clean end-to-end bench, 3 reps
#   CL:    CLIP contrastive training + re-rank eval
#   IC:    improvement cycle, 120 held-out targets
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
# shared featurized-dataset disk cache (keyed by content digest; train-clip
# has no --feature-cache flag but reads the env var through the pipeline)
export MMT_FEATURE_CACHE=/root/repo/.cache/featcache_r3
REF=/root/reference/MMT_website/Runfolder/CSV_files
SGNN_PARAMS=/root/repo/.cache/run_r3_sgnn/params.msgpack
STALE=${STALE:-900}
LOG() { echo "[driver $(date +%H:%M:%S)] $*"; }

# total CPU ticks (utime+stime) of every process in process group $1 —
# distinguishes "hung on a dead relay socket" (0 CPU) from "XLA compiling
# host-side with no log output" (busy), which can legitimately stay quiet
# longer than any stale threshold on cold caches.
grp_cpu() {
  local g=$1 total=0 p rest
  for p in $(ps -eo pid=,pgid= | awk -v g="$g" '$2==g{print $1}'); do
    [ -r "/proc/$p/stat" ] || continue
    rest=$(sed 's/.*) //' "/proc/$p/stat" 2>/dev/null) || continue
    # after stripping "pid (comm) ": state=1, ..., utime=12, stime=13
    set -- $rest
    total=$((total + ${12:-0} + ${13:-0}))
  done
  echo "$total"
}

# guard <log> <hard-timeout-secs> <cmd...>
# Appends cmd's output to <log>. Kills the whole process group when the
# log goes stale >$STALE s AND the group burned <1 s CPU over the last
# check interval (idle-hang), or on the hard timeout. Returns the
# command's exit code, or 9 on a guard kill.
guard() {
  local log=$1 tmo=$2; shift 2
  # Liveness file: $WATCH if set (e.g. a metrics.jsonl that training appends
  # to — the train CLI prints NOTHING to stdout between steps, so watching
  # the stdout log makes every healthy >STALE-s run depend solely on the CPU
  # conjunct), else the stdout log. Staleness = newest mtime of either.
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

# retry <n> <log> <tmo> <cmd...>
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

# --- E1: SGNN-adapted ckpt on EVAL half, 13C/HSQC/COSY ---
if [ ! -f ACCURACY_r03sgnn.json ] && [ -f "$SGNN_PARAMS" ]; then
  LOG "E1: ref-testset EVAL half 13c,hsqc,cosy"
  retry 4 /tmp/e1.log 5400 python -u scripts/accuracy_report.py \
    --params "$SGNN_PARAMS" \
    --out runs/accuracy_r3_sgnn --tag r03sgnn --n 1000 \
    --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "E1 FAILED"
fi

# --- E2: 1H-only ---
if [ ! -f ACCURACY_r03sgnn1h.json ] && [ -f "$SGNN_PARAMS" ]; then
  LOG "E2: ref-testset EVAL half 1h"
  retry 4 /tmp/e2.log 5400 python -u scripts/accuracy_report.py \
    --params "$SGNN_PARAMS" \
    --out runs/accuracy_r3_sgnn1h --tag r03sgnn1h --n 1000 \
    --ref-testset "$REF" --ref-modalities 1h --ref-split eval \
    --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
    $EXC || LOG "E2 FAILED"
fi

# --- P3: polish fine-tune (featcache prewarmed) ---
# save-every 800 (was 3000): the silent-client-death hang recurred twice
# tonight at ~step 1050 and ~2650 — with save-every above the typical
# progress-before-hang, every retry restarted from step 0 and the stage
# could loop forever. Frequent Orbax ckpts make retries monotonic.
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
LOG "bench x3"
for i in 1 2 3; do
  guard /tmp/bench_r3_post.log 1500 python -u bench.py || LOG "bench rep $i failed"
done

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

# --- IC: improvement cycle at scale ---
if [ ! -f /root/repo/.cache/run_r3_ic/cycles.jsonl ]; then
  LOG "improvement cycle, 120 targets"
  # IC prints once per cycle (5-15 min of quiet is normal) — longer stale
  STALE=3600 \
  retry 2 /tmp/ic_120.log 12000 python -u -m multimodalspectraltransformer_tpu.cli improve \
    --smiles /root/repo/.cache/ic_targets_120.txt \
    --out /root/repo/.cache/run_r3_ic \
    --params weights/mmt_r3_phase1.msgpack.gz --cycles 8 --generations 30 \
    --model-neighbors --batch-size 16 --lr 5e-5 --threshold 0.4 || LOG "IC FAILED"
fi

LOG "ALL DONE"
