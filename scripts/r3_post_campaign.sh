#!/bin/bash
# Round-3 post-campaign chain: waits for the SGNN domain-adaptation campaign
# to finish, retries it if the tunnel wedge killed the training leg (the
# train auto-resumes from its Orbax ckpt dir), then runs the remaining
# chip-serialized round-3 work:
#   P3:  no-blank polish fine-tune on the 291k in-domain cache + eval
#   BM:  clean end-to-end bench, 3 reps (BENCH_MODE default)
#   CL:  CLIP contrastive training on the 291k corpus + re-rank eval
#   IC:  improvement cycle, 120 held-out targets, convergence curve
# All paths wipe-proof (/root/repo/.cache). Probe-gated per stage.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
CAMPAIGN_PID=${CAMPAIGN_PID:-}
LOG() { echo "[post-campaign $(date +%H:%M:%S)] $*"; }

probe() {
  LOG "probing chip..."
  timeout 1800 python -u -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2+1)(np.ones((8,8),'float32'))
print('probe ok', float(np.asarray(x).sum()))
" && return 0
  LOG "probe failed; waiting 10 min quietly and retrying once"
  sleep 600
  timeout 1800 python -u -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2+1)(np.ones((8,8),'float32'))
print('probe ok', float(np.asarray(x).sum()))
" || { LOG "PROBE FAILED twice"; return 17; }
}

# --- wait for the in-flight campaign ---
if [ -n "$CAMPAIGN_PID" ]; then
  LOG "waiting for campaign pid $CAMPAIGN_PID"
  while kill -0 "$CAMPAIGN_PID" 2>/dev/null; do sleep 60; done
  LOG "campaign exited"
fi

# --- retry the campaign if its training leg died (auto-resumes) ---
for attempt in 1 2; do
  if [ -f /root/repo/.cache/run_r3_sgnn/params.msgpack ] && \
     [ -f ACCURACY_r03sgnn.json ]; then break; fi
  LOG "campaign incomplete (attempt $attempt); re-running"
  probe || exit 17
  SGNN_NREC=107808 SGNN_CACHE=/root/repo/.cache/factory_sgnn.pkl \
    SGNN_OUT=/root/repo/.cache/run_r3_sgnn \
    bash scripts/r3_sgnn_campaign.sh >> /tmp/sgnn_campaign_retry.log 2>&1
done

# --- P3: polish fine-tune (featcache prewarmed by prewarm_featcache.py) ---
if [ ! -f /root/repo/.cache/run_r3_phase3/params.msgpack ]; then
  probe || exit 17
  LOG "P3 polish fine-tune"
  P3_CACHE=/root/repo/.cache/factory_r3_300k.pkl \
  P3_INIT=weights/mmt_r3_phase1.msgpack.gz \
  P3_OUT=/root/repo/.cache/run_r3_phase3 \
    bash scripts/r3_phase3_polish.sh > /tmp/phase3.log 2>&1 || LOG "P3 FAILED"
fi

# --- BM: clean bench, 3 reps ---
probe || exit 17
LOG "bench 3 reps"
for i in 1 2 3; do
  timeout 1200 python -u bench.py >> /tmp/bench_r3_post.log 2>&1
done
tail -3 /tmp/bench_r3_post.log

# --- CL: CLIP contrastive training + re-rank eval ---
if [ ! -f /root/repo/.cache/run_r3_clip/clip.msgpack ]; then
  probe || exit 17
  LOG "CLIP training"
  timeout 10000 python -u -m multimodalspectraltransformer_tpu.cli train-clip \
    --factory 291006 --factory-seed 3133 \
    --factory-cache /root/repo/.cache/factory_r3_300k.pkl \
    --params weights/mmt_r3_phase1.msgpack.gz --tower clip \
    --out /root/repo/.cache/run_r3_clip --steps 20000 --epochs 20 \
    --batch-size 256 --lr 1e-4 --eval-n 256 --log-every 100 \
    > /tmp/clip_r3.log 2>&1 || LOG "CLIP FAILED"
fi
if [ -f /root/repo/.cache/run_r3_clip/clip.msgpack ] && \
   [ ! -f ACCURACY_r03clip.json ]; then
  probe || exit 17
  LOG "CLIP re-rank eval"
  mkdir -p runs/accuracy_r3_clip
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_clip/
  CLIP_EVAL_PARAMS=/root/repo/.cache/run_r3_phase3/params.msgpack
  [ -f "$CLIP_EVAL_PARAMS" ] || CLIP_EVAL_PARAMS=weights/mmt_r3_phase1.msgpack.gz
  timeout 5400 python -u scripts/accuracy_report.py \
    --params "$CLIP_EVAL_PARAMS" \
    --out runs/accuracy_r3_clip --tag r03clip --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --clip-params /root/repo/.cache/run_r3_clip/clip.msgpack \
    > /tmp/clip_rerank.log 2>&1 || LOG "CLIP re-rank eval FAILED"
fi

# --- IC: improvement cycle at scale ---
if [ ! -f /root/repo/.cache/run_r3_ic/cycles.jsonl ]; then
  probe || exit 17
  LOG "improvement cycle, 120 targets"
  timeout 12000 python -u -m multimodalspectraltransformer_tpu.cli improve \
    --smiles /root/repo/.cache/ic_targets_120.txt \
    --out /root/repo/.cache/run_r3_ic \
    --params weights/mmt_r3_phase1.msgpack.gz --cycles 8 --generations 30 \
    --model-neighbors --batch-size 16 --lr 5e-5 --threshold 0.4 \
    > /tmp/ic_120.log 2>&1 || LOG "IC FAILED"
fi

LOG "ALL DONE"
