#!/bin/bash
# (committed copy of /tmp/run_evals.sh — the round-3 post-training eval battery
# launched by the phase-1 -> phase-2 -> evals chain; see git history for context)
# Post-training eval battery (runs serialized on the chip).
# A: phase-1 ckpt on the pinned in-domain held-out (headline, same protocol as r2)
# B: phase-2 ckpt on the same (cost of domain-randomization fine-tune)
# C: phase-2 on the reference's shipped ZINC test set (13C/HSQC/COSY)
# D: phase-2 on the reference's 1H-only ZINC test set
# E: phase-1 on the ref test set (what phase-2's jitter training buys)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
REF=/root/reference/MMT_website/Runfolder/CSV_files
P1=/tmp/run_r3_phase1/params.msgpack
P2=/tmp/run_r3_phase2/params.msgpack
EXC="--train-seed 21 --train-n 200000 --extra-exclude 11:150000 --exclude-corpus-file /tmp/corpus_r3_300k.txt"

probe() {
  echo "[evals] probing chip..."
  timeout 1500 python -u -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2+1)(np.ones((8,8),'float32'))
print('probe ok', float(np.asarray(x).sum()))
" || { echo '[evals] PROBE FAILED'; exit 17; }
}

probe
[ -f "$P1" ] || { echo "[evals] missing $P1"; exit 1; }

echo "=== A: phase-1 in-domain pinned held-out ==="
timeout 5400 python -u scripts/accuracy_report.py --params "$P1" \
  --out runs/accuracy_r3 --tag r03 --n 982 \
  --records-cache runs/accuracy_r2b/heldout_csv.tar.gz

if [ -f "$P2" ]; then
  echo "=== B: phase-2 in-domain pinned held-out ==="
  timeout 5400 python -u scripts/accuracy_report.py --params "$P2" \
    --out runs/accuracy_r3 --tag r03p2 --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz

  echo "=== C: phase-2 on reference ZINC test set (13C/HSQC/COSY) ==="
  timeout 5400 python -u scripts/accuracy_report.py --params "$P2" \
    --out runs/accuracy_r3_ref --tag r03ref --n 1000 \
    --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy $EXC

  echo "=== D: phase-2 on reference 1H-only ZINC test set ==="
  timeout 5400 python -u scripts/accuracy_report.py --params "$P2" \
    --out runs/accuracy_r3_ref1h --tag r03ref1h --n 1000 \
    --ref-testset "$REF" --ref-modalities 1h $EXC
fi

echo "=== E: phase-1 on reference ZINC test set (13C/HSQC/COSY) ==="
timeout 5400 python -u scripts/accuracy_report.py --params "$P1" \
  --out runs/accuracy_r3_ref_p1 --tag r03refp1 --n 1000 \
  --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy $EXC

BEST="$P2"; [ -f "$BEST" ] || BEST="$P1"

echo "=== F: real experimental-data demo (AZ molecules) ==="
timeout 3600 python -u scripts/real_data_demo.py --params "$BEST"

echo "=== G: CLIP contrastive training (MW-sorted hard negatives) ==="
timeout 7200 python -u -m multimodalspectraltransformer_tpu.cli train-clip \
  --factory 291006 --factory-seed 3133 --factory-cache /tmp/factory_r3_300k.pkl \
  --params "$P1" --tower clip \
  --out /tmp/run_r3_clip --steps 20000 --epochs 20 --batch-size 256 \
  --lr 1e-4 --eval-n 256 --log-every 100

if [ -f /tmp/run_r3_clip/clip.msgpack ]; then
  echo "=== G2: CLIP re-ranking effect on top-k (same pinned held-out) ==="
  mkdir -p runs/accuracy_r3_clip
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_clip/  # pinned 982
  timeout 5400 python -u scripts/accuracy_report.py --params "$P1" \
    --out runs/accuracy_r3_clip --tag r03clip --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --clip-params /tmp/run_r3_clip/clip.msgpack
fi

echo "=== I: tail-averaged phase-1 checkpoint (Polyak mean of last 3 saves) ==="
PAVG=/tmp/run_r3_phase1/params_avg.msgpack
timeout 1200 python -u scripts/average_checkpoints.py \
  --ckpt-dir /tmp/run_r3_phase1/ckpt --out "$PAVG" --last 3 --bf16 \
  && mkdir -p runs/accuracy_r3_avg \
  && cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_avg/ \
  && timeout 5400 python -u scripts/accuracy_report.py --params "$PAVG" \
       --out runs/accuracy_r3_avg --tag r03avg --n 982 \
       --records-cache runs/accuracy_r2b/heldout_csv.tar.gz


echo "=== P3: no-blank polish fine-tune + eval ==="
bash /tmp/run_phase3.sh

echo "=== H: improvement cycle, 120 held-out targets, convergence curve ==="
timeout 10000 python -u -m multimodalspectraltransformer_tpu.cli improve \
  --smiles /tmp/ic_targets_120.txt --out /tmp/run_r3_ic \
  --params "$BEST" --cycles 8 --generations 30 --model-neighbors \
  --batch-size 16 --lr 5e-5 --threshold 0.4 > /tmp/ic_120.json 2>/tmp/ic_120.log

echo "[evals] ALL DONE $(date)"
