#!/bin/bash
# Phase-3: full-modality polish — fine-tune phase-1 WITHOUT blanking/jitter
# to restore in-domain sharpness (greedy + 0-250 band); blanking is a
# device-side transform so the featurized cache is reused as-is.
#
# Prerequisite (host): the in-domain 291k keyed cache —
#   python scripts/make_r3_corpus.py --out /root/repo/.cache/corpus_r3_300k.txt
#   python scripts/build_factory_cache.py --corpus /root/repo/.cache/corpus_r3_300k.txt \
#       --n 291006 --seed 3133 --out /root/repo/.cache/factory_r3_300k.pkl --cpu
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
CACHE=${P3_CACHE:-/root/repo/.cache/factory_r3_300k.pkl}
INIT=${P3_INIT:-weights/mmt_r3_phase1.msgpack.gz}
OUT=${P3_OUT:-/root/repo/.cache/run_r3_phase3}
timeout 9000 python -u -m multimodalspectraltransformer_tpu.cli train \
  --factory 291006 --factory-seed 3133 --factory-cache "$CACHE" \
  --params "$INIT" \
  --out "$OUT" --bf16 --batch-size 64 --lr 3e-5 \
  --steps 15000 --epochs 100 --save-every 3000 --val-n 1000 \
  --augment 2 --log-every 50 --feature-cache /root/repo/.cache/featcache_r3
P3="$OUT/params.msgpack"
if [ -f "$P3" ]; then
  mkdir -p runs/accuracy_r3_p3
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_p3/
  timeout 5400 python -u scripts/accuracy_report.py --params "$P3" \
    --out runs/accuracy_r3_p3 --tag r03p3 --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz
  # pool-recall variant: beam hypotheses + greedy folded into the MNS
  # candidate pool (the flat top-k curve says recall, not ranking, binds
  # the 0-250 band — VERDICT r2 missing #4)
  mkdir -p runs/accuracy_r3_p3bm
  cp runs/accuracy_r3/heldout_smiles.json runs/accuracy_r3_p3bm/
  timeout 5400 python -u scripts/accuracy_report.py --params "$P3" \
    --out runs/accuracy_r3_p3bm --tag r03p3bm --n 982 \
    --records-cache runs/accuracy_r2b/heldout_csv.tar.gz \
    --beam 5 --mix
fi
