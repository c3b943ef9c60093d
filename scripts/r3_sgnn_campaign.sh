#!/bin/bash
# Round-3 SGNN domain-adaptation campaign (the VERDICT's top item):
# fine-tune the MMT on a corpus simulated with the SGNN-ADAPTED shift GNN
# (sim/weights_sgnn, from scripts/sgnn_adapt.py) + the real ADAPT-half
# records, with consistent-axis warp + jitter + blanking augmentation,
# then score on the EVAL half of the reference's own shipped test set.
#
# Prerequisites (host, CPU-heavy — serialize around chip work):
#   python scripts/make_r3_corpus.py --out /root/repo/.cache/corpus_r3_300k.txt
#   python scripts/build_sgnn_corpus.py --corpus /root/repo/.cache/corpus_r3_300k.txt \
#       --orig-cache "" --out /root/repo/.cache/factory_sgnn.pkl --n 100000
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
REF=/root/reference/MMT_website/Runfolder/CSV_files
CACHE=${SGNN_CACHE:-/root/repo/.cache/factory_sgnn.pkl}
NREC=${SGNN_NREC:?pass SGNN_NREC=<record count printed by build_sgnn_corpus>}
P1=${SGNN_INIT:-weights/mmt_r3_phase1.msgpack.gz}
OUT=${SGNN_OUT:-/root/repo/.cache/run_r3_sgnn}
STEPS=${SGNN_STEPS:-18000}

probe() {
  echo "[sgnn-campaign] probing chip..."
  timeout 1500 python -u -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2+1)(np.ones((8,8),'float32'))
print('probe ok', float(np.asarray(x).sum()))
" || { echo '[sgnn-campaign] PROBE FAILED'; exit 17; }
}

probe

echo "=== fine-tune phase-1 on the SGNN-adapted corpus ==="
timeout 10000 python -u -m multimodalspectraltransformer_tpu.cli train \
  --factory "$NREC" --factory-seed 777 --factory-cache "$CACHE" \
  --params "$P1" \
  --out "$OUT" --bf16 --batch-size 64 --lr 5e-5 \
  --steps "$STEPS" --epochs 100 --save-every 3000 --val-n 1000 \
  --blank 0.2 --warp-13c 3.0 --warp-1h 0.25 --jitter-13c 1.0 --jitter-1h 0.08 \
  --log-every 50 --feature-cache /root/repo/.cache/featcache_sgnn \
  || exit 1

PS="$OUT/params.msgpack"
[ -f "$PS" ] || { echo "[sgnn-campaign] no checkpoint at $PS"; exit 1; }

echo "=== EVAL half, 13C/HSQC/COSY (the headline external benchmark) ==="
timeout 5400 python -u scripts/accuracy_report.py --params "$PS" \
  --out runs/accuracy_r3_sgnn --tag r03sgnn --n 1000 \
  --ref-testset "$REF" --ref-modalities 13c,hsqc,cosy --ref-split eval \
  --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
  --train-seed 21 --train-n 200000 --extra-exclude 11:150000 \
  --exclude-corpus-file /root/repo/.cache/corpus_r3_300k.txt

echo "=== EVAL half, 1H-only ==="
timeout 5400 python -u scripts/accuracy_report.py --params "$PS" \
  --out runs/accuracy_r3_sgnn1h --tag r03sgnn1h --n 1000 \
  --ref-testset "$REF" --ref-modalities 1h --ref-split eval \
  --sim-weights multimodalspectraltransformer_tpu/sim/weights_sgnn \
  --train-seed 21 --train-n 200000 --extra-exclude 11:150000 \
  --exclude-corpus-file /root/repo/.cache/corpus_r3_300k.txt

echo "=== export committed checkpoint ==="
python -u - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.train import checkpoint as ckpt
from multimodalspectraltransformer_tpu.utils.config import ModelConfig
import os
template = mmt.init_params(ModelConfig(), jax.random.PRNGKey(0))
out = os.environ.get("SGNN_OUT", "/root/repo/.cache/run_r3_sgnn")
params = ckpt.import_params_msgpack(template, f"{out}/params.msgpack")
ckpt.export_params_msgpack(params, "weights/mmt_r3_sgnn.msgpack.gz", dtype="bfloat16")
print("exported weights/mmt_r3_sgnn.msgpack.gz")
EOF

echo "[sgnn-campaign] ALL DONE $(date)"
