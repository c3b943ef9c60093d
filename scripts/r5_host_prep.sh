#!/bin/bash
# Round-5 host prep: scale the simulator-matched zinclike corpus to 1M
# unique molecules (VERDICT r4 task 1 — the external-testset zero is a
# corpus-scale/sharpness gap; reference trains on 5M ZINC molecules,
# `ML_NMR_5M_XL_*` CSVs). Chain: 850k NEW zinclike (dedup vs the r4 150k)
# -> 1M merged corpus -> adapted-sim factory (no IR, SGNN-adapted GNN)
# + 488 real adapt records x32 + 50k in-domain anchors -> featcache.
# All CPU, nice -19 (CLAUDE.md: niced host jobs coexist with chip runs).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .cache
LOG() { echo "[r5-prep $(date +%H:%M:%S)] $*"; }
N() { nice -n 19 "$@"; }

# 1. 850k new zinclike molecules (optimized generator, ~1000 mol/s)
if [ ! -s .cache/corpus_zinclike_850k.txt ]; then
  LOG "generating corpus_zinclike_850k.txt"
  N python -u scripts/zinc_corpus.py --out .cache/corpus_zinclike_850k.txt \
    --n 850000 --seed 51 --mutate 0.3 \
    --exclude .cache/corpus_zinclike_150k.txt \
    || { LOG "zinc_corpus FAILED"; exit 1; }
fi
LOG "850k corpus: $(wc -l < .cache/corpus_zinclike_850k.txt) SMILES"

# 2. merged 1M corpus (r4 150k first so its records keep their spectra keys)
if [ ! -s .cache/corpus_zinclike_1m.txt ]; then
  cat .cache/corpus_zinclike_150k.txt .cache/corpus_zinclike_850k.txt \
    > .cache/corpus_zinclike_1m.txt
fi
NC=$(wc -l < .cache/corpus_zinclike_1m.txt)
LOG "merged corpus: $NC SMILES"

# 3. adapted-sim factory over the full 1M (~230 mol/s => ~75 min)
if [ ! -f .cache/factory_z1m.pkl ]; then
  LOG "building factory_z1m.pkl"
  N python -u scripts/build_sgnn_corpus.py \
    --corpus .cache/corpus_zinclike_1m.txt \
    --orig-cache .cache/factory_r3_300k.pkl \
    --out .cache/factory_z1m.pkl --n 1000000 --real-dup 32 --orig-frac 0.05 \
    --key-seed 555 \
    || { LOG "build_sgnn_corpus FAILED"; exit 1; }
fi
NZ=$(python -c "import pickle; print(pickle.load(open('.cache/factory_z1m.pkl','rb'))['n'])")
LOG "factory_z1m: $NZ records"

# 4. prewarm the featcache so the chip fine-tune starts instantly
if [ ! -f .cache/featcache_z1m.PREWARMED ]; then
  LOG "prewarming featcache_z1m"
  N python -u scripts/prewarm_featcache.py \
    --factory "$NZ" --factory-seed 555 --factory-cache .cache/factory_z1m.pkl \
    --val-n 1000 --augment 1 --feature-cache .cache/featcache_z1m \
    || { LOG "z1m prewarm FAILED"; exit 1; }
  touch .cache/featcache_z1m.PREWARMED
fi
echo "$NZ" > .cache/factory_z1m.READY
LOG "Z1M path READY (n=$NZ)"
