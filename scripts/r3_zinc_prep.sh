#!/bin/bash
# Host-side prep chain for the ZINC-chemotype campaign. Runs nice -19
# alongside chip work (CLAUDE.md: niced host jobs coexist with the
# dispatch loop; un-niced ones starve it).
#
#   1. wait for scripts/zinc_corpus.py to finish writing the corpus
#   2. simulate it through the SGNN-adapted shift GNN + mix real adapt
#      records + in-domain anchor (build_sgnn_corpus.py)
#   3. prewarm the featurized-dataset cache so the chip fine-tune starts
#      instantly
#   4. write .cache/factory_zinc.READY containing the record count for
#      the chip driver (scripts/r3_driver2.sh) to pick up
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
CORPUS=/root/repo/.cache/corpus_zinclike_150k.txt
OUT=/root/repo/.cache/factory_zinc.pkl
FEAT=/root/repo/.cache/featcache_zinc
LOG() { echo "[zinc-prep $(date +%H:%M:%S)] $*"; }

LOG "waiting for $CORPUS"
while [ ! -s "$CORPUS" ] || kill -0 "$(cat /tmp/zinc_gen.pid 2>/dev/null)" 2>/dev/null; do
  sleep 20
done
LOG "corpus ready: $(wc -l < "$CORPUS") SMILES"

if [ ! -f "$OUT" ]; then
  nice -n 19 python -u scripts/build_sgnn_corpus.py \
    --corpus "$CORPUS" \
    --orig-cache /root/repo/.cache/factory_r3_300k.pkl \
    --out "$OUT" --n 120000 --real-dup 8 --orig-frac 0.2 --key-seed 888 \
    || { LOG "build_sgnn_corpus FAILED"; exit 1; }
fi

N=$(python -c "
import pickle
print(pickle.load(open('$OUT','rb'))['n'])")
LOG "factory cache has $N records; prewarming featcache"

nice -n 19 python -u scripts/prewarm_featcache.py \
  --factory "$N" --factory-seed 888 --factory-cache "$OUT" \
  --val-n 1000 --augment 1 --feature-cache "$FEAT" \
  || { LOG "prewarm FAILED"; exit 1; }

echo "$N" > /root/repo/.cache/factory_zinc.READY
LOG "ALL DONE (n=$N)"
