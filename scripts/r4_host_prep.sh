#!/bin/bash
# Round-4 host-side regeneration chain. /tmp was wiped between rounds, and
# .cache/ never got populated in round 3 — every artifact the campaign driver
# (scripts/r3_driver2.sh) gates on must be rebuilt. Everything here is CPU,
# nice -19 (CLAUDE.md: niced host jobs coexist with the chip dispatch loop),
# and serialized (ONE cpu on this box).
#
# Order is ZC-critical-path first: the ZINC-chemotype fine-tune is the
# round's top verdict item and is gated on corpus -> 300k factory (anchor) ->
# adapted-sim zinc factory -> featcache prewarm -> READY marker.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .cache
LOG() { echo "[r4-prep $(date +%H:%M:%S)] $*"; }
N() { nice -n 19 "$@"; }

# 1. deterministic 300k molrandom corpus (seeds 21/31/32, ~10 min)
if [ ! -s .cache/corpus_r3_300k.txt ]; then
  LOG "regenerating corpus_r3_300k.txt"
  N python -u scripts/make_r3_corpus.py --out .cache/corpus_r3_300k.txt \
    || { LOG "make_r3_corpus FAILED"; exit 1; }
fi
NC=$(wc -l < .cache/corpus_r3_300k.txt)
LOG "corpus_r3_300k: $NC SMILES"

# 2. ZINC-chemotype fragment-recombination corpus
if [ ! -s .cache/corpus_zinclike_150k.txt ]; then
  LOG "generating corpus_zinclike_150k.txt"
  N python -u scripts/zinc_corpus.py --out .cache/corpus_zinclike_150k.txt \
    --n 150000 --seed 41 --mutate 0.3 \
    || { LOG "zinc_corpus FAILED"; exit 1; }
fi
LOG "zinclike corpus: $(wc -l < .cache/corpus_zinclike_150k.txt) SMILES"

# 3. in-domain 300k factory cache (old simulator, with IR) — anchor slice for
#    the zinc mixture AND the P3/CLIP training corpus
if [ ! -f .cache/factory_r3_300k.pkl ]; then
  LOG "building factory_r3_300k.pkl (n=$NC keyed 291006 seed 3133)"
  N python -u scripts/build_factory_cache.py \
    --corpus .cache/corpus_r3_300k.txt --n 291006 --seed 3133 \
    --out .cache/factory_r3_300k.pkl --cpu \
    || { LOG "build_factory_cache FAILED"; exit 1; }
fi

# 4. adapted-sim ZINC mixture factory (r3_zinc_prep.sh step 2)
if [ ! -f .cache/factory_zinc.pkl ]; then
  LOG "building factory_zinc.pkl"
  N python -u scripts/build_sgnn_corpus.py \
    --corpus .cache/corpus_zinclike_150k.txt \
    --orig-cache .cache/factory_r3_300k.pkl \
    --out .cache/factory_zinc.pkl --n 120000 --real-dup 8 --orig-frac 0.2 \
    --key-seed 888 \
    || { LOG "build_sgnn_corpus FAILED"; exit 1; }
fi
NZ=$(python -c "import pickle; print(pickle.load(open('.cache/factory_zinc.pkl','rb'))['n'])")
LOG "factory_zinc: $NZ records"

# 5. prewarm the zinc featcache so the chip fine-tune starts instantly
if [ ! -f .cache/featcache_zinc.PREWARMED ]; then
  LOG "prewarming featcache_zinc"
  N python -u scripts/prewarm_featcache.py \
    --factory "$NZ" --factory-seed 888 --factory-cache .cache/factory_zinc.pkl \
    --val-n 1000 --augment 1 --feature-cache .cache/featcache_zinc \
    || { LOG "zinc prewarm FAILED"; exit 1; }
  touch .cache/featcache_zinc.PREWARMED
fi
echo "$NZ" > .cache/factory_zinc.READY
LOG "ZC path READY (n=$NZ)"

# 6. improvement-cycle target list: first 120 pinned held-out molecules
if [ ! -s .cache/ic_targets_120.txt ]; then
  python -c "
import json
s = json.load(open('runs/accuracy_r3/heldout_smiles.json'))[:120]
open('.cache/ic_targets_120.txt','w').write('\n'.join(s)+'\n')
print('wrote', len(s), 'IC targets')"
fi

# 7. prewarm the in-domain featcache for P3/CLIP (augment 2 like the P3 run)
if [ ! -f .cache/featcache_r3.PREWARMED ]; then
  LOG "prewarming featcache_r3 (augment 2)"
  N python -u scripts/prewarm_featcache.py \
    --factory 291006 --factory-seed 3133 \
    --factory-cache .cache/factory_r3_300k.pkl \
    --val-n 1000 --augment 2 --feature-cache .cache/featcache_r3 \
    || { LOG "r3 prewarm FAILED"; exit 1; }
  touch .cache/featcache_r3.PREWARMED
fi
LOG "ALL DONE"
