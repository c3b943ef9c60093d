"""Reproducible recipe for the round-3 phase-2 training corpus.

The round-2 campaign trained on a flat 200k seed-21 corpus; its accuracy
report showed the 0-250 Da band trailing the reference (0.795 vs 0.911 MNS)
while the two heavier bands were at/above parity — and the corpus MW
histogram under-represents light molecules (the generator's acceptance
band is 80-550 uniform-ish by construction, but sub-250 chemistry is
simpler and saturates dedup faster). Round 3 therefore *stratifies*: the
200k seed-21 base plus two 50k banded slabs (seed 31 @ 80-250 Da, seed 32
@ 250-350 Da), merged + deduped.

Reference counterpart: the data-gen stage of `scripts/script_PC_0_250.py`
(chunked gen_sim_aug_data loop, lines 105-141 of
`utils_MMT/execution_function_v15_4.py`), which likewise re-draws its
corpus per MW band (ZINC_0_250 / 250_350 / 350_500 splits).

Usage (host; ~10 min):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/make_r3_corpus.py \
        --out /tmp/corpus_r3_300k.txt
Then simulate (hours, host):
    python scripts/build_factory_cache.py --corpus /tmp/corpus_r3_300k.txt \
        --n <printed count> --seed 3133 --out /tmp/factory_r3_300k.pkl --cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLABS = (
    # (n, seed, min_mw, max_mw) — seed-21 200k is the round-2 base corpus;
    # the two 50k slabs stratify the bands the accuracy report flagged.
    (200_000, 21, 80.0, 550.0),
    (50_000, 31, 80.0, 250.0),
    (50_000, 32, 250.0, 350.0),
)


def build(progress: bool = True) -> list[str]:
    from multimodalspectraltransformer_tpu.data import molrandom

    seen: set[str] = set()
    out: list[str] = []
    for n, seed, lo, hi in SLABS:
        t0 = time.time()
        slab = molrandom.random_corpus(n, seed=seed, min_mw=lo, max_mw=hi)
        fresh = [s for s in slab if s not in seen]
        seen.update(fresh)
        out.extend(fresh)
        if progress:
            print(
                f"slab seed={seed} band=[{lo:.0f},{hi:.0f}]: {len(slab)} drawn, "
                f"{len(fresh)} new ({time.time()-t0:.0f}s) -> total {len(out)}",
                flush=True,
            )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    corpus = build()
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(corpus) + "\n")
    os.replace(tmp, args.out)
    print(f"wrote {args.out}: {len(corpus)} molecules", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
