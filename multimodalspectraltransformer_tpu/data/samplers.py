"""Batch-ordering strategies: hard-negative mining for contrastive training.

Reference: `clip_functions_v15_4.py:117-187` — WeightSortedBatchSampler
(sort by MW, shuffle within windows so each batch holds similar-weight
molecules = hard negatives for CLIP) and TanimotoBatchSampler/create_batches
(anchor-based batches of structurally similar molecules). Both return an
epoch-long index order that data.pipeline.Loader consumes; batches are then
contiguous slices of that order.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..chem import api as chem


def shuffled_order(n: int, seed: int, epoch: int) -> np.ndarray:
    return np.random.default_rng((seed, epoch)).permutation(n)


def weight_sorted_order(
    smiles: Sequence[str], batch_size: int, seed: int, epoch: int,
    window_factor: int = 4,
) -> np.ndarray:
    """Sort by MW, then shuffle inside windows of window_factor*batch_size so
    consecutive batches contain near-equal-MW molecules without being
    byte-identical across epochs."""
    rng = np.random.default_rng((seed, epoch, 1))
    wts = chem.batch_exact_mol_wt(smiles)
    wts = np.where(np.isnan(wts), np.inf, wts)
    order = np.argsort(wts, kind="stable")
    window = max(batch_size * window_factor, 1)
    for lo in range(0, len(order), window):
        seg = order[lo : lo + window].copy()
        rng.shuffle(seg)
        order[lo : lo + window] = seg
    return order


def tanimoto_anchor_order(
    smiles: Sequence[str], batch_size: int, seed: int, epoch: int,
    n_bits: int = 512,
) -> np.ndarray:
    """Greedy anchor batches: pick a random unused anchor, fill its batch
    with the most Tanimoto-similar unused molecules (reference
    create_batches, `clip_functions_v15_4.py:33-94`). Similarities are
    computed one anchor ROW at a time — a full [n, n] float32 matrix is
    ~290 GB at the 269k-record corpora this repo trains (O(n) memory
    instead, same order)."""
    n = len(smiles)
    fps, valid = chem.batch_morgan_fp(smiles, n_bits=n_bits)
    from ..chem.fingerprint import batch_tanimoto

    rng = np.random.default_rng((seed, epoch, 2))
    unused = np.ones(n, dtype=bool)
    order: list[int] = []
    while unused.any():
        candidates = np.flatnonzero(unused)
        anchor = int(rng.choice(candidates))
        unused[anchor] = False
        batch = [anchor]
        if unused.any():
            row = batch_tanimoto(fps[anchor : anchor + 1], fps)[0]  # [n]
            if not valid[anchor]:
                row[:] = -1.0
            row[~valid] = -1.0
            sims = np.where(unused, row, -np.inf)
            take = min(batch_size - 1, int(unused.sum()))
            picked = np.argpartition(-sims, take - 1)[:take] if take > 0 else []
            for j in sorted(picked, key=lambda j: -sims[j]):
                if unused[j]:
                    unused[j] = False
                    batch.append(int(j))
        order.extend(batch)
    return np.asarray(order)


def epoch_order(
    strategy: str, smiles: Sequence[str], batch_size: int, seed: int, epoch: int
) -> np.ndarray:
    if strategy == "shuffle":
        return shuffled_order(len(smiles), seed, epoch)
    if strategy == "weight_sorted":
        return weight_sorted_order(smiles, batch_size, seed, epoch)
    if strategy == "tanimoto":
        return tanimoto_anchor_order(smiles, batch_size, seed, epoch)
    raise ValueError(f"unknown order strategy {strategy!r}")
