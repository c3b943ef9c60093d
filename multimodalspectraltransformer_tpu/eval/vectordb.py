"""Fingerprint vector DB: encode molecules into fingerprint vectors, store,
and retrieve nearest neighbors on-device.

Reference: `experiment_function_v15_4.py:122-340` — vectorize_db encodes the
dataset through the MMT fingerprint head to a CSV of (SMILES, 512-d vector);
find_knn / find_cos_sim_incremental retrieve via sklearn ball-tree or
batched numpy. Here retrieval is a single jitted matmul + top_k on the TPU
(MXU-friendly: [Q, D] x [D, N] in bfloat16), with structural (Morgan/
tanimoto) and learned (model fingerprint head) vector sources.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..chem import api as chem

Array = jax.Array


@dataclass
class VectorDB:
    smiles: list[str]
    vectors: np.ndarray  # [N, D] float32 (learned fp) or uint8 (Morgan bits)
    kind: str = "morgan"  # "morgan" | "model"

    def __len__(self) -> int:
        return len(self.smiles)

    # -- persistence (npz + json manifest; CSV export for reference parity) --
    def save(self, path: str) -> None:
        np.savez_compressed(path + ".npz", vectors=self.vectors)
        with open(path + ".json", "w") as f:
            json.dump({"smiles": self.smiles, "kind": self.kind}, f)

    @staticmethod
    def load(path: str) -> "VectorDB":
        with open(path + ".json") as f:
            meta = json.load(f)
        vectors = np.load(path + ".npz")["vectors"]
        return VectorDB(meta["smiles"], vectors, meta["kind"])

    def export_csv(self, path: str) -> None:
        """Reference-format CSV: SMILES column + one column per dim
        (`experiment_function_v15_4.py:122-162` vectorize_db)."""
        import pandas as pd

        df = pd.DataFrame(self.vectors)
        df.insert(0, "SMILES", self.smiles)
        df.to_csv(path, index=False)


def build_morgan_db(smiles_list: Sequence[str], n_bits: int = 512) -> VectorDB:
    """Structural DB from Morgan fingerprints (native batch kernel)."""
    fps, valid = chem.batch_morgan_fp(smiles_list, n_bits=n_bits)
    keep = [i for i in range(len(smiles_list)) if valid[i]]
    return VectorDB([smiles_list[i] for i in keep], fps[keep], kind="morgan")


def build_model_db(
    records: Sequence,
    params: Any,
    mcfg,
    batch_size: int = 256,
) -> VectorDB:
    """Learned DB: run the MMT encoder and collect the 512-d fingerprint head
    output per molecule (reference vectorize_db)."""
    from ..data import pipeline as dp
    from ..models import mmt

    model = mmt.MultimodalTransformer(mcfg)

    @jax.jit
    def encode(p, inputs):
        enc = model.apply({"params": p}, inputs, None, True)
        return enc.fingerprint

    smiles: list[str] = []
    vecs: list[np.ndarray] = []
    feats = []
    for r in records:
        f = dp.featurize(r, mcfg)
        if f is not None:
            feats.append(f)
    for lo in range(0, len(feats), batch_size):
        chunk = feats[lo : lo + batch_size]
        n_real = len(chunk)
        # pad the ragged tail to the static batch shape: a second shape is
        # a second full-encoder compile (~20-40 s on the TPU backend)
        padded = chunk + [chunk[-1]] * (batch_size - n_real)
        tb = dp.collate(padded)
        fp = np.asarray(encode(params, jax.tree.map(jnp.asarray, tb.inputs)))[:n_real]
        for f, v in zip(chunk, fp):
            smiles.append(f["smiles"])
            vecs.append(v)
    return VectorDB(smiles, np.stack(vecs) if vecs else np.zeros((0, 512), np.float32), kind="model")


# ---------------------------------------------------------------------------
# device retrieval
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "metric"))
def _topk_scores(queries: Array, db: Array, k: int, metric: str):
    """[Q, D] vs [N, D] -> (scores [Q, k], idx [Q, k]). bfloat16 matmul on
    the MXU, fp32 accumulation."""
    q = queries.astype(jnp.bfloat16)
    d = db.astype(jnp.bfloat16)
    inter = jnp.dot(q, d.T, preferred_element_type=jnp.float32)
    if metric == "dot":
        scores = inter
    elif metric == "cosine":
        qn = jnp.linalg.norm(queries.astype(jnp.float32), axis=1, keepdims=True)
        dn = jnp.linalg.norm(db.astype(jnp.float32), axis=1, keepdims=True)
        scores = inter / jnp.maximum(qn * dn.T, 1e-9)
    elif metric == "tanimoto":
        # binary fingerprints: |a&b| / (|a| + |b| - |a&b|)
        na = jnp.sum(queries.astype(jnp.float32), axis=1, keepdims=True)
        nb = jnp.sum(db.astype(jnp.float32), axis=1, keepdims=True)
        union = na + nb.T - inter
        scores = jnp.where(union > 0, inter / union, 0.0)
    elif metric == "euclidean":
        # negative distance so top_k = nearest
        qq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        dd = jnp.sum(db.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        scores = -(qq + dd.T - 2.0 * inter)
    else:
        raise ValueError(metric)
    return jax.lax.top_k(scores, k)


def query(
    db: VectorDB,
    query_vectors: np.ndarray,
    k: int = 10,
    metric: Optional[str] = None,
) -> tuple[np.ndarray, np.ndarray, list[list[str]]]:
    """Top-k retrieval. Returns (scores [Q, k], indices [Q, k], SMILES).
    Default metric: tanimoto for Morgan DBs, cosine for model DBs
    (reference find_knn/find_cos_sim, `experiment_function_v15_4.py:292-340`)."""
    if metric is None:
        metric = "tanimoto" if db.kind == "morgan" else "cosine"
    k = min(k, len(db))
    scores, idx = _topk_scores(
        jnp.asarray(query_vectors, dtype=jnp.float32),
        jnp.asarray(db.vectors, dtype=jnp.float32),
        k, metric,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    names = [[db.smiles[j] for j in row] for row in idx]
    return scores, idx, names


def query_smiles(db: VectorDB, smiles_list: Sequence[str], k: int = 10,
                 metric: Optional[str] = None):
    """Query a Morgan DB directly by SMILES."""
    fps, valid = chem.batch_morgan_fp(smiles_list, n_bits=db.vectors.shape[1])
    scores, idx, names = query(db, fps, k, metric)
    return scores, idx, names, valid
