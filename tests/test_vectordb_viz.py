"""Vector DB retrieval, clustering/visualization exports, and hard-negative
batch samplers (reference: `experiment_function_v15_4.py:122-340`,
`clustering_visualization_v15_4.py`, `clip_functions_v15_4.py:117-187`)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from multimodalspectraltransformer_tpu.chem import api as chem
from multimodalspectraltransformer_tpu.data import samplers
from multimodalspectraltransformer_tpu.eval import clustering, vectordb

SMILES = [
    "CCO", "CCCO", "CCCCO",          # alcohols (similar)
    "c1ccccc1", "Cc1ccccc1", "CCc1ccccc1",  # aromatics (similar)
    "CC(=O)O", "CCC(=O)O",           # acids
    "C1CCCCC1",
]


def test_morgan_db_self_retrieval():
    db = vectordb.build_morgan_db(SMILES)
    assert len(db) == len(SMILES)
    scores, idx, names, valid = vectordb.query_smiles(db, ["CCO", "c1ccccc1"], k=3)
    assert valid.all()
    # top hit is the molecule itself with tanimoto 1.0
    assert names[0][0] == "CCO" and abs(scores[0][0] - 1.0) < 1e-6
    assert names[1][0] == "c1ccccc1" and abs(scores[1][0] - 1.0) < 1e-6
    # neighbors of ethanol are the other alcohols, not benzene
    assert set(names[0][1:]) <= {"CCCO", "CCCCO", "CC(=O)O", "CCC(=O)O"}


def test_db_save_load_roundtrip(tmp_path):
    db = vectordb.build_morgan_db(SMILES)
    path = str(tmp_path / "db")
    db.save(path)
    db2 = vectordb.VectorDB.load(path)
    assert db2.smiles == db.smiles and (db2.vectors == db.vectors).all()
    csv = str(tmp_path / "db.csv")
    db.export_csv(csv)
    assert os.path.getsize(csv) > 0


def test_metrics_cosine_euclidean_dot():
    db = vectordb.build_morgan_db(SMILES)
    q = db.vectors[:2].astype(np.float32)
    for metric in ("cosine", "euclidean", "dot", "tanimoto"):
        scores, idx, names = vectordb.query(db, q, k=2, metric=metric)
        assert idx.shape == (2, 2)
        assert idx[0, 0] == 0 and idx[1, 1] != idx[1, 0]


def test_pca_and_tsne_embed():
    db = vectordb.build_morgan_db(SMILES)
    for method in ("pca", "tsne", "umap"):  # umap = first-party eval/umap.py
        coords = clustering.embed(db.vectors, method=method)
        assert coords.shape == (len(SMILES), 2)
        assert np.isfinite(coords).all()


def test_cluster_plot_exports(tmp_path):
    db = vectordb.build_morgan_db(SMILES)
    coords = clustering.pca(db.vectors)
    labels = clustering.mw_labels(db.smiles)
    png = clustering.cluster_plot_png(coords, labels, str(tmp_path / "c.png"))
    assert os.path.getsize(png) > 1000
    html = clustering.cluster_plot_html(coords, db.smiles, str(tmp_path / "c.html"), labels)
    text = open(html).read()
    assert "<svg" in text and "CCO" in text
    assert clustering.formula_labels(["CCO"]) == ["C2H6O"]


def test_weight_sorted_order_batches_similar_mw():
    smiles = SMILES * 3
    order = samplers.weight_sorted_order(smiles, batch_size=3, seed=0, epoch=0)
    assert sorted(order.tolist()) == list(range(len(smiles)))
    wts = chem.batch_exact_mol_wt([smiles[i] for i in order])
    # windowed-sorted: spread within a window is far below the global spread
    spread = np.ptp(wts)
    win_spreads = [np.ptp(wts[i : i + 12]) for i in range(0, len(wts) - 12, 12)]
    assert np.mean(win_spreads) < spread


def test_tanimoto_anchor_order_groups_similars():
    order = samplers.tanimoto_anchor_order(SMILES, batch_size=3, seed=1, epoch=0)
    assert sorted(order.tolist()) == list(range(len(SMILES)))
    # first batch should contain structurally similar molecules: check that
    # its mean pairwise tanimoto beats the global mean
    fps, _ = chem.batch_morgan_fp(SMILES)
    from multimodalspectraltransformer_tpu.chem.fingerprint import batch_tanimoto

    sim = batch_tanimoto(fps, fps)
    first = order[:3]
    batch_sim = np.mean([sim[a, b] for a in first for b in first if a != b])
    global_sim = (sim.sum() - np.trace(sim)) / (sim.size - len(SMILES))
    assert batch_sim > global_sim


def test_loader_order_strategy():
    from multimodalspectraltransformer_tpu.data import pipeline as dp
    from multimodalspectraltransformer_tpu.utils.config import ModelConfig

    records = dp.synthetic_dataset(12, seed=0)
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    loader = dp.Loader(records, mcfg, batch_size=4, order_strategy="weight_sorted")
    batches = list(loader.epoch(0))
    assert len(batches) >= 2


def test_umap_separates_clusters():
    """First-party UMAP (eval/umap.py): well-separated input clusters stay
    separated in the layout, deterministically."""
    import numpy as np

    from multimodalspectraltransformer_tpu.eval.umap import umap_embed

    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.3, (60, 32))
    b = rng.normal(4, 0.3, (60, 32))
    x = np.concatenate([a, b])
    e = umap_embed(x, n_epochs=100, random_state=1)
    assert e.shape == (120, 2)
    sep = np.linalg.norm(e[:60].mean(0) - e[60:].mean(0))
    spread = max(e[:60].std(), e[60:].std())
    assert sep > 2 * spread
    e2 = umap_embed(x, n_epochs=100, random_state=1)
    np.testing.assert_array_equal(e, e2)


def test_umap_duplicate_rows_stay_finite():
    """Duplicate input vectors (identical fingerprints) are mutual kNN
    neighbors with coincident PCA-init coordinates; the attractive gradient
    must not emit inf/NaN for them (regression: 0**(b-1) = inf)."""
    import numpy as np

    from multimodalspectraltransformer_tpu.eval.umap import umap_embed

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1.0, (40, 16))
    x[1] = x[0]  # exact duplicate pair
    x[21] = x[20]
    e = umap_embed(x, n_epochs=60, random_state=2)
    assert np.isfinite(e).all()
