"""Simulation layer: graph featurization, GNN shift/IR models (train a tiny
one to prove learnability), reconstruction semantics, factory round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalspectraltransformer_tpu.chem.canonical import symmetry_classes
from multimodalspectraltransformer_tpu.chem.smiles import parse_smiles
from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.sim import factory, gnn, graphs, reconstruct


def test_featurize_graph_shapes():
    g = graphs.featurize_smiles("CC(=O)Oc1ccccc1C(=O)O", max_nodes=32)
    assert g is not None
    assert g.nodes.shape == (32, graphs.NODE_FEATURES)
    assert g.adj.shape == (4, 32, 32)
    assert g.n_atoms == 13
    assert g.node_mask.sum() == 13
    # aromatic bonds present in channel 3
    assert g.adj[3].sum() > 0
    # adjacency symmetric
    for t in range(4):
        np.testing.assert_array_equal(g.adj[t], g.adj[t].T)


def test_symmetry_classes_benzene_toluene():
    benzene = parse_smiles("c1ccccc1")
    assert len(set(symmetry_classes(benzene))) == 1
    toluene = parse_smiles("Cc1ccccc1")
    cls = symmetry_classes(toluene)
    # methyl C, ipso, 2 ortho (same), 2 meta (same), para -> 5 classes
    assert len(set(cls)) == 5


def test_reconstruct_13c_symmetry_dedup():
    mol = parse_smiles("Cc1ccccc1")  # toluene: 5 distinct carbons
    sh = factory.empirical_shifts(mol)
    peaks = reconstruct.reconstruct_13c(mol, sh)
    assert len(peaks) == 5


def test_reconstruct_1h_multiplets():
    mol = parse_smiles("CCO")  # ethanol: CH3 (triplet from CH2), CH2 (quartet)
    sh = factory.empirical_shifts(mol)
    peaks = reconstruct.reconstruct_1h(mol, sh)
    assert len(peaks) >= 5  # 3 (triplet) + 4 (quartet), minus rounding dedup
    total_intensity = sum(i for _, i in peaks)
    assert total_intensity == pytest.approx(5.0, abs=0.1)  # CH3+CH2 protons


def test_reconstruct_hsqc_cosy():
    mol = parse_smiles("CCO")
    sh = factory.empirical_shifts(mol)
    hsqc = reconstruct.reconstruct_hsqc(mol, sh)
    assert len(hsqc) == 2  # CH3, CH2 (O-H not C-bound)
    cosy = reconstruct.reconstruct_cosy(mol, sh)
    # diagonal (2) + cross peaks both directions (2)
    assert len(cosy) == 4


def test_filter_smiles():
    kept = factory.filter_smiles(["CCO", "bad(((", "CC(=O)[O-].[Na+]", "C" * 60])
    ids = [i for i, _ in kept]
    assert 0 in ids
    assert 1 not in ids  # invalid
    assert 2 not in ids  # disconnected
    assert 3 not in ids  # MW > 550


def test_factory_records_featurizable():
    recs = factory.simulate_records(["CCO", "c1ccccc1C(=O)O", "CC(C)CC"])
    assert len(recs) == 3
    from multimodalspectraltransformer_tpu.utils.config import ModelConfig

    for r in recs:
        f = dp.featurize(r, ModelConfig())
        assert f is not None
        assert f["mask_1h"].min() == 0  # real 1H points present
        assert f["mask_hsqc"].min() == 0


def test_factory_csv_export(tmp_path):
    recs = factory.simulate_records(["CCO", "CC(C)=O"])
    paths = factory.export_reference_csvs(recs, str(tmp_path))
    loaded = dp.load_spectra_csvs(paths["1H"], paths["13C"], paths["HSQC"], paths["COSY"])
    assert len(loaded) == 2
    assert loaded[0].hsqc is not None


def test_gnn_shift_model_learns():
    """Overfit the NMRShiftModel on empirical shifts of a few molecules —
    proves gradients flow through the dense MPNN."""
    smis = ["CCO", "c1ccccc1", "CC(=O)C", "CCN", "CCCC", "c1ccncc1"]
    gs, targets_c, masks = [], [], []
    for s in smis:
        mol = parse_smiles(s)
        g = graphs.featurize_mol(mol, 16)
        sh = factory.empirical_shifts(mol)
        t = np.zeros(16, np.float32)
        m = np.zeros(16, np.float32)
        for i, a in enumerate(mol.atoms):
            if a.symbol == "C":
                t[i] = (sh.shift_c[i] - 95.0) / 50.0
                m[i] = 1.0
        gs.append(g)
        targets_c.append(t)
        masks.append(m)
    batch = graphs.batch_graphs(gs)
    tc = jnp.asarray(np.stack(targets_c))
    mc = jnp.asarray(np.stack(masks))

    model = gnn.NMRShiftModel(hidden=64, steps=3)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["nodes"]), jnp.asarray(batch["adj"]), jnp.asarray(batch["node_mask"]))["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            c, h = model.apply({"params": p}, batch["nodes"], batch["adj"], batch["node_mask"])
            return jnp.sum(jnp.square(c - tc) * mc) / jnp.sum(mc)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt2, loss

    first = None
    for _ in range(150):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.1, (first, float(loss))


def test_ir_model_output():
    model = gnn.IRModel(hidden=32, steps=2, bins=100)
    g = graphs.featurize_smiles("CCO", 16)
    batch = graphs.batch_graphs([g])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["nodes"]), jnp.asarray(batch["adj"]), jnp.asarray(batch["node_mask"]))["params"]
    spec = model.apply({"params": params}, batch["nodes"], batch["adj"], batch["node_mask"])
    assert spec.shape == (1, 100)
    assert (np.asarray(spec) >= 0).all()  # softplus non-negative
