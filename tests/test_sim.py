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
    """Ethanol: CH3 triplet (J=6.3 Hz, intensities 0.5/1/0.5 — reference
    rule table `data_generation_v15_4.py:338-343`) + CH2 quartet (J=7.0,
    2/6..4/6 — `:345-351`)."""
    mol = parse_smiles("CCO")
    sh = factory.empirical_shifts(mol)
    peaks = reconstruct.reconstruct_1h(mol, sh)
    assert len(peaks) == 7  # 3 triplet + 4 quartet lines
    triplet = sorted(peaks)[:3]
    quartet = sorted(peaks)[3:]
    assert [round(v, 2) for _, v in triplet] == [0.5, 1.0, 0.5]
    assert [round(v, 2) for _, v in quartet] == pytest.approx([1 / 3, 2 / 3, 2 / 3, 1 / 3], abs=0.01)
    # line spacing = J / 400 MHz
    assert triplet[1][0] - triplet[0][0] == pytest.approx(6.3 / 400.0, abs=1e-3)
    assert quartet[1][0] - quartet[0][0] == pytest.approx(7.0 / 400.0, abs=1e-3)


def test_reconstruct_1h_toluene_aromatic():
    """Toluene: CH3 singlet of intensity 3 at the raw shift (reference
    `[(0,3)]` case `:287-288` + single-line no-offset rule `:680-683`);
    ring protons couple at J_aromatic=8 Hz."""
    mol = parse_smiles("Cc1ccccc1")
    sh = factory.empirical_shifts(mol)
    peaks = reconstruct.reconstruct_1h(mol, sh)
    singlets = [(p, v) for p, v in peaks if v == 3.0]
    assert len(singlets) == 1
    assert singlets[0][0] == pytest.approx(float(sh.shift_h[0]), abs=1e-3)
    aromatic = [(p, v) for p, v in peaks if p > 6.0]
    assert len(aromatic) >= 4  # ortho doublet + meta/para triplets


def test_reconstruct_hsqc_cosy():
    mol = parse_smiles("CCO")
    sh = factory.empirical_shifts(mol)
    hsqc = reconstruct.reconstruct_hsqc(mol, sh)
    assert len(hsqc) == 2  # CH3, CH2 (O-H not C-bound)
    cosy = reconstruct.reconstruct_cosy(mol, sh)
    # diagonal (2) + cross peaks both directions (2)
    assert len(cosy) == 4


def test_potential_stereocenters():
    from multimodalspectraltransformer_tpu.sim import stereo

    assert stereo.potential_stereocenters(parse_smiles("CC(O)CC")) == [1]  # butan-2-ol
    assert stereo.potential_stereocenters(parse_smiles("CCC(O)CC")) == []  # pentan-3-ol symmetric
    assert stereo.potential_stereocenters(parse_smiles("CCO")) == []
    # explicit tag honored even when symmetry says otherwise
    assert 1 in stereo.potential_stereocenters(parse_smiles("C[C@H](O)CC"))


def test_diastereotopic_ch2_detection():
    from multimodalspectraltransformer_tpu.sim import stereo

    # butan-2-ol: the CH2 (atom 3) next to the stereocenter splits
    assert stereo.diastereotopic_ch2(parse_smiles("CC(O)CC")) == {3}
    # hexan-3-ol CCC(O)CCC: direct CH2 neighbors (1, 4) + second-degree CH2 (5)
    assert stereo.diastereotopic_ch2(parse_smiles("CCC(O)CCC")) == {1, 4, 5}
    # 1-phenylethanol: stereocenter, but no CH2 anywhere -> no splits
    assert stereo.diastereotopic_ch2(parse_smiles("CC(O)c1ccccc1")) == set()
    # achiral molecules never split
    assert stereo.diastereotopic_ch2(parse_smiles("CCCCC")) == set()


def test_hsqc_diastereotopic_splitting():
    """A diastereotopic CH2 next to a stereocenter emits TWO HSQC peaks
    (reference `selecting_shifts`, hsqc_nmr_reconstruction_v15_4.py:533-560)
    and the COSY cross product near the stereocenter (cosy_nmr_
    reconstruction_v15_4.py:165-207)."""
    mol = parse_smiles("CC(O)CC")  # butan-2-ol
    sh = factory.empirical_shifts(mol)
    hsqc = reconstruct.reconstruct_hsqc(mol, sh)
    # carbons: CH3, CH(O), CH2 (split -> 2 peaks), CH3 => 5 peaks
    assert len(hsqc) == 5
    ch2_c = round(float(sh.shift_c[3]), 2)
    split_rows = [(h, c) for h, c in hsqc if c == ch2_c]
    assert len(split_rows) == 2
    assert abs(split_rows[0][0] - split_rows[1][0]) == pytest.approx(
        reconstruct.DIASTEREOTOPIC_DELTA_H, abs=1e-6
    )
    # the achiral isomer pentan-3-ol does NOT split
    mol2 = parse_smiles("CCC(O)CC")
    hsqc2 = reconstruct.reconstruct_hsqc(mol2, factory.empirical_shifts(mol2))
    assert len(hsqc2) == 3  # symmetric: CH3, CH2, CH(O)
    # COSY near the stereocenter carries both split-proton cross peaks
    cosy = reconstruct.reconstruct_cosy(mol, sh)
    split_h = sorted(h for h, _ in split_rows)
    ch3_h = round(float(sh.shift_h[4]), 2)
    for h in split_h:
        assert (round(h, 2), ch3_h) in {(round(a, 2), round(b, 2)) for a, b in cosy}


def test_shift_rules_literature_values():
    """Increment rules vs hand-checked literature shifts (Pretsch tables)."""
    from multimodalspectraltransformer_tpu.sim import shift_rules

    cases = {
        "CCO": ([18.3, 58.3], 3.0),  # ethanol, tol ppm
        "CC(C)=O": ([30.8, 206.0, 30.8], 1.0),  # acetone
        "Cc1ccccc1": ([21.4, 137.8, 129.2, 128.4, 125.6, 128.4, 129.2], 2.0),
        "c1ccncc1": ([136.0, 123.8, 149.9, 149.9, 123.8], 0.5),  # pyridine
        "C=CC": ([115.9, 133.4, 19.4], 1.0),  # propene
    }
    for smi, (ref_c, tol) in cases.items():
        mol = parse_smiles(smi)
        sh = shift_rules.predict_shifts(mol)
        got = [float(sh.shift_c[i]) for i, a in enumerate(mol.atoms) if a.symbol == "C"]
        for g, r in zip(got, ref_c):
            assert abs(g - r) <= tol, (smi, got, ref_c)


def test_lorentzian_render():
    x, y = reconstruct.render_lorentzian([(1.0, 2.0), (3.0, 1.0)], gamma=0.01)
    assert x.shape == y.shape == (1000,)
    # peak maxima sit at the line positions, heights proportional to intensity
    i1 = int(np.argmin(np.abs(x - 1.0)))
    i3 = int(np.argmin(np.abs(x - 3.0)))
    assert y[i1] > 1.5 * y[i3]
    assert y[i1] == pytest.approx(y.max(), rel=0.05)


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


def test_featurize_compact_densify_matches_dense():
    """distill's int8 edge-list storage + on-device densify must reproduce
    graphs.featurize_mol bit-for-bit."""
    from multimodalspectraltransformer_tpu.sim import distill

    smis = ["CC(=O)Oc1ccccc1C(=O)O", "CCO", "c1ccncc1", "C[C@H](O)CC#N"]
    mols = [parse_smiles(s) for s in smis]
    compacts = [distill.featurize_compact(m) for m in mols]
    nodes = jnp.asarray(np.stack([c[0] for c in compacts]))
    edges = jnp.asarray(np.stack([c[1] for c in compacts]))
    n_at = jnp.asarray([c[2] for c in compacts], jnp.int32)
    dn, da, dm = distill.densify_batch(nodes, edges, n_at)
    for b, m in enumerate(mols):
        ref = graphs.featurize_mol(m)
        np.testing.assert_array_equal(np.asarray(dn[b]), ref.nodes)
        np.testing.assert_array_equal(np.asarray(da[b]), ref.adj)
        np.testing.assert_array_equal(np.asarray(dm[b]), ref.node_mask)


def test_molrandom_corpus():
    from multimodalspectraltransformer_tpu.chem import api as chem
    from multimodalspectraltransformer_tpu.data import molrandom

    corpus = molrandom.random_corpus(50, seed=3)
    assert len(corpus) == 50
    assert len(set(corpus)) == 50
    for smi in corpus:
        assert chem.canonicalize(smi) == smi  # emitted canonical
        mw = chem.mol_wt(smi)
        assert 80.0 <= mw <= 550.0
    # deterministic in seed
    assert molrandom.random_corpus(5, seed=3) == corpus[:5]


def test_molrandom_carbonyl_linkers_join_two_rings():
    """Linkers ending in =O (acyl/amide/sulfonyl) must attach ring B
    through the carbonyl C / sulfonyl S, not bail on the H-free oxygen."""
    import random

    from multimodalspectraltransformer_tpu.data import molrandom

    for link in ["C(=O)", "NC(=O)", "S(=O)(=O)"]:
        rng = random.Random(7)
        a = molrandom._template("c1ccccc1")
        b = molrandom._template("c1ccncc1")
        lm = molrandom._template(link)
        sites_a = molrandom._attach_sites(a, rng)
        step1 = molrandom._graft(a, sites_a[0], lm, 0)
        assert step1 is not None
        link_start = step1.num_atoms - lm.num_atoms
        link_last = next(
            (i for i in range(step1.num_atoms - 1, link_start - 1, -1)
             if step1.total_h(i) >= 1),
            None,
        )
        assert link_last is not None, link
        sites_b = molrandom._attach_sites(b, rng)
        out = molrandom._graft(step1, link_last, b, sites_b[0])
        assert out is not None, link
        # both ring systems present in the joined graph
        assert out.num_atoms == a.num_atoms + lm.num_atoms + b.num_atoms, link


def test_ir_rules_bands():
    from multimodalspectraltransformer_tpu.sim import ir_rules

    spec = ir_rules.predict_ir(parse_smiles("CC(C)=O"))  # acetone
    assert spec.shape == (1801,)
    assert spec.max() == pytest.approx(1.0)
    grid = np.linspace(400, 4000, 1801)
    # strongest band = C=O stretch near 1715
    co = spec[(grid > 1680) & (grid < 1760)].max()
    assert co > 0.9
    # no O-H band
    oh = spec[(grid > 3200) & (grid < 3600)].max()
    assert oh < 0.3
    spec2 = ir_rules.predict_ir(parse_smiles("CCO"))  # ethanol: broad O-H
    oh2 = spec2[(grid > 3200) & (grid < 3500)].max()
    assert oh2 > 0.3


def test_factory_uses_rule_ir_fallback():
    recs = factory.simulate_records(["CC(C)=O"], use_default_models=False)
    assert recs[0].ir is not None and len(recs[0].ir) == 1801


def test_default_distilled_models():
    """Committed distilled weights load and track the rule teachers."""
    import os

    from multimodalspectraltransformer_tpu.sim import distill, shift_rules

    if not os.path.exists(os.path.join(distill.WEIGHTS_DIR, "nmr_shift.msgpack")):
        pytest.skip("no committed weights")
    d = factory.default_shift_model()
    assert d is not None
    params, model, stats = d
    mol = parse_smiles("CCO")
    outs, _ = factory._predict_chunked(params, model, [mol], chunk=1)
    c = outs[0][0][: mol.num_atoms] * stats.std_c + stats.mean_c
    h = outs[0][1][: mol.num_atoms] * stats.std_h + stats.mean_h
    rules = shift_rules.predict_shifts(mol)
    for i, a in enumerate(mol.atoms):
        if a.symbol == "C":
            assert abs(float(c[i]) - float(rules.shift_c[i])) < 3.0
            assert abs(float(h[i]) - float(rules.shift_h[i])) < 0.3
    ir = factory.default_ir_model()
    if ir is not None:
        recs = factory.simulate_records(["CCO"])
        assert recs[0].ir is not None and len(recs[0].ir) == 1801
        assert float(np.max(recs[0].ir)) > 0.5


def test_ir_model_output():
    model = gnn.IRModel(hidden=32, steps=2, bins=100)
    g = graphs.featurize_smiles("CCO", 16)
    batch = graphs.batch_graphs([g])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["nodes"]), jnp.asarray(batch["adj"]), jnp.asarray(batch["node_mask"]))["params"]
    spec = model.apply({"params": params}, batch["nodes"], batch["adj"], batch["node_mask"])
    assert spec.shape == (1, 100)
    assert (np.asarray(spec) >= 0).all()  # softplus non-negative
