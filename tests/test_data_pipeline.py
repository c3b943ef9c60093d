"""Data pipeline tests: featurization parity with the reference's
normalization/padding rules, collation shapes, loader determinism/sharding,
and CSV round-trip."""

import os
import random

import jax
import numpy as np

from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.utils.config import ModelConfig

MCFG = ModelConfig()


def _rec():
    return dp.SampleRecord(
        "s1",
        "CCO",
        h1=[[3.7, 2.0], [1.2, 3.0], [2.6, 1.0]],
        c13=[58.0, 18.0],
        hsqc=[[3.7, 58.0], [1.2, 18.0]],
        cosy=[[3.7, 1.2]],
        ir=np.linspace(0.1, 1.0, 1801),
    )


def test_featurize_normalization_and_padding():
    f = dp.featurize(_rec(), MCFG)
    assert f is not None
    # 1H: ppm/10, intensity untouched
    np.testing.assert_allclose(f["src_1h"][0], [0.37, 2.0])
    assert f["mask_1h"][:3].tolist() == [0, 0, 0] and f["mask_1h"][3:].all()
    # 13C: ppm/200
    np.testing.assert_allclose(f["src_13c"][:2], [0.29, 0.09])
    # HSQC: H/10, C/200
    np.testing.assert_allclose(f["src_hsqc"][0], [0.37, 0.29])
    # COSY: H/10, H/10
    np.testing.assert_allclose(f["src_cosy"][0], [0.37, 0.12])
    # IR binned to 1000 and max-normalized
    assert f["src_ir"].shape == (1000,)
    assert f["src_ir"].max() <= 1.0 + 1e-6 and f["src_ir"].max() > 0.99
    # targets
    assert f["trg_tokens"][0] == 3  # <SOS>
    assert 2 in f["trg_tokens"]  # <EOS>
    assert f["trg_fp"].shape == (512,)
    assert abs(f["mw"] - 46.0419) < 1e-3


def test_featurize_invalid_smiles_skipped():
    bad = dp.SampleRecord("x", "not_a_smiles((", h1=[[1.0, 1.0]])
    assert dp.featurize(bad, MCFG) is None


def test_blanking_fallback_restores_1h_13c():
    rec = _rec()
    f = dp.featurize(rec, MCFG, dp.FeaturizeOptions(blank_percentage=1.0), random.Random(0))
    # everything blanked -> 1H and 13C restored (reference fallback)
    assert f["mask_1h"][0] == 0
    assert f["mask_13c"][0] == 0
    assert f["mask_hsqc"].all()  # HSQC stays blanked
    assert f["src_ir"].sum() == 0


def test_collate_shapes():
    recs = dp.synthetic_dataset(5, seed=1)
    feats = [dp.featurize(r, MCFG) for r in recs]
    feats = [f for f in feats if f is not None]
    tb = dp.collate(feats)
    B = len(feats)
    assert tb.inputs.src_1h.shape == (B, 64, 2)
    assert tb.inputs.src_ir.shape == (B, 1000)
    assert tb.trg_tokens.shape == (B, 64)
    assert tb.trg_fp.shape == (B, 512)


def test_loader_determinism_and_sharding():
    recs = dp.synthetic_dataset(24, seed=2)
    l1 = dp.Loader(recs, MCFG, batch_size=4, seed=7)
    l2 = dp.Loader(recs, MCFG, batch_size=4, seed=7)
    b1 = next(l1.epoch(0))
    b2 = next(l2.epoch(0))
    np.testing.assert_array_equal(b1.trg_tokens, b2.trg_tokens)
    # different epoch -> different order
    b3 = next(l1.epoch(1))
    assert not np.array_equal(b1.trg_tokens, b3.trg_tokens)
    # host shards are disjoint
    h0 = dp.Loader(recs, MCFG, batch_size=2, seed=7, host_id=0, host_count=2)
    h1 = dp.Loader(recs, MCFG, batch_size=2, seed=7, host_id=1, host_count=2)
    ids0 = {tuple(s) for b in h0.epoch(0) for s in np.asarray(b.trg_tokens)}
    ids1 = {tuple(s) for b in h1.epoch(0) for s in np.asarray(b.trg_tokens)}
    # token rows can collide across identical molecules; sample ids cannot —
    # verify via lengths instead (12 records per host, batch 2 -> 6 batches)
    assert len(h0) == 6 and len(h1) == 6


def test_csv_round_trip(tmp_path):
    recs = dp.synthetic_dataset(4, seed=3)
    import pandas as pd

    rows_1h = [{"sample-id": r.sample_id, "SMILES": r.smiles, "shifts": str(r.h1)} for r in recs]
    rows_13c = [{"sample-id": r.sample_id, "SMILES": r.smiles, "shifts": str(r.c13)} for r in recs]
    p1 = tmp_path / "1h.csv"
    p2 = tmp_path / "13c.csv"
    pd.DataFrame(rows_1h).to_csv(p1, index=False)
    pd.DataFrame(rows_13c).to_csv(p2, index=False)
    ir_dir = tmp_path / "ir"
    os.makedirs(ir_dir)
    for r in recs:
        pd.DataFrame({"spectra": r.ir}).to_csv(ir_dir / f"{r.sample_id}.csv", index=False)

    loaded = dp.load_spectra_csvs(str(p1), str(p2), ir_folder=str(ir_dir))
    assert len(loaded) == 4
    assert loaded[0].h1 == recs[0].h1
    assert loaded[0].c13 == recs[0].c13
    assert loaded[0].ir is not None and len(loaded[0].ir) == 1801
    # pickle cache
    cache = tmp_path / "cache.pkl"
    loaded2 = dp.load_spectra_csvs(str(p1), str(p2), pickle_cache=str(cache))
    assert os.path.exists(cache)
    loaded3 = dp.load_spectra_csvs(str(p1), str(p2), pickle_cache=str(cache))
    assert loaded3[0].sample_id == loaded2[0].sample_id


def test_bin_ir():
    raw = np.ones(1801)
    binned = dp.bin_ir(raw, 1000)
    np.testing.assert_allclose(binned, 1.0)
    raw2 = np.arange(2000, dtype=float)
    b2 = dp.bin_ir(raw2, 1000)
    assert b2.shape == (1000,)
    assert b2[-1] > b2[0]


def test_hsqc_noise_pollution():
    """pollute_hsqc injects up to hsqc_noise_max extra peaks (reference
    pollute_HSQC_data, dataloaders_pl_v15_4.py:117-140)."""
    import random

    from multimodalspectraltransformer_tpu.data.pipeline import (
        FeaturizeOptions, pollute_hsqc,
    )

    peaks = [[2.0, 25.0], [7.1, 120.0]]
    rng = random.Random(0)
    # disabled -> identity
    assert pollute_hsqc(peaks, FeaturizeOptions(), rng) == peaks
    opts = FeaturizeOptions(hsqc_noise_max=5)
    outs = [len(pollute_hsqc(peaks, opts, random.Random(s))) for s in range(20)]
    assert min(outs) >= 2 and max(outs) <= 7 and max(outs) > 2
    # pool-based noise draws from the pool
    opts2 = FeaturizeOptions(hsqc_noise_max=3, hsqc_noise_pool=[(1.5, 30.0)])
    out = pollute_hsqc(peaks, opts2, random.Random(3))
    for p in out[2:]:
        assert p == [1.5, 30.0]


def test_device_dataset_matches_host_loader():
    """The device-resident dataset + on-device gather must assemble the
    batches the host loader produces (deterministic featurization).
    Integer leaves (tokens, masks, ids, fingerprint bits) are exact; float
    spectra are stored float16 in HBM (compact_train_batch — ~2.5x less
    HBM than fp32, and strictly more precise than the bf16 the compute
    path rounds them to), so they match to f16 rounding. The gather must
    hand back CANONICAL dtypes (f32/int32) regardless of storage."""
    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu.data.pipeline import gather_rows

    records = dp.synthetic_dataset(24, seed=3)
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    loader = dp.Loader(records, mcfg, batch_size=8, seed=1)
    dd = loader.device_dataset()
    assert dd is not None
    host = list(loader.epoch(0))
    rows = list(loader.epoch_row_batches(0))
    assert len(host) == len(rows) == 3
    for hb, idx in zip(host, rows):
        db = gather_rows(dd, jnp.asarray(idx))
        for a, b in zip(jax.tree_util.tree_leaves(hb), jax.tree_util.tree_leaves(db)):
            a, b = np.asarray(a), np.asarray(b)
            assert b.dtype in (np.float32, np.int32), b.dtype
            if np.issubdtype(a.dtype, np.floating):
                np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
            else:
                np.testing.assert_array_equal(a, b)


def test_compact_train_batch_roundtrip():
    """compact -> restore preserves integer leaves exactly, floats to f16
    rounding, is idempotent, and cuts the stored bytes by >2x."""
    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu.data import pipeline as dpl

    records = dp.synthetic_dataset(16, seed=7)
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    big = dp.collate([f for f in (dp.featurize(r, mcfg) for r in records) if f])
    compact = dp.Loader.compact_train_batch(big)
    assert dp.Loader.compact_train_batch(compact).trg_tokens.dtype == np.uint8
    fat = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(big))
    small = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(compact))
    assert small < fat / 2, (fat, small)
    rest = dpl.restore_train_batch(jax.tree_util.tree_map(jnp.asarray, compact))
    np.testing.assert_array_equal(np.asarray(rest.trg_tokens), big.trg_tokens)
    np.testing.assert_array_equal(np.asarray(rest.trg_fp), big.trg_fp)
    np.testing.assert_array_equal(np.asarray(rest.inputs.mask_1h), big.inputs.mask_1h)
    np.testing.assert_array_equal(np.asarray(rest.inputs.src_mf), big.inputs.src_mf)
    np.testing.assert_array_equal(np.asarray(rest.inputs.mw), big.inputs.mw)  # f32 kept
    np.testing.assert_allclose(np.asarray(rest.inputs.src_1h), big.inputs.src_1h,
                               rtol=1e-3, atol=1e-3)
    assert np.asarray(rest.inputs.src_13c).dtype == np.float32
    assert np.asarray(rest.inputs.mask_13c).dtype == np.int32


def test_device_dataset_keeps_device_path_on_failures():
    """One unfeaturizable record must NOT push the whole run onto the ~8x
    slower host loader: the failure is dropped and rows index the kept
    records."""
    import dataclasses

    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu.data.pipeline import gather_rows

    records = list(dp.synthetic_dataset(12, seed=3))
    records[5] = dataclasses.replace(records[5], smiles="not-a-smiles")
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    loader = dp.Loader(records, mcfg, batch_size=4, seed=1)
    dd = loader.device_dataset()
    assert dd is not None
    kept = loader._device_kept_smiles
    assert len(kept) == 11 and "not-a-smiles" not in kept
    # rows index the kept records: gather row j and featurize kept[j]
    f = dp.featurize(
        next(r for r in records if r.smiles == kept[7]), mcfg
    )
    row = gather_rows(dd, jnp.asarray([7]))
    np.testing.assert_array_equal(
        np.asarray(row.trg_tokens[0]), np.asarray(f["trg_tokens"])
    )


def test_host_slice_equal_batches_across_hosts():
    """Per-host epoch slices are truncated to a common length so multi-host
    lockstep never has one host dispatch an extra collective step."""
    records = dp.synthetic_dataset(19, seed=4)
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    counts = []
    for host in range(2):
        loader = dp.Loader(records, mcfg, batch_size=4, seed=1,
                           host_id=host, host_count=2)
        counts.append(sum(1 for _ in loader.epoch(0)))
    assert counts[0] == counts[1]


def test_device_dataset_declined_when_stochastic():
    records = dp.synthetic_dataset(8, seed=3)
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)
    loader = dp.Loader(
        records, mcfg, batch_size=4,
        opts=dp.FeaturizeOptions(blank_percentage=0.3),
    )
    assert loader.device_dataset() is None

def test_device_dataset_disk_cache_round_trip(tmp_path, monkeypatch):
    """MMT_FEATURE_CACHE persists the featurized arrays; a fresh Loader
    over the same records loads them bit-identically and keeps the
    row<->record mapping, and a changed record invalidates the digest."""
    monkeypatch.setenv("MMT_FEATURE_CACHE", str(tmp_path))
    records = dp.synthetic_dataset(12, seed=5)
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64)

    first = dp.Loader(records, mcfg, batch_size=4, seed=1)
    dd1 = first.device_dataset()
    assert dd1 is not None
    cache_files = list(tmp_path.glob("mmt_features_*.npz"))
    assert len(cache_files) == 1

    # a fresh loader must hit the cache: poison a featurize internal that is
    # NOT part of the digest, so any re-featurization raises
    second = dp.Loader(records, mcfg, batch_size=4, seed=1)
    real_pad = dp._pad_points
    monkeypatch.setattr(dp, "_pad_points", lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("cache miss: featurize ran")))
    dd2 = second.device_dataset()
    monkeypatch.setattr(dp, "_pad_points", real_pad)
    for a, b in zip(jax.tree_util.tree_leaves(dd1), jax.tree_util.tree_leaves(dd2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert second._device_kept_smiles == [r.smiles for r in records]
    assert list(second.epoch_row_batches(0))  # mapping usable after a hit

    # different record contents -> different digest -> no false hit
    mutated = dp.synthetic_dataset(12, seed=6)
    assert dp.Loader(mutated, mcfg, batch_size=4).features_digest() != \
        first.features_digest()


def test_device_dataset_sharded_local_gather():
    """Sharded corpus + shard-local gather == composing the same rows by
    hand from each shard's partition; and a mesh training segment over the
    sharded dataset runs and learns (lifts the old device_data-vs-mesh
    restriction that fell back to the ~8x-slower host loader)."""
    import jax.numpy as jnp

    from multimodalspectraltransformer_tpu import parallel
    from multimodalspectraltransformer_tpu.utils.config import (
        MMTConfig, ModelConfig, TrainConfig, DataConfig,
    )

    mcfg = ModelConfig.small()
    records = dp.synthetic_dataset(64, seed=5)
    mesh = parallel.make_mesh(data=4, model=1, devices=jax.devices()[:4])
    loader = dp.Loader(records, mcfg, batch_size=8, seed=3)
    dd = loader.device_dataset_sharded(mesh)
    assert dd is not None
    ext = parallel.data_extent(mesh)
    assert ext == 4
    R = int(dd.trg_tokens.shape[0])
    Rl = R // ext
    host = jax.tree.map(lambda x: np.asarray(x), dd)

    gather = dp.sharded_gather_fn(mesh)
    bsh = parallel.batch_sharding(mesh)
    idxs = list(loader.epoch_row_batches_sharded(0, ext))
    assert len(idxs) == Rl // (8 // ext)
    for idx in idxs[:3]:
        got = gather(dd, jax.device_put(jnp.asarray(idx), bsh))
        # manual composition: segment d gathers from partition d
        for leaf_name in ("trg_tokens", "trg_fp"):
            g = np.asarray(getattr(got, leaf_name))
            for d in range(ext):
                seg = idx[d * 2 : (d + 1) * 2]
                want = getattr(host, leaf_name)[d * Rl + seg]
                np.testing.assert_array_equal(g[d * 2 : (d + 1) * 2], want)

    # short mesh training segment over the sharded dataset
    from multimodalspectraltransformer_tpu.train.loop import run_training

    cfg = MMTConfig(
        model=mcfg,
        train=TrainConfig(learning_rate=1e-3, num_epochs=1, fast_dropout_rng=False,
                          save_interval_steps=10_000),
        data=DataConfig(batch_size=8),
    )
    res = run_training(cfg, loader, mesh=mesh, max_steps=3, log_every=1)
    assert res.steps == 3
    assert np.isfinite(res.train_loss)


def test_load_reference_testset():
    """The shipped ZINC test CSVs (headerless SMILES,"[data]",id) parse
    into joined records with normalized peak-list forms."""
    import os

    d = "/root/reference/MMT_website/Runfolder/CSV_files"
    if not os.path.exists(os.path.join(d, "ML_NMR_5M_XL_13C_test_10x100.csv")):
        import pytest

        pytest.skip("reference test CSVs not mounted")
    recs = dp.load_reference_testset(
        csv_13c=os.path.join(d, "ML_NMR_5M_XL_13C_test_10x100.csv"),
        csv_hsqc=os.path.join(d, "ML_NMR_5M_XL_HSQC_test_10x100.csv"),
        csv_cosy=os.path.join(d, "ML_NMR_5M_XL_COSY_test_10x100.csv"),
        csv_1h=os.path.join(d, "ML_NMR_1H_combined_ZINC_test_10x100.csv"),
        limit=20,
    )
    assert len(recs) == 20
    r = recs[0]
    assert r.smiles and r.c13 and r.hsqc and r.cosy and r.h1
    assert isinstance(r.c13[0], float)
    assert len(r.hsqc[0]) == 2 and len(r.cosy[0]) == 2 and len(r.h1[0]) == 2
    mcfg = ModelConfig()
    assert dp.featurize(r, mcfg) is not None


def test_load_real_example():
    """The shipped AZ experimental set: semicolon CSVs + wavelength IR,
    stereo/[H] normalized SMILES, all four modalities + IR per record."""
    import os

    d = "/root/reference/MMT_website/Runfolder/CSV_files/website_real_example"
    if not os.path.isdir(d):
        import pytest

        pytest.skip("reference real-example data not mounted")
    recs = dp.load_real_example(d)
    assert len(recs) == 5
    for r in recs:
        assert r.h1 and r.c13 and r.hsqc and r.cosy and r.ir is not None
        assert "[H]" not in r.smiles and "@" not in r.smiles
        assert dp.featurize(r, ModelConfig()) is not None
