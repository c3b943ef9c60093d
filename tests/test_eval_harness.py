"""Evaluation harness tests on a small trained-ish model (CPU).

Trains a tiny MMT briefly on synthetic data so decoding produces some valid
SMILES, then runs the full harness: greedy metrics, MNS candidate
generation with filters, spectral-error ranking, top-k accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.eval import generation, harness
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.train import create_state, train_step
from multimodalspectraltransformer_tpu.utils.config import DecodeConfig, MMTConfig, ModelConfig, TrainConfig

MCFG = ModelConfig(num_encoder_layers=1, num_decoder_layers=2, ffn_dim=256)
CFG = MMTConfig(model=MCFG, train=TrainConfig(learning_rate=1e-3))

_STATE = {}


def _trained_params():
    if "params" in _STATE:
        return _STATE["params"], _STATE["recs"]
    recs = dp.synthetic_dataset(32, seed=5)
    loader = dp.Loader(recs, MCFG, batch_size=16, seed=1)
    batches = [jax.tree.map(jnp.asarray, b) for b in loader.epoch(0)]
    model = mmt.MultimodalTransformer(MCFG)
    params = mmt.init_params(MCFG, jax.random.PRNGKey(0))
    state = create_state(CFG.train, params)
    rng = jax.random.PRNGKey(9)
    for step in range(40):
        state, metrics = train_step(model, CFG, state, batches[step % len(batches)], rng)
    _STATE["params"] = state.params
    _STATE["recs"] = recs
    return state.params, recs


def test_generate_candidates_filters():
    params, recs = _trained_params()
    model = mmt.MultimodalTransformer(MCFG)
    f = dp.featurize(recs[0], MCFG)
    tb = dp.collate([f])
    enc = harness._encode_batch(model, params, jax.tree.map(jnp.asarray, tb.inputs))
    dcfg = DecodeConfig(max_len=32, fanout=8, multinom_runs=4, max_temp_rounds=3, mw_filter=False)
    cand = generation.generate_candidates(
        params, MCFG, enc.memory[:1], enc.memory_key_padding_mask[:1], jax.random.PRNGKey(0), dcfg
    )
    # all returned candidates are valid canonical SMILES, deduped
    from multimodalspectraltransformer_tpu.chem import api as chem

    assert len(set(cand.smiles)) == len(cand.smiles)
    for s in cand.smiles:
        assert chem.is_valid(s)
        assert chem.canonicalize(s) == s
    assert 1 <= cand.rounds_used <= 3
    assert all(0 <= p <= 1 for p in cand.seq_probs)


def test_beam_candidates_augment_pool():
    """DecodeConfig.beam_candidates merges the batched beam hypotheses into
    each molecule's candidate pool through the same canonicalize/dedup
    filter: every valid beam hypothesis must be present, and pools stay
    deduped valid-canonical."""
    from multimodalspectraltransformer_tpu.chem import api as chem
    from multimodalspectraltransformer_tpu.decode import samplers
    from multimodalspectraltransformer_tpu.utils import vocab

    params, recs = _trained_params()
    model = mmt.MultimodalTransformer(MCFG)
    tb = dp.collate([dp.featurize(r, MCFG) for r in recs[:3]])
    enc = harness._encode_batch(model, params, jax.tree.map(jnp.asarray, tb.inputs))
    dcfg = DecodeConfig(max_len=32, fanout=4, multinom_runs=2, max_temp_rounds=2,
                        mw_filter=False, beam_candidates=3, lookahead=False)
    cands = generation.generate_candidates_batch(
        params, MCFG, enc.memory, enc.memory_key_padding_mask, jax.random.PRNGKey(0), dcfg
    )
    beam = samplers.beam_search(
        params, MCFG, enc.memory, enc.memory_key_padding_mask, beam_size=3, max_len=32
    )
    btoks = np.asarray(beam.tokens)
    for b, cs in enumerate(cands):
        assert len(set(cs.smiles)) == len(cs.smiles)
        for s in cs.smiles:
            assert chem.is_valid(s) and chem.canonicalize(s) == s
        beam_cans = {
            c for c in chem.batch_canonicalize(
                [vocab.ids_to_smiles(btoks[b, k]) for k in range(3)]
            ) if c is not None
        }
        assert beam_cans <= set(cs.smiles)


def test_greedy_in_pool_merges_greedy_hypothesis():
    """DecodeConfig.greedy_in_pool (the reference's sampling_method='mix')
    merges the greedy decode into each molecule's candidate pool through
    the same canonicalize/dedup gates."""
    from multimodalspectraltransformer_tpu.chem import api as chem

    params, recs = _trained_params()
    dcfg = DecodeConfig(max_len=32, fanout=4, multinom_runs=2, max_temp_rounds=2,
                        mw_filter=False, greedy_in_pool=True, lookahead=False)
    results, _ = harness.evaluate_molecules(
        recs[:3], params, MCFG, dcfg, rng=jax.random.PRNGKey(3)
    )
    for r in results:
        smis = [c.smiles for c in r.candidates]
        assert len(set(smis)) == len(smis)
        g = chem.canonicalize(r.greedy)
        if g is not None:
            assert g in smis, (r.greedy, smis)


def test_mw_filter_rejects_wrong_mass():
    params, recs = _trained_params()
    model = mmt.MultimodalTransformer(MCFG)
    f = dp.featurize(recs[0], MCFG)
    tb = dp.collate([f])
    enc = harness._encode_batch(model, params, jax.tree.map(jnp.asarray, tb.inputs))
    dcfg = DecodeConfig(max_len=32, fanout=8, multinom_runs=8, max_temp_rounds=2, mw_filter=True, mw_delta=0.5)
    cand = generation.generate_candidates(
        params, MCFG, enc.memory[:1], enc.memory_key_padding_mask[:1], jax.random.PRNGKey(0), dcfg,
        target_mw=float(f["mw"]),
    )
    from multimodalspectraltransformer_tpu.chem import api as chem

    for s in cand.smiles:
        assert abs(round(chem.mol_wt(s)) - round(float(f["mw"]))) <= 0.5


def test_full_harness_summary():
    params, recs = _trained_params()
    dcfg = DecodeConfig(max_len=48, fanout=16, multinom_runs=3, max_temp_rounds=2, mw_filter=False)
    results, summary = harness.evaluate_molecules(
        recs[:6], params, MCFG, dcfg, jax.random.PRNGKey(1), simulate_errors=True
    )
    assert summary.n == len(results) > 0
    assert 0.0 <= summary.greedy_validity <= 1.0
    assert 0.0 <= summary.mns_exact <= 1.0
    assert 0.0 <= summary.corr_sampling_prob <= 1.0
    assert summary.mols_per_sec > 0
    assert set(summary.top_k_accuracy) == {1, 3, 5, 10, 20}
    # per-candidate fields populated
    for r in results:
        for c in r.candidates:
            assert c.smiles
        # candidates sorted by tanimoto descending
        tanis = [c.tanimoto for c in r.candidates]
        assert tanis == sorted(tanis, reverse=True)


def test_extra_candidates_reranking():
    """External candidates (reference rank-from-results-file analysis) go
    through scoring/ranking without any sampling: exact/tanimoto computed,
    the target itself scores exact, and simulation errors attach."""
    params, recs = _trained_params()
    dcfg = DecodeConfig(max_len=32, fanout=4, multinom_runs=3, max_temp_rounds=1, mw_filter=False)
    extras = [[recs[0].smiles, recs[1].smiles, recs[0].smiles],  # dup collapses
              [recs[1].smiles, recs[2].smiles]]
    results, summary = harness.evaluate_molecules(
        recs[:2], params, MCFG, dcfg, jax.random.PRNGKey(2),
        simulate_errors=True, run_mns=False, extra_candidates=extras,
    )
    assert len(results) == 2
    from multimodalspectraltransformer_tpu.chem import api as chem

    for i, r in enumerate(results):
        smis = [c.smiles for c in r.candidates]
        assert len(set(smis)) == len(smis)
        target_can = chem.canonicalize(r.target)
        for c in r.candidates:
            if c.smiles == target_can:
                assert c.exact and c.tanimoto == 1.0
            else:
                assert not c.exact and c.tanimoto < 1.0
    # molecule 0's extras contain its own target -> mns_exact
    assert results[0].mns_exact
    # spectral errors attached for simulated candidates
    assert any(np.isfinite(c.hsqc_error) for r in results for c in r.candidates)


def test_rank_candidates_by_error_ordering():
    res = harness.MoleculeResult(target="CCO")
    for smi, h, c in [("CCO", 0.1, 0.1), ("CCN", 0.5, 0.5), ("CCC", 0.02, 0.9)]:
        cr = harness.CandidateResult(smiles=smi, hsqc_error=h, cosy_error=c)
        cr.exact = smi == "CCO"
        res.candidates.append(cr)
    ranked = harness.rank_candidates_by_error(res, mf_filter=False)
    # CCO: ranks (1,0) avg 0.5 ; CCC: (0,2) avg 1.0 ; CCN: (2,1) avg 1.5
    assert [c.smiles for c in ranked] == ["CCO", "CCC", "CCN"]
    acc = harness.top_k_accuracy([res], ks=(1, 3), mf_filter=False)
    assert acc[1] == 1.0


def test_rank_keys_clip_reranking():
    """Generalized rank keys: folding clip_loss into the rank average can
    promote a candidate the spectral errors alone would not (the
    --clip-params re-ranking path in scripts/accuracy_report.py)."""
    res = harness.MoleculeResult(target="CCO")
    rows = [  # (smiles, hsqc, cosy, clip_loss)
        ("CCN", 0.1, 0.1, 0.9),   # best by error, worst by CLIP
        ("CCO", 0.2, 0.2, 0.0),   # exact: 2nd by error, best by CLIP
        ("CCC", 0.5, 0.5, 0.5),
    ]
    for smi, h, c, cl in rows:
        cr = harness.CandidateResult(smiles=smi, hsqc_error=h, cosy_error=c, clip_loss=cl)
        cr.exact = smi == "CCO"
        res.candidates.append(cr)
    by_err = harness.rank_candidates_by_error(res, mf_filter=False)
    assert [c.smiles for c in by_err] == ["CCN", "CCO", "CCC"]
    # error+clip: CCN avg(0,0,2)=0.67, CCO avg(1,1,0)=0.67 -> stable argsort
    # keeps CCN first; clip-only flips top-1 to the exact candidate
    by_clip = harness.rank_candidates_by_error(res, mf_filter=False, keys=("clip_loss",))
    assert by_clip[0].smiles == "CCO"
    hits_err, n_err = harness.top_k_hits([res], ks=(1,), mf_filter=False)
    hits_clip, n_clip = harness.top_k_hits(
        [res], ks=(1,), mf_filter=False, keys=("clip_loss",)
    )
    assert n_err == n_clip == 1
    assert hits_err[1] == 0 and hits_clip[1] == 1
    # NaN clip scores (unscored candidates) rank last, not first
    res2 = harness.MoleculeResult(target="CCO")
    res2.candidates.append(harness.CandidateResult(smiles="CCN", clip_loss=float("nan")))
    res2.candidates.append(harness.CandidateResult(smiles="CCO", clip_loss=0.3))
    ranked2 = harness.rank_candidates_by_error(res2, mf_filter=False, keys=("clip_loss",))
    assert ranked2[0].smiles == "CCO"


def test_mf_filter_in_ranking():
    res = harness.MoleculeResult(target="CCO")
    for smi, h in [("CCO", 0.3), ("OCC", 0.3), ("CCCCC", 0.0)]:  # last: wrong MF
        res.candidates.append(harness.CandidateResult(smiles=smi, hsqc_error=h, cosy_error=h))
    ranked = harness.rank_candidates_by_error(res, mf_filter=True)
    assert all("CCCCC" != c.smiles for c in ranked)


def test_teacher_forced_analysis():
    """Per-token probability analysis (reference
    predict_prop_correct_max_sequence variants)."""
    params, recs = _trained_params()
    model = mmt.MultimodalTransformer(MCFG)
    feats = [dp.featurize(r, MCFG) for r in recs[:4]]
    tb = dp.collate(feats)
    enc = harness._encode_batch(model, params, jax.tree.map(jnp.asarray, tb.inputs))
    out = harness.teacher_forced_analysis(
        model, params, jnp.asarray(tb.trg_tokens), enc.memory, enc.memory_key_padding_mask
    )
    B = 4
    assert out["p_correct"].shape == out["p_max"].shape
    pc, pm = np.asarray(out["p_correct"]), np.asarray(out["p_max"])
    assert (pm >= pc - 1e-6).all()  # max prob dominates P(correct)
    for key in ("corr_sampling_prob", "mean_token_prob", "mean_max_prob", "token_accuracy"):
        v = np.asarray(out[key])
        assert v.shape == (B,) and (v >= 0).all() and (v <= 1 + 1e-6).all()
    # trained-ish model: where argmax == target, p_correct == p_max
    eq = np.asarray(out["argmax_is_target"])
    np.testing.assert_allclose(pc[eq], pm[eq], rtol=1e-6)


def test_round_shrink_multi_round_batch():
    """DecodeConfig.round_shrink: with a fan-out too small to satisfy
    multinom_runs in round 0, escalation rounds regather only unsatisfied
    molecules into narrower widths. Pools must stay valid-canonical and
    deduped, every molecule keeps making progress, and the shrunk run
    satisfies the same contract as the full-width run."""
    from multimodalspectraltransformer_tpu.chem import api as chem

    params, recs = _trained_params()
    model = mmt.MultimodalTransformer(MCFG)
    tb = dp.collate([dp.featurize(r, MCFG) for r in recs[:8]])
    enc = harness._encode_batch(model, params, jax.tree.map(jnp.asarray, tb.inputs))
    base = dict(max_len=32, fanout=2, multinom_runs=6, max_temp_rounds=6,
                mw_filter=False)
    shrunk = generation.generate_candidates_batch(
        params, MCFG, enc.memory, enc.memory_key_padding_mask,
        jax.random.PRNGKey(2), DecodeConfig(**base, round_shrink=True),
    )
    wide = generation.generate_candidates_batch(
        params, MCFG, enc.memory, enc.memory_key_padding_mask,
        jax.random.PRNGKey(2), DecodeConfig(**base, round_shrink=False),
    )
    assert len(shrunk) == len(wide) == 8
    for cs, cw in zip(shrunk, wide):
        for s in cs.smiles:
            assert chem.is_valid(s) and chem.canonicalize(s) == s
        assert len(set(cs.smiles)) == len(cs.smiles)
        assert cs.rounds_used >= 1
        # round 0 is identical by construction (same key, full width) —
        # later rounds may sample differently, but both runs must collect
        # at least as many candidates as round 0 produced
        assert len(cs.smiles) >= min(len(cw.smiles), 1)


def test_on_round_accepted_callback_reports_every_candidate():
    """The acceptance callback (simulation-overlap hook) must report each
    accepted candidate exactly once, per molecule, across rounds and the
    beam merge — the harness builds its spectral-simulation set from it."""
    params, recs = _trained_params()
    model = mmt.MultimodalTransformer(MCFG)
    tb = dp.collate([dp.featurize(r, MCFG) for r in recs[:4]])
    enc = harness._encode_batch(model, params, jax.tree.map(jnp.asarray, tb.inputs))
    got: dict[int, list] = {}

    def on_accept(pairs):
        for b, smis in pairs:
            got.setdefault(b, []).extend(smis)

    dcfg = DecodeConfig(max_len=32, fanout=4, multinom_runs=4, max_temp_rounds=4,
                        mw_filter=False, beam_candidates=2)
    cands = generation.generate_candidates_batch(
        params, MCFG, enc.memory, enc.memory_key_padding_mask,
        jax.random.PRNGKey(3), dcfg, on_round_accepted=on_accept,
    )
    for b, cs in enumerate(cands):
        assert got.get(b, []) == cs.smiles  # same order, no dupes, none missed


def test_decode_length_banding():
    """band_max_len quantizes the decode length to cover the longest target
    plus margin; results stay exact-equal for targets within the band."""
    params, recs = _trained_params()
    # synthetic records have short SMILES: the banded length must be < 64
    res_b, _ = harness.evaluate_molecules(
        recs[:4], params, MCFG,
        DecodeConfig(max_len=64, fanout=8, multinom_runs=2, max_temp_rounds=2,
                     mw_filter=False, band_max_len=True),
        simulate_errors=False,
    )
    res_f, _ = harness.evaluate_molecules(
        recs[:4], params, MCFG,
        DecodeConfig(max_len=64, fanout=8, multinom_runs=2, max_temp_rounds=2,
                     mw_filter=False, band_max_len=False),
        simulate_errors=False,
    )
    assert len(res_b) == len(res_f) == 4
    # greedy decode is deterministic and every target is far below the
    # band: the banded run must reproduce the full-length greedy exactly
    for rb, rf in zip(res_b, res_f):
        assert rb.greedy == rf.greedy
