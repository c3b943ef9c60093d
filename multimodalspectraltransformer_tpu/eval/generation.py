"""Candidate generation: fan-out sampling with temperature escalation.

Reference: `mmt_result_test_functions_15_4.py:504-570` — per molecule,
duplicate the encoder memory 128x (`run_batch_gen_val_MMT_v15_4.py:93-107`),
multinomial-sample, RDKit-validate + canonicalize + dedup
(`:1035-1082`), filter by rounded molecular weight +- delta (`:1083`),
and raise the temperature by 0.1 per round (cap 20) until ``multinom_runs``
unique valid SMILES are collected (`:529-548`).

TPU-first structure: the decoder loop is one compiled ``multinomial_decode``
executable reused across rounds (temperature is a traced scalar, so round 2+
costs zero recompilation); host chemistry (validity/canonicalization/dedup/
MW) runs between rounds on the fixed-size candidate block the device
produced. Multiple molecules can be processed per call by batching the
encoder pass and slicing fan-out groups.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..chem import api as chem
from ..decode import samplers
from ..utils import vocab
from ..utils.config import DecodeConfig, ModelConfig

Array = jax.Array


@jax.jit
def _fetch_pack(toks, tprobs):
    """Device-side post-pass: tokens as uint8 (vocab is 43 ids) and the
    per-lane sequence probability reduced on device. The per-round
    device->host fetch drops from 2x [W*F, T] f32/i32 (~3 MB at full
    width) to [W*F, T] u8 + [W*F] f32 (~0.4 MB) — the tunnel moves
    ~30 MB/s, so this hides ~100 ms per consumed round. Module scope so the
    trace cache persists across calls/chunks (r4 advisor: a per-call
    @jax.jit wrapper retraced every chunk)."""
    live = toks != vocab.PAD_ID
    logp = jnp.where(live, jnp.log(jnp.maximum(tprobs, 1e-38)), 0.0)
    seqp = jnp.where(jnp.any(live, axis=1), jnp.exp(jnp.sum(logp, axis=1)), 0.0)
    return toks.astype(jnp.uint8), seqp


@dataclass
class CandidateSet:
    """Unique, valid, canonicalized candidates for one molecule."""

    smiles: list[str] = field(default_factory=list)
    seq_probs: list[float] = field(default_factory=list)  # product of token probs
    rounds_used: int = 0
    n_sampled: int = 0


def _filter_block(
    tokens: np.ndarray,  # [F, T]
    probs: np.ndarray,  # [F, T] per-token probs, or [F] device-reduced seq probs
    target_mw: Optional[float],
    mw_delta: float,
    seen: set,
    out: CandidateSet,
    want: int,
    canons: Optional[list] = None,  # precomputed canonical SMILES per row
) -> None:
    """Host-side validity/canonicalize/dedup/MW filter of one device block
    (reference `:1035-1083` filter_probs_and_valid_smiles_and_canonicolize,
    filter_for_MW_2, deduplicate_smiles). Canonicalization runs through the
    batched native C++ kernel when `canons` is not supplied."""
    if canons is None:
        canons = chem.batch_canonicalize([vocab.ids_to_smiles(r) for r in tokens])
    for row, prow, can in zip(tokens, probs, canons):
        if len(out.smiles) >= want:
            return
        out.n_sampled += 1
        if can is None or can in seen:
            continue
        if target_mw is not None:
            mw = chem.mol_wt(can)
            # reference compares rounded MW within +-delta (`:1083`)
            if mw is None or abs(round(mw) - round(target_mw)) > mw_delta:
                continue
        seen.add(can)
        if np.ndim(prow) == 0:  # device-reduced sequence probability
            p = float(prow)
        else:
            live = row != vocab.PAD_ID
            p = float(np.prod(prow[live])) if live.any() else 0.0
        out.smiles.append(can)
        out.seq_probs.append(p)


def generate_candidates(
    params,
    mcfg: ModelConfig,
    memory: Array,  # [1, S, D] one molecule's encoder memory
    memory_kpm: Array,
    rng: jax.Array,
    dcfg: DecodeConfig = DecodeConfig(),
    target_mw: Optional[float] = None,
) -> CandidateSet:
    """Temperature-escalation fan-out sampling for one molecule.

    Thin wrapper over :func:`generate_candidates_batch` with B=1 so every
    DecodeConfig knob (lookahead pipelining, beam_candidates augmentation)
    behaves identically on both paths."""
    return generate_candidates_batch(
        params, mcfg, memory, memory_kpm, rng, dcfg,
        target_mws=None if target_mw is None else [target_mw],
    )[0]


def generate_candidates_batch(
    params,
    mcfg: ModelConfig,
    memory: Array,  # [B, S, D] — many molecules at once
    memory_kpm: Array,
    rng: jax.Array,
    dcfg: DecodeConfig = DecodeConfig(),
    target_mws: Optional[list] = None,
    compute_dtype: Optional[str] = None,
    on_round_accepted=None,
    max_len: Optional[int] = None,  # override dcfg.max_len (length banding)
) -> list[CandidateSet]:
    """Fan-out sampling for a whole batch of molecules in one compiled loop
    per round (the per-molecule variant leaves the chip idle between tiny
    calls). Satisfied molecules keep their lanes (results discarded) —
    static shapes beat ragged scheduling on TPU.

    Pipelined rounds (``dcfg.lookahead``): the round-k temperature is
    data-INDEPENDENT — the reference escalates per molecule, but a
    molecule's round-k results are only *consumed* if it was unsatisfied in
    every earlier round, in which case its temperature is exactly
    ``base + k*increment``; satisfied molecules' lanes decode on but their
    results are discarded before use. So round k+1 can be dispatched to the
    device BEFORE round k's host-side chemistry (canonicalize/MW/dedup)
    runs, overlapping device decode with host filtering at identical
    consumed results. On early exit at round k the already-dispatched round
    k+1 is simply never fetched (bounded waste: one round)."""
    B = memory.shape[0]
    F = dcfg.fanout
    outs = [CandidateSet() for _ in range(B)]
    seens: list[set] = [set() for _ in range(B)]
    want = dcfg.multinom_runs
    compute_dtype = compute_dtype or dcfg.compute_dtype
    decode_len = max_len if max_len is not None else dcfg.max_len

    # optional beam augmentation (dcfg.beam_candidates > 0): dispatch one
    # batched beam decode up front; its hypotheses are merged into each
    # pool after the sampling rounds, through the same canonicalize/dedup/
    # MW filter. The fetch happens last, so the beam work rides the same
    # device queue as round 0 and overlaps the host-side filtering.
    beam_pending = None
    if dcfg.beam_candidates > 0:
        beam_pending = samplers.beam_search(
            params, mcfg, memory, memory_kpm,
            beam_size=dcfg.beam_candidates, max_len=decode_len,
            compute_dtype=compute_dtype,
        )

    # Round-shrink (DecodeConfig.round_shrink): escalation rounds regather
    # only the still-unsatisfied molecules into one of FOUR static widths
    # {ceil(B/4), ceil(B/2), ceil(2B/3), B} — the fan-out decode is the FLOP-dominant
    # stage and rounds are batch-synchronized, so full-width rounds paid
    # the whole 6144-lane decode for lanes whose results were discarded
    # (on the trained checkpoint ~45% of molecules need round 1, ~11% run
    # all rounds). Four widths keep the executable count bounded; the
    # narrow batch is built by one device-side row gather of the encoder
    # memory. Disabled when memory is sharded over >1 device (a narrow
    # gather would fight the GSPMD batch partitioning).
    shard = getattr(memory, "sharding", None)
    try:
        multi_device = shard is not None and len(shard.device_set) > 1
    except Exception:  # non-jax arrays in tests
        multi_device = False
    shrink = dcfg.round_shrink and not multi_device and B > 1
    identity = list(range(B))

    def _width(n: int) -> int:
        if not shrink:
            return B
        # four static widths {B/4, B/2, 2B/3, B}: the r5 bench profile
        # showed escalation rounds with 25-32 of 48 unsatisfied running
        # full-width — the 2/3 step recovers a third of those rounds'
        # decode FLOPs for one extra cached executable
        for w in (max(1, (B + 3) // 4), max(1, (B + 1) // 2),
                  max(1, (2 * B + 2) // 3), B):
            if n <= w:
                return w
        return B

    def dispatch(round_idx: int, idxs: list):
        W = _width(len(idxs))
        lanes = idxs + [idxs[-1]] * (W - len(idxs))
        if lanes == identity:
            mem, kpm = memory, memory_kpm
        else:
            ia = jnp.asarray(lanes, jnp.int32)
            mem, kpm = memory[ia], memory_kpm[ia]
        # one lane-temp VECTOR (not scalar) so the executable is shared with
        # the non-pipelined per-molecule-escalation variant below
        t = dcfg.temperature + round_idx * dcfg.temp_increment
        lane_temp = jnp.full((W * F, 1), t, jnp.float32)
        res = samplers.multinomial_decode(
            params, mcfg, mem, kpm,
            jax.random.fold_in(rng, round_idx), lane_temp,
            decode_len, fanout=F, compute_dtype=compute_dtype,
        )
        return res, lanes

    import os
    import time as _time

    prof = os.environ.get("MMT_EVAL_PROFILE") == "1"

    active = list(range(B))
    pending, pend_lanes = dispatch(0, active)
    for round_idx in range(dcfg.max_temp_rounds):
        # lookahead starts at round 1: a trained model usually satisfies
        # every molecule in round 0, and an eagerly dispatched round 1
        # would serialize a full wasted fan-out decode ahead of the
        # harness's CLIP dispatch. Cost of the deferral: the round-0 host
        # filter no longer overlaps round 1's decode when escalation IS
        # needed (one filter pass, ~100 ms). The lookahead round is
        # dispatched over the PRE-filter active set — a superset of the
        # molecules that will consume it — so its width lags the shrink
        # by at most one round (bounded waste, zero lost results).
        if dcfg.lookahead and 1 <= round_idx < dcfg.max_temp_rounds - 1:
            nxt = dispatch(round_idx + 1, active)  # in flight while filtering
        else:
            nxt = None
        W = len(pend_lanes)
        _t0 = _time.perf_counter()
        toks_u8, seqp_dev = _fetch_pack(pending.tokens, pending.token_probs)
        tokens = np.asarray(toks_u8).reshape(W, F, -1)
        probs = np.asarray(seqp_dev).reshape(W, F)
        _t1 = _time.perf_counter()
        # consume each unsatisfied molecule's first lane-row (pad rows
        # repeat the last molecule; satisfied molecules' rows are discarded)
        consume: list[tuple[int, int]] = []
        seen_rows: set = set()
        for j, b in enumerate(pend_lanes):
            if b in seen_rows:
                continue
            seen_rows.add(b)
            if len(outs[b].smiles) >= want:
                continue
            consume.append((j, b))
        # one batched canonicalize over the consumed lanes only (native
        # C++, threaded) — discarded/pad lanes skip host chemistry too
        flat_smiles = [
            vocab.ids_to_smiles(r) for j, _ in consume for r in tokens[j]
        ]
        canons = chem.batch_canonicalize(flat_smiles)
        pre_lens = {b: len(outs[b].smiles) for _, b in consume}
        for ci, (j, b) in enumerate(consume):
            _filter_block(
                tokens[j], probs[j],
                (target_mws[b] if target_mws is not None else None) if dcfg.mw_filter else None,
                dcfg.mw_delta, seens[b], outs[b], want,
                canons=canons[ci * F : (ci + 1) * F],
            )
            outs[b].rounds_used = round_idx + 1
        if on_round_accepted is not None:
            # downstream stages (candidate-spectra simulation in the eval
            # harness) can start work on accepted candidates while later
            # escalation rounds are still decoding on the device — the
            # rounds are device-bound and the host sits idle between them
            newly = [
                (b, outs[b].smiles[pre_lens[b]:])
                for _, b in consume
                if len(outs[b].smiles) > pre_lens[b]
            ]
            if newly:
                on_round_accepted(newly)
        if prof:
            print(
                f"  [mns-profile] round {round_idx}: width {W} "
                f"wait+fetch {(_t1 - _t0) * 1000:7.1f} ms "
                f"filter {(_time.perf_counter() - _t1) * 1000:7.1f} ms "
                f"({len(consume)} consumed)",
                flush=True,
            )
        active = [b for b in range(B) if len(outs[b].smiles) < want]
        if not active:
            break
        if nxt is None and round_idx + 1 < dcfg.max_temp_rounds:
            nxt = dispatch(round_idx + 1, active)
        if nxt is None:
            break  # round budget exhausted with molecules still unsatisfied
        pending, pend_lanes = nxt

    if beam_pending is not None:
        K = dcfg.beam_candidates
        btoks = np.asarray(beam_pending.tokens)  # [B, K, T]
        bscores = np.asarray(beam_pending.scores)  # [B, K] summed log-probs
        canons = chem.batch_canonicalize(
            [vocab.ids_to_smiles(r) for r in btoks.reshape(B * K, -1)]
        )
        beam_pre = [len(o.smiles) for o in outs]
        for b in range(B):
            out, seen = outs[b], seens[b]
            tmw = (target_mws[b] if target_mws is not None else None) if dcfg.mw_filter else None
            for k in range(K):
                can = canons[b * K + k]
                out.n_sampled += 1
                if can is None or can in seen:
                    continue
                if tmw is not None:
                    mw = chem.mol_wt(can)
                    if mw is None or abs(round(mw) - round(tmw)) > dcfg.mw_delta:
                        continue
                seen.add(can)
                out.smiles.append(can)
                out.seq_probs.append(float(np.exp(bscores[b, k])))
        if on_round_accepted is not None:
            newly = [
                (b, outs[b].smiles[beam_pre[b]:])
                for b in range(B)
                if len(outs[b].smiles) > beam_pre[b]
            ]
            if newly:
                on_round_accepted(newly)
    return outs


def greedy_smiles(
    params, mcfg: ModelConfig, memory: Array, memory_kpm: Array, max_len: int = 128,
    compute_dtype: Optional[str] = None,
) -> list[str]:
    """Greedy decode -> raw SMILES strings (reference greedy_sequence)."""
    res = samplers.greedy_decode(params, mcfg, memory, memory_kpm, 1.0, max_len,
                                 compute_dtype=compute_dtype)
    return vocab.batch_ids_to_smiles(np.asarray(res.tokens))
