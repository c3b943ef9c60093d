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


@dataclass
class CandidateSet:
    """Unique, valid, canonicalized candidates for one molecule."""

    smiles: list[str] = field(default_factory=list)
    seq_probs: list[float] = field(default_factory=list)  # product of token probs
    rounds_used: int = 0
    n_sampled: int = 0


def _filter_block(
    tokens: np.ndarray,  # [F, T]
    probs: np.ndarray,  # [F, T]
    target_mw: Optional[float],
    mw_delta: float,
    seen: set,
    out: CandidateSet,
    want: int,
) -> None:
    """Host-side validity/canonicalize/dedup/MW filter of one device block
    (reference `:1035-1083` filter_probs_and_valid_smiles_and_canonicolize,
    filter_for_MW_2, deduplicate_smiles)."""
    for row, prow in zip(tokens, probs):
        if len(out.smiles) >= want:
            return
        smi = vocab.ids_to_smiles(row)
        out.n_sampled += 1
        if not smi:
            continue
        can = chem.canonicalize(smi)
        if can is None or can in seen:
            continue
        if target_mw is not None:
            mw = chem.mol_wt(can)
            # reference compares rounded MW within +-delta (`:1083`)
            if mw is None or abs(round(mw) - round(target_mw)) > mw_delta:
                continue
        seen.add(can)
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
    """Temperature-escalation fan-out sampling for one molecule."""
    out = CandidateSet()
    seen: set = set()
    temp = dcfg.temperature
    for round_idx in range(dcfg.max_temp_rounds):
        res = samplers.multinomial_decode(
            params, mcfg, memory, memory_kpm,
            jax.random.fold_in(rng, round_idx),
            jnp.asarray(temp, jnp.float32),
            dcfg.max_len,
            fanout=dcfg.fanout,
        )
        _filter_block(
            np.asarray(res.tokens),
            np.asarray(res.token_probs),
            target_mw if dcfg.mw_filter else None,
            dcfg.mw_delta,
            seen,
            out,
            dcfg.multinom_runs,
        )
        out.rounds_used = round_idx + 1
        if len(out.smiles) >= dcfg.multinom_runs:
            break
        temp += dcfg.temp_increment
    return out


def greedy_smiles(
    params, mcfg: ModelConfig, memory: Array, memory_kpm: Array, max_len: int = 128
) -> list[str]:
    """Greedy decode -> raw SMILES strings (reference greedy_sequence)."""
    res = samplers.greedy_decode(params, mcfg, memory, memory_kpm, 1.0, max_len)
    return vocab.batch_ids_to_smiles(np.asarray(res.tokens))
