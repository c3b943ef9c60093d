"""The simulated-data factory: SMILES -> predicted shifts -> spectra.

Reference pipeline (`data_generation_v15_4.py:63-103, 1217-1229` +
`ir_simulation_v15_4.py:52-87`): filter SMILES (H-less, disconnected,
MW > 550), run the SGNN shift predictor in batches with a retry cascade,
reconstruct 1H/13C/HSQC/COSY peak lists, run chemprop-IR, write CSVs.

Here the whole factory is in-process: graphs are featurized in memory,
shifts/IR come from the JAX GNNs in one jitted batched call per model (no
SDF/npz disk round-trip, no retry cascade — a malformed molecule is just
filtered), and outputs are data.pipeline.SampleRecord objects (optionally
exported to the reference CSV format).

When no trained GNN weights are supplied, an empirical additivity-rule
shift model provides chemically plausible values so the factory is usable
standalone (tests, demos, benchmark fixtures).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..chem import api as chem
from ..chem.smiles import Mol, parse_smiles
from ..data.pipeline import SampleRecord
from . import reconstruct, shift_rules
from .reconstruct import AtomShifts

MAX_MW = 550.0  # reference SGNN_size_filter


def filter_smiles(smiles_list: Sequence[str]) -> list[tuple[int, str]]:
    """Reference run_sgnn filters (`data_generation_v15_4.py:63-103`):
    valid, connected, has hydrogens, MW <= 550."""
    keep = []
    for idx, smi in enumerate(smiles_list):
        can = chem.canonicalize(smi)
        if can is None or "." in can:
            continue
        mw = chem.mol_wt(can)
        if mw is None or mw > MAX_MW:
            continue
        try:
            mol = parse_smiles(can)
        except Exception:
            continue
        if not any(mol.total_h(i) for i in range(mol.num_atoms)):
            continue
        keep.append((idx, can))
    return keep


# ---------------------------------------------------------------------------
# Empirical shift model (Pretsch/Grant-Paul additivity rules, sim.shift_rules)
# ---------------------------------------------------------------------------

def empirical_shifts(mol: Mol) -> AtomShifts:
    """13C/1H shifts from first-party additivity increment rules
    (`sim.shift_rules.predict_shifts`; ~1-3 ppm 13C / ~0.1-0.3 ppm 1H on
    common organics). The teacher for the trained `NMRShiftModel` and the
    standalone default when no trained GNN weights are supplied."""
    return shift_rules.predict_shifts(mol)


# ---------------------------------------------------------------------------
# GNN-backed prediction
# ---------------------------------------------------------------------------

@dataclass
class ShiftStats:
    """Denormalization statistics (reference `load_std_mean`,
    `sgnn_code_pl_v15_4.py:417-425`)."""

    mean_c: float = 95.0
    std_c: float = 50.0
    mean_h: float = 4.0
    std_h: float = 2.0


def _apply_model(model, params, nodes, adj, mask):
    return model.apply({"params": params}, nodes, adj, mask)


# module-level jit keyed on the (hashable flax) module: a fresh
# jax.jit(lambda ...) per call would be a new cache entry every time and
# recompile the GNN on every simulate_records invocation
_apply_model_jit = None


def _jitted_apply(model, params, nodes, adj, mask):
    global _apply_model_jit
    if _apply_model_jit is None:
        import jax

        _apply_model_jit = jax.jit(_apply_model, static_argnums=(0,))
    return _apply_model_jit(model, params, nodes, adj, mask)


# ---------------------------------------------------------------------------
# default trained models (committed distilled weights, sim/weights/)
# ---------------------------------------------------------------------------

_default_shift = "unset"  # None = looked and absent; tuple = loaded
_default_ir = "unset"


def default_shift_model():
    """(params, model, stats) distilled from shift_rules (sim.distill), or
    None when no committed weights exist."""
    global _default_shift
    if _default_shift == "unset":
        from . import distill

        _default_shift = distill.load_shift_weights()
    return _default_shift


def default_ir_model():
    global _default_ir
    if _default_ir == "unset":
        from . import distill

        _default_ir = distill.load_ir_weights()
    return _default_ir


def _predict_chunked(params, model, mols, chunk: int = 256, max_nodes: int = 64,
                     compacts=None):
    """Compact-featurize + on-device densify + chunked GNN apply; returns
    list of per-mol raw (normalized) output tuples. Pass ``compacts`` (one
    per mol, from featurize_compact) to skip re-featurizing — the factory
    shares one featurization across the oversize filter and both GNNs."""
    import jax.numpy as jnp

    from .distill import densify_batch, featurize_compact

    outs = [None] * len(mols)
    if compacts is None:
        compacts = [featurize_compact(m, max_nodes) for m in mols]
    idxs = [i for i, c in enumerate(compacts) if c is not None]
    for s in range(0, len(idxs), chunk):
        sel = idxs[s : s + chunk]
        pad = sel + [sel[-1]] * (chunk - len(sel))  # static batch shape
        nodes = jnp.asarray(np.stack([compacts[i][0] for i in pad]))
        edges = jnp.asarray(np.stack([compacts[i][1] for i in pad]))
        n_at = jnp.asarray([compacts[i][2] for i in pad], jnp.int32)
        dn, da, dm = densify_batch(nodes, edges, n_at, max_nodes)
        res = _jitted_apply(model, params, dn, da, dm)
        res = [np.asarray(r) for r in (res if isinstance(res, tuple) else (res,))]
        for b, i in enumerate(sel):
            outs[i] = tuple(r[b] for r in res)
    return outs, compacts


def simulate_records(
    smiles_list: Sequence[str],
    sample_ids: Optional[Sequence[str]] = None,
    shift_params=None,
    shift_model=None,
    ir_params=None,
    ir_model=None,
    stats: ShiftStats = ShiftStats(),
    max_nodes: int = 64,
    use_default_models: bool = True,
    with_ir: bool = True,
) -> list[SampleRecord]:
    """Full factory: SMILES -> SampleRecords with 1H/13C/HSQC/COSY (+IR).

    Equivalent of `main_run_data_generation` + `run_IR_simulation`
    (`data_generation_v15_4.py:1217-1229`, `ir_simulation_v15_4.py:52-87`).

    Model resolution order (per predictor): explicitly passed params+model;
    else the committed distilled GNN weights (`sim/weights/`, the
    SGNN/chemprop-IR replacement — `default_shift_model`); else the rule
    teachers directly (`shift_rules`, `ir_rules`).
    """
    kept = filter_smiles(smiles_list)
    if sample_ids is None:
        sample_ids = [str(i) for i in range(len(smiles_list))]

    from .distill import featurize_compact

    mols, metas, compacts = [], [], []
    n_oversized = 0
    for idx, can in kept:
        mol = parse_smiles(can)
        compact = featurize_compact(mol, max_nodes)
        if compact is None:
            # distinct from the MW/valence filters above: graph exceeds the
            # GNN featurization budget (>max_nodes atoms or >MAX_EDGES bonds)
            n_oversized += 1
            continue
        mols.append(mol)
        metas.append((sample_ids[idx], can))
        compacts.append(compact)  # shared with both GNN passes below
    if n_oversized:
        import sys

        print(
            f"[sim.factory] dropped {n_oversized} molecule(s) exceeding the GNN "
            f"featurization budget (> {max_nodes} atoms or > 96 bonds)",
            file=sys.stderr, flush=True,
        )
    if not mols:
        return []

    if shift_params is None and use_default_models:
        d = default_shift_model()
        if d is not None:
            shift_params, shift_model, stats = d
    if shift_params is not None and shift_model is not None:
        outs, _ = _predict_chunked(shift_params, shift_model, mols, max_nodes=max_nodes,
                                   compacts=compacts)
        shifts = []
        for mol, o in zip(mols, outs):
            n = mol.num_atoms
            shifts.append(
                AtomShifts(
                    o[0][:n] * stats.std_c + stats.mean_c,
                    o[1][:n] * stats.std_h + stats.mean_h,
                )
            )
    else:
        shifts = [empirical_shifts(m) for m in mols]

    ir_specs: Optional[list] = None
    if with_ir:
        if ir_params is None and use_default_models:
            d = default_ir_model()
            if d is not None:
                ir_params, ir_model = d
        if ir_params is not None and ir_model is not None:
            outs, _ = _predict_chunked(ir_params, ir_model, mols, max_nodes=max_nodes,
                                       compacts=compacts)
            ir_specs = [o[0] for o in outs]
        else:
            from . import ir_rules

            ir_specs = [ir_rules.predict_ir(m) for m in mols]

    records = []
    for k, (mol, sh, (sid, can)) in enumerate(zip(mols, shifts, metas)):
        h1 = reconstruct.reconstruct_1h(mol, sh)
        c13 = reconstruct.reconstruct_13c(mol, sh)
        hsqc = reconstruct.reconstruct_hsqc(mol, sh)
        cosy = reconstruct.reconstruct_cosy(mol, sh)
        ir = ir_specs[k] if ir_specs is not None else None
        records.append(
            SampleRecord(
                sid, can,
                h1=[list(p) for p in h1] or None,
                c13=list(c13) or None,
                hsqc=[list(p) for p in hsqc] or None,
                cosy=[list(p) for p in cosy] or None,
                ir=ir,
            )
        )
    return records


def export_reference_csvs(records: Sequence[SampleRecord], out_dir: str, run_id: str = "0") -> dict[str, str]:
    """Write the 4 per-modality CSVs in the reference's on-disk format
    (`data_generation_v15_4.py:745-757`) + per-sample IR CSVs."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for key, attr in (("1H", "h1"), ("13C", "c13"), ("HSQC", "hsqc"), ("COSY", "cosy")):
        rows = [
            {"SMILES": r.smiles, "shifts": str(getattr(r, attr)), "sample-id": r.sample_id}
            for r in records
            if getattr(r, attr) is not None
        ]
        path = os.path.join(out_dir, f"data_{key}_{run_id}.csv")
        pd.DataFrame(rows).to_csv(path, index=False)
        paths[key] = path
    ir_dir = os.path.join(out_dir, "IR_data")
    os.makedirs(ir_dir, exist_ok=True)
    for r in records:
        if r.ir is not None:
            pd.DataFrame({"spectra": r.ir}).to_csv(os.path.join(ir_dir, f"{r.sample_id}.csv"), index=False)
    paths["IR"] = ir_dir
    return paths
