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
from .graphs import batch_graphs, featurize_mol
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


def predict_shifts_gnn(params, model, graphs, stats: ShiftStats) -> list[AtomShifts]:
    """Batched shift prediction via NMRShiftModel (denormalized to ppm)."""
    batch = batch_graphs(graphs)
    c_n, h_n = _jitted_apply(model, params, batch["nodes"], batch["adj"], batch["node_mask"])
    c = np.asarray(c_n) * stats.std_c + stats.mean_c
    h = np.asarray(h_n) * stats.std_h + stats.mean_h
    out = []
    for b, g in enumerate(graphs):
        out.append(AtomShifts(c[b, : g.n_atoms], h[b, : g.n_atoms]))
    return out


def simulate_records(
    smiles_list: Sequence[str],
    sample_ids: Optional[Sequence[str]] = None,
    shift_params=None,
    shift_model=None,
    ir_params=None,
    ir_model=None,
    stats: ShiftStats = ShiftStats(),
    max_nodes: int = 64,
) -> list[SampleRecord]:
    """Full factory: SMILES -> SampleRecords with 1H/13C/HSQC/COSY (+IR).

    Equivalent of `main_run_data_generation` + `run_IR_simulation`
    (`data_generation_v15_4.py:1217-1229`, `ir_simulation_v15_4.py:52-87`).
    """
    kept = filter_smiles(smiles_list)
    if sample_ids is None:
        sample_ids = [str(i) for i in range(len(smiles_list))]

    mols, graphs, metas = [], [], []
    for idx, can in kept:
        mol = parse_smiles(can)
        g = featurize_mol(mol, max_nodes)
        if g is None:
            continue
        mols.append(mol)
        graphs.append(g)
        metas.append((sample_ids[idx], can))
    if not mols:
        return []

    if shift_params is not None and shift_model is not None:
        shifts = predict_shifts_gnn(shift_params, shift_model, graphs, stats)
    else:
        shifts = [empirical_shifts(m) for m in mols]

    ir_specs: Optional[np.ndarray] = None
    if ir_params is not None and ir_model is not None:
        batch = batch_graphs(graphs)
        ir_specs = np.asarray(
            _jitted_apply(ir_model, ir_params, batch["nodes"], batch["adj"], batch["node_mask"])
        )

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
