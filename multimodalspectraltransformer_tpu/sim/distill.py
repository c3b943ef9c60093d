"""Distill the empirical shift/IR teachers into the TPU GNNs.

The reference ships *pretrained* SGNN and chemprop-IR checkpoints
(`sgnn_code_pl_v15_4.py:427-454`, `ir_simulation_v15_4.py:26-35`); neither
the weights nor their training data exist in this environment. The
equivalent here: teach `gnn.NMRShiftModel` / `gnn.IRModel` the first-party
rule teachers (`shift_rules`, `ir_rules`) over a large generated corpus,
and commit the weights so the factory's default path is a trained GNN —
batched MXU inference, same role the SGNN plays for the reference.

Transfer-format note: the axon TPU tunnel uploads at ~30 MB/s, so the
dataset is parked in HBM in COMPACT form — int8 node features, int8 edge
lists, uint8-quantized IR — and each gathered batch is densified on device
(`densify_batch`: one-hot edge scatter via einsum, ~free next to the MPNN
matmuls). A 20k-molecule dataset is ~50 MB instead of ~1.4 GB dense.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from ..chem.smiles import parse_smiles
from . import ir_rules, shift_rules
from .graphs import BOND_TYPES, ELEMENTS, MAX_DEGREE, MAX_H, N_ELEM, NODE_FEATURES

MAX_EDGES = 96

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")


# ---------------------------------------------------------------------------
# compact featurization (mirrors graphs.featurize_mol bit-for-bit once
# densified — tests/test_sim.py asserts equality)
# ---------------------------------------------------------------------------

def featurize_compact(mol, max_nodes: int = 64, max_edges: int = MAX_EDGES):
    """(nodes int8 [N,F], edges int8 [E,3] (a1,a2,type; pad type=-1),
    n_atoms) or None if oversized."""
    n = mol.num_atoms
    if n > max_nodes or len(mol.bonds) > max_edges:
        return None
    nodes = np.zeros((max_nodes, NODE_FEATURES), np.int8)
    for i, a in enumerate(mol.atoms):
        f = nodes[i]
        idx = ELEMENTS.index(a.symbol) if a.symbol in ELEMENTS else N_ELEM - 1
        f[idx] = 1
        f[N_ELEM + min(mol.degree(i), MAX_DEGREE)] = 1
        f[N_ELEM + MAX_DEGREE + 1 + min(mol.total_h(i), MAX_H)] = 1
        base = N_ELEM + MAX_DEGREE + 1 + MAX_H + 1
        f[base] = np.int8(a.charge)
        f[base + 1] = np.int8(a.aromatic)
        f[base + 2] = np.int8(a.in_ring)
    edges = np.full((max_edges, 3), -1, np.int8)
    for k, b in enumerate(mol.bonds):
        t = 3 if b.aromatic else b.order - 1
        edges[k] = (b.a1, b.a2, t)
    return nodes, edges, n


def densify_batch(nodes_i8, edges_i8, n_atoms, max_nodes: int = 64):
    """Device-side: compact batch -> (nodes f32, adj f32 [B,T,N,N], mask).
    jit-friendly (static shapes, one-hot einsum scatter)."""
    import jax
    import jax.numpy as jnp

    nodes = nodes_i8.astype(jnp.float32)
    mask = (jnp.arange(max_nodes)[None, :] < n_atoms[:, None]).astype(jnp.float32)
    e = edges_i8.astype(jnp.int32)
    valid = (e[..., 2] >= 0).astype(jnp.float32)
    t_oh = jax.nn.one_hot(e[..., 2], BOND_TYPES) * valid[..., None]
    a1_oh = jax.nn.one_hot(e[..., 0], max_nodes)
    a2_oh = jax.nn.one_hot(e[..., 1], max_nodes)
    adj = jnp.einsum("bet,bei,bej->btij", t_oh, a1_oh, a2_oh)
    adj = adj + adj.transpose(0, 1, 3, 2)
    return nodes, adj, mask


# ---------------------------------------------------------------------------
# teacher dataset
# ---------------------------------------------------------------------------

def build_teacher_dataset(
    smiles_list: Sequence[str], max_nodes: int = 64, with_ir: bool = True
) -> dict:
    """Compact arrays: graphs + rule-teacher shift/IR targets."""
    nodes, edges, n_atoms = [], [], []
    tc, mc, th, mh = [], [], [], []
    irs = []
    kept_smiles = []
    for smi in smiles_list:
        try:
            mol = parse_smiles(smi)
        except Exception:
            continue
        compact = featurize_compact(mol, max_nodes)
        if compact is None:
            continue
        sh = shift_rules.predict_shifts(mol)
        t_c = np.zeros(max_nodes, np.float32)
        m_c = np.zeros(max_nodes, np.uint8)
        t_h = np.zeros(max_nodes, np.float32)
        m_h = np.zeros(max_nodes, np.uint8)
        for i, a in enumerate(mol.atoms):
            if a.symbol == "C":
                t_c[i] = sh.shift_c[i]
                m_c[i] = 1
            if a.symbol == "C" and mol.total_h(i) > 0:
                t_h[i] = sh.shift_h[i]
                m_h[i] = 1
        nodes.append(compact[0])
        edges.append(compact[1])
        n_atoms.append(compact[2])
        tc.append(t_c)
        mc.append(m_c)
        th.append(t_h)
        mh.append(m_h)
        if with_ir:
            spec = ir_rules.predict_ir(mol)
            irs.append(np.round(spec * 255.0).astype(np.uint8))
        kept_smiles.append(smi)
    out = {
        "nodes": np.stack(nodes),
        "edges": np.stack(edges),
        "n_atoms": np.asarray(n_atoms, np.int32),
        "target_c": np.stack(tc),
        "mask_c": np.stack(mc),
        "target_h": np.stack(th),
        "mask_h": np.stack(mh),
        "smiles": kept_smiles,
    }
    if with_ir:
        out["ir"] = np.stack(irs)
    return out


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def _park(data: dict, keys: Sequence[str]):
    import jax.numpy as jnp

    return {k: jnp.asarray(data[k]) for k in keys}


def train_shift_model(
    data: dict,
    hidden: int = 128,
    steps: int = 4,
    batch_size: int = 256,
    n_steps: int = 4000,
    lr: float = 2e-3,
    seed: int = 0,
    val_frac: float = 0.05,
    log_every: int = 500,
    init_params=None,
    init_stats: Optional[dict] = None,
    weight_decay: float = 1e-4,
):
    """Distill shift_rules into NMRShiftModel. Returns (params, stats,
    report) where stats is the ShiftStats-compatible normalization dict and
    report carries held-out ppm MAEs.

    ``init_params``/``init_stats`` warm-start from an existing checkpoint
    (domain-adaptation fine-tune, e.g. scripts/sgnn_adapt.py): the
    normalization statistics are kept from the source checkpoint so the
    factory's denormalization stays compatible."""
    import jax
    import jax.numpy as jnp
    import optax

    from .gnn import NMRShiftModel

    m = len(data["n_atoms"])
    n_val = max(1, int(m * val_frac))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(m)
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    if init_stats is not None:
        mean_c, std_c = init_stats["mean_c"], init_stats["std_c"]
        mean_h, std_h = init_stats["mean_h"], init_stats["std_h"]
    else:
        mean_c = float(data["target_c"][data["mask_c"] > 0].mean())
        std_c = float(data["target_c"][data["mask_c"] > 0].std() + 1e-6)
        mean_h = float(data["target_h"][data["mask_h"] > 0].mean())
        std_h = float(data["target_h"][data["mask_h"] > 0].std() + 1e-6)
    stats = {"mean_c": mean_c, "std_c": std_c, "mean_h": mean_h, "std_h": std_h}

    dev = _park(data, ["nodes", "edges", "n_atoms", "target_c", "mask_c", "target_h", "mask_h"])

    model = NMRShiftModel(hidden=hidden, steps=steps)
    nodes0, adj0, mask0 = densify_batch(
        dev["nodes"][:2], dev["edges"][:2], dev["n_atoms"][:2]
    )
    if init_params is not None:
        params = init_params
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(seed), nodes0, adj0, mask0)["params"]
    # jitted init: eager flax init dispatches per-op through the TPU tunnel (CLAUDE.md)
    # weight_decay=0 for warm-started fine-tunes: decay pulls toward zero,
    # and adaptation gradients are tiny in the normalized loss (a 4-ppm 13C
    # error is 0.08 sigma), so the default decay would dominate them
    tx = optax.adamw(optax.cosine_decay_schedule(lr, n_steps, 0.05),
                     weight_decay=weight_decay)
    opt = tx.init(params)

    def batch_loss(p, idx):
        nodes, adj, mask = densify_batch(
            dev["nodes"][idx], dev["edges"][idx], dev["n_atoms"][idx]
        )
        c, h = model.apply({"params": p}, nodes, adj, mask)
        tc = (dev["target_c"][idx] - mean_c) / std_c
        th = (dev["target_h"][idx] - mean_h) / std_h
        mc = dev["mask_c"][idx].astype(jnp.float32)
        mh = dev["mask_h"][idx].astype(jnp.float32)
        lc = jnp.sum(optax.huber_loss(c, tc, delta=1.0) * mc) / jnp.maximum(mc.sum(), 1.0)
        lh = jnp.sum(optax.huber_loss(h, th, delta=1.0) * mh) / jnp.maximum(mh.sum(), 1.0)
        return lc + lh

    @jax.jit
    def step(p, o, idx):
        loss, grads = jax.value_and_grad(batch_loss)(p, idx)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    @jax.jit
    def val_mae(p, idx):
        nodes, adj, mask = densify_batch(
            dev["nodes"][idx], dev["edges"][idx], dev["n_atoms"][idx]
        )
        c, h = model.apply({"params": p}, nodes, adj, mask)
        mc = dev["mask_c"][idx].astype(jnp.float32)
        mh = dev["mask_h"][idx].astype(jnp.float32)
        err_c = jnp.abs(c * std_c + mean_c - dev["target_c"][idx]) * mc
        err_h = jnp.abs(h * std_h + mean_h - dev["target_h"][idx]) * mh
        return err_c.sum() / jnp.maximum(mc.sum(), 1.0), err_h.sum() / jnp.maximum(mh.sum(), 1.0)

    loss = None
    for k in range(n_steps):
        idx = jnp.asarray(rng.choice(train_idx, size=batch_size), jnp.int32)
        params, opt, loss = step(params, opt, idx)
        if log_every and (k + 1) % log_every == 0:
            mae_c, mae_h = val_mae(params, jnp.asarray(val_idx[:512], jnp.int32))
            print(
                f"shift distill step {k+1}/{n_steps}: loss {float(loss):.4f} "
                f"val MAE 13C {float(mae_c):.2f} ppm, 1H {float(mae_h):.3f} ppm",
                flush=True,
            )
    mae_c, mae_h = val_mae(params, jnp.asarray(val_idx[:2048], jnp.int32))
    report = {
        "val_mae_c_ppm": float(mae_c),
        "val_mae_h_ppm": float(mae_h),
        "final_loss": float(loss) if loss is not None else None,
        "n_train": int(len(train_idx)),
        "n_val": int(n_val),
        "hidden": hidden,
        "steps": steps,
        "train_steps": n_steps,
    }
    return params, stats, report


def train_ir_model(
    data: dict,
    hidden: int = 128,
    steps: int = 4,
    bins: int = 1801,
    batch_size: int = 128,
    n_steps: int = 3000,
    lr: float = 2e-3,
    seed: int = 0,
    val_frac: float = 0.05,
    log_every: int = 500,
):
    """Distill ir_rules into IRModel. Returns (params, report)."""
    import jax
    import jax.numpy as jnp
    import optax

    from .gnn import IRModel

    m = len(data["n_atoms"])
    n_val = max(1, int(m * val_frac))
    rng = np.random.default_rng(seed + 1)
    perm = rng.permutation(m)
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    dev = _park(data, ["nodes", "edges", "n_atoms", "ir"])

    model = IRModel(hidden=hidden, steps=steps, bins=bins)
    nodes0, adj0, mask0 = densify_batch(
        dev["nodes"][:2], dev["edges"][:2], dev["n_atoms"][:2]
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), nodes0, adj0, mask0)["params"]
    # jitted init: eager flax init dispatches per-op through the TPU tunnel (CLAUDE.md)
    tx = optax.adamw(optax.cosine_decay_schedule(lr, n_steps, 0.05))
    opt = tx.init(params)

    def batch_loss(p, idx):
        nodes, adj, mask = densify_batch(
            dev["nodes"][idx], dev["edges"][idx], dev["n_atoms"][idx]
        )
        pred = model.apply({"params": p}, nodes, adj, mask)
        target = dev["ir"][idx].astype(jnp.float32) / 255.0
        return jnp.mean(jnp.square(pred - target))

    @jax.jit
    def step(p, o, idx):
        loss, grads = jax.value_and_grad(batch_loss)(p, idx)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    @jax.jit
    def val_mae(p, idx):
        nodes, adj, mask = densify_batch(
            dev["nodes"][idx], dev["edges"][idx], dev["n_atoms"][idx]
        )
        pred = model.apply({"params": p}, nodes, adj, mask)
        target = dev["ir"][idx].astype(jnp.float32) / 255.0
        return jnp.mean(jnp.abs(pred - target))

    loss = None
    for k in range(n_steps):
        idx = jnp.asarray(rng.choice(train_idx, size=batch_size), jnp.int32)
        params, opt, loss = step(params, opt, idx)
        if log_every and (k + 1) % log_every == 0:
            mae = val_mae(params, jnp.asarray(val_idx[:256], jnp.int32))
            print(
                f"ir distill step {k+1}/{n_steps}: loss {float(loss):.5f} "
                f"val MAE {float(mae):.4f}",
                flush=True,
            )
    mae = val_mae(params, jnp.asarray(val_idx[:1024], jnp.int32))
    report = {
        "val_mae": float(mae),
        "final_loss": float(loss) if loss is not None else None,
        "n_train": int(len(train_idx)),
        "n_val": int(n_val),
        "hidden": hidden,
        "steps": steps,
        "bins": bins,
        "train_steps": n_steps,
    }
    return params, report


# ---------------------------------------------------------------------------
# weight persistence (msgpack via flax.serialization + JSON meta)
# ---------------------------------------------------------------------------

def save_shift_weights(params, stats: dict, report: dict, out_dir: str = WEIGHTS_DIR):
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "nmr_shift.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(out_dir, "nmr_shift.json"), "w") as f:
        json.dump({"stats": stats, "report": report}, f, indent=1)


def save_ir_weights(params, report: dict, out_dir: str = WEIGHTS_DIR):
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ir.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(out_dir, "ir.json"), "w") as f:
        json.dump({"report": report}, f, indent=1)


def load_shift_weights(weights_dir: str = WEIGHTS_DIR):
    """(params, NMRShiftModel, ShiftStats) from committed weights, or None."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from .factory import ShiftStats
    from .gnn import NMRShiftModel

    msg = os.path.join(weights_dir, "nmr_shift.msgpack")
    meta_path = os.path.join(weights_dir, "nmr_shift.json")
    if not (os.path.exists(msg) and os.path.exists(meta_path)):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    model = NMRShiftModel(hidden=meta["report"]["hidden"], steps=meta["report"]["steps"])
    nodes = jnp.zeros((1, 2, NODE_FEATURES), jnp.float32)
    adj = jnp.zeros((1, BOND_TYPES, 2, 2), jnp.float32)
    mask = jnp.ones((1, 2), jnp.float32)
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), nodes, adj, mask)["params"])
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    with open(msg, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    s = meta["stats"]
    stats = ShiftStats(s["mean_c"], s["std_c"], s["mean_h"], s["std_h"])
    return params, model, stats


def load_ir_weights(weights_dir: str = WEIGHTS_DIR):
    """(params, IRModel) from committed weights, or None."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from .gnn import IRModel

    msg = os.path.join(weights_dir, "ir.msgpack")
    meta_path = os.path.join(weights_dir, "ir.json")
    if not (os.path.exists(msg) and os.path.exists(meta_path)):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    r = meta["report"]
    model = IRModel(hidden=r["hidden"], steps=r["steps"], bins=r["bins"])
    nodes = jnp.zeros((1, 2, NODE_FEATURES), jnp.float32)
    adj = jnp.zeros((1, BOND_TYPES, 2, 2), jnp.float32)
    mask = jnp.ones((1, 2), jnp.float32)
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), nodes, adj, mask)["params"])
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    with open(msg, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return params, model
