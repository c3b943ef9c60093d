"""Device mesh construction and sharding rules.

The reference scales with PyTorch-Lightning DDP over NCCL
(`MT_functions_v15_4.py:139-153`) — data parallelism only, gradient
all-reduce on every step. The TPU-native equivalent is GSPMD: build a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
for tensor parallelism), annotate array shardings, and let XLA place the
collectives on ICI.

At 26M parameters the MMT is pure-DP territory; the ``model`` axis exists
for framework generality (Megatron-style column/row-parallel FFN and
head-parallel attention) and is exercised by the multi-chip dry-run tests.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"  # multi-slice axis: crossings ride the data-center network


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Create a (data, model) mesh. ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(
    slices: int, data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """(dcn, data, model) mesh for multi-slice pods (SURVEY.md §5.8).

    Only the leading ``dcn`` axis crosses slices: batch is sharded over
    (dcn, data) so the gradient all-reduce decomposes into a fast ICI
    reduce within each slice plus one slice-count-sized DCN reduce — model
    (tensor-parallel) collectives never leave a slice. On real multi-slice
    hardware pass the devices from ``mesh_utils.create_hybrid_device_mesh``;
    here any device list (incl. virtual CPU devices) is reshaped
    slice-major, which matches how multi-slice device ids enumerate."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % slices == 0, f"{n} devices not divisible by {slices} slices"
    per_slice = n // slices
    if data == -1:
        assert per_slice % model == 0
        data = per_slice // model
    assert slices * data * model == n, f"mesh {slices}x{data}x{model} != {n}"
    try:
        from jax.experimental import mesh_utils

        if jax.devices()[0].platform == "tpu" and devices == list(jax.devices()):
            arr = mesh_utils.create_hybrid_device_mesh(
                (data, model), (slices, 1), devices=devices
            ).reshape(slices, data, model)
            return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    except Exception:
        pass
    arr = np.asarray(devices).reshape(slices, data, model)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data-parallel axes (dcn+data
    on multi-slice meshes), replicate the rest."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_extent(mesh: Mesh) -> int:
    """Number of ways :func:`batch_sharding` partitions the batch dim —
    batch sizes must be padded to a multiple of this before device_put."""
    n = mesh.shape[DATA_AXIS]
    if DCN_AXIS in mesh.axis_names:
        n *= mesh.shape[DCN_AXIS]
    return n


def shard_for_inference(mesh: Mesh, params: Any, *batch_arrays: Any):
    """Replicate ``params`` and shard each array's leading (batch) dim over
    the mesh's data-parallel axes for fan-out decoding.

    The reference's MNS fan-out (`duplicate_dict` 128x,
    `run_batch_gen_val_MMT_v15_4.py:93-107`) is embarrassingly parallel
    across chips (SURVEY §5.8): with encoder memory sharded over ``data``
    and the decoder params replicated, GSPMD propagates the sharding
    through the whole compiled `lax.while_loop` sampler — each chip decodes
    its slice of molecules (and all their fan-out lanes) with zero
    inter-chip traffic until the final gather. Returns
    ``(params, *arrays)`` device_put with the right shardings; pass them to
    the existing samplers unchanged."""
    rep = jax.tree.map(lambda _: replicated(mesh), params)
    p = jax.device_put(params, rep)
    bs = batch_sharding(mesh)
    arrs = tuple(jax.device_put(a, bs) for a in batch_arrays)
    return (p, *arrs)


# --- parameter partitioning (tensor parallelism) -----------------------------
#
# Megatron-style sharding for the transformer blocks, expressed as rules over
# flax param paths. Attention QKV is head-parallel (rows of in_proj_weight),
# its output projection row-parallel (contraction dim); the FFN is
# column-parallel then row-parallel. Everything else (embeddings, norms,
# heads) is replicated — XLA inserts the single all-reduce per block.
_TP_RULES: list[tuple[re.Pattern, P]] = [
    # torch-layout [3D, D] / [D, D] attention projections; note a leading
    # stacked-modality axis may precede these two dims.
    (re.compile(r"in_proj_weight$"), P(MODEL_AXIS, None)),
    (re.compile(r"in_proj_bias$"), P(MODEL_AXIS)),
    (re.compile(r"out_proj_weight$"), P(None, MODEL_AXIS)),
    # flax-layout [in, out] FFN kernels
    (re.compile(r"linear1/(kernel|bias)$"), P(None, MODEL_AXIS) ),
    (re.compile(r"linear2/kernel$"), P(MODEL_AXIS, None)),
]


def _spec_for(path: str, ndim: int, tp: bool) -> P:
    if tp:
        for pat, spec in _TP_RULES:
            if pat.search(path):
                concrete = list(spec)
                if path.endswith("linear1/bias") :
                    concrete = [MODEL_AXIS]
                # right-align the 2D rule onto possibly >2D stacked params
                pad = ndim - len(concrete)
                if pad >= 0:
                    return P(*([None] * pad + concrete))
    return P()


def param_shardings(mesh: Mesh, params: Any, tensor_parallel: bool = False):
    """NamedShardings for a parameter pytree.

    With ``tensor_parallel=False`` (the right choice for the 26M MMT) every
    parameter is replicated; gradients all-reduce over ``data``.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    specs = {}
    for kp, leaf in flat:
        specs[path_str(kp)] = _spec_for(path_str(kp), np.ndim(leaf), tensor_parallel)

    def assign(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)
