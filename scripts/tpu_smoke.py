"""Compiled-on-TPU smoke test for every first-party Pallas kernel.

pytest runs on the virtual 8-CPU mesh (tests/conftest.py forces
``jax_platforms=cpu``), so the Pallas tests there exercise interpret mode
only. This script is the real-chip complement: it compiles each kernel with
``interpret=False`` on the attached TPU and checks numerics against the
host oracle (scipy Hungarian / XLA einsum math). Run it after any kernel or
Mosaic-toolchain change:

    PYTHONPATH=/root/repo:$PYTHONPATH timeout 580 python scripts/tpu_smoke.py

Exit code 0 and one ``TPU_SMOKE ok`` line = all kernels compile and agree.
Reference ops displaced by these kernels: per-candidate scipy Hungarian at
`similarity_functions_v15_4.py:735,958`; the torch decode attention at
`models_MMT_v15_4.py:487-546`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def check_auction() -> str:
    from multimodalspectraltransformer_tpu.ops.auction import (
        auction_assignment_cost_pallas,
    )

    rng = np.random.default_rng(0)
    cost = rng.uniform(0, 1, (64, 32, 32)).astype(np.float32)
    t0 = time.time()
    out = np.asarray(auction_assignment_cost_pallas(jnp.asarray(cost), interpret=False))
    dt = time.time() - t0
    ref = np.array([c[linear_sum_assignment(c)].sum() for c in cost])
    err = np.abs(out - ref).max()
    assert err < 32 * 1e-4, f"auction mismatch: max err {err}"
    return f"auction[64x32x32] ok (max err {err:.2e}, {dt:.1f}s incl compile)"


def check_batched_assignment_error() -> str:
    from multimodalspectraltransformer_tpu.ops.auction import (
        batched_assignment_error_pallas,
    )

    rng = np.random.default_rng(1)
    query = rng.uniform(0, 1, (10, 2)).astype(np.float32)
    cands = rng.uniform(0, 1, (8, 12, 2)).astype(np.float32)
    counts = np.full((8,), 12)
    # dispatches to the compiled Pallas kernel when the backend is TPU
    out = np.asarray(batched_assignment_error_pallas(query, cands, 10, counts))
    N = 12
    q = np.zeros((N, 2), np.float32)
    q[:10] = query
    for ci in range(8):
        d = np.linalg.norm(q[:, None, :] - cands[ci][None, :, :], axis=-1)
        ref = d[linear_sum_assignment(d)].sum() / N
        assert abs(out[ci] - ref) < 1e-3, (ci, out[ci], ref)
    return "batched_assignment_error[8x12] ok"


def check_decode_attention() -> str:
    from multimodalspectraltransformer_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(2)
    B, H, Dh, T = 16, 4, 8, 128
    q = jnp.asarray(rng.normal(size=(B, H, Dh)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(B, H, 2 * Dh, T)), jnp.float32)
    pos = jnp.asarray(17, jnp.int32)
    out = np.asarray(decode_attention(q, kv, pos, interpret=False))
    k, v = kv[:, :, :Dh, :], kv[:, :, Dh:, :]
    s = jnp.einsum("bhd,bhdk->bhk", q, k)
    s = jnp.where((jnp.arange(T) <= pos)[None, None, :], s, -jnp.inf)
    ref = np.asarray(jnp.einsum("bhk,bhdk->bhd", jax.nn.softmax(s, -1), v))
    err = np.abs(out - ref).max()
    assert err < 1e-4, f"decode_attention mismatch: {err}"
    return f"decode_attention[{B}x{H}] ok (max err {err:.2e})"


def check_beam_attention() -> str:
    from multimodalspectraltransformer_tpu.ops.beam_attention import beam_attention

    rng = np.random.default_rng(3)
    B, H, K, Dh, M = 4, 4, 5, 8, 128
    q = jnp.asarray(rng.normal(size=(B, H, K, Dh)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(B, H, Dh, M)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(B, H, Dh, M)), jnp.float32)
    mask = rng.uniform(size=(B, K, M)) < 0.3
    mask[:, :, 0] = True
    bias = jnp.where(jnp.asarray(mask), 0.0, -jnp.inf).astype(jnp.float32)
    out = np.asarray(beam_attention(q, kc, vc, bias, interpret=False))
    s = jnp.einsum("bhkd,bhdm->bhkm", q, kc) + bias[:, None]
    ref = np.asarray(jnp.einsum("bhkm,bhdm->bhkd", jax.nn.softmax(s, -1), vc))
    err = np.abs(out - ref).max()
    assert err < 1e-4, f"beam_attention mismatch: {err}"
    return f"beam_attention[{B}x{H}x{K}] ok (max err {err:.2e})"


def main() -> int:
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"TPU_SMOKE skip: device is {dev.platform}, not tpu", flush=True)
        return 1
    from multimodalspectraltransformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    lines = [
        check_auction(),
        check_batched_assignment_error(),
        check_decode_attention(),
        check_beam_attention(),
    ]
    for ln in lines:
        print("  " + ln, flush=True)
    print(f"TPU_SMOKE ok on {dev} ({len(lines)} kernels compiled, non-interpret)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
