"""Pallas TPU kernel: batched auction assignment solver.

Device counterpart of scipy's Hungarian in the spectral-matching engine
(reference `similarity_functions_v15_4.py:735,958` — one
linear_sum_assignment call per candidate molecule on the host). The pure-JAX
auction in rank/matching.py materializes [B, N, N] bid tensors in HBM every
iteration; this kernel instead pins one [N, N] cost block per grid step in
VMEM and runs the full auction loop on-chip, so HBM sees exactly one read
of the cost tensor and one scalar write per problem.

Grid: one program per batch element. State (prices [1, N], owner [1, N]) is
loop-carried in registers/VMEM. eps-scaling: with eps below the smallest
cost gap the auction returns the Hungarian optimum; the default matches the
tolerance used by rank/matching.py (verified against scipy in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # sentinel "no bid" (finite to keep TPU max/argmax well-defined)


def _auction_kernel(n_phases: int, iters_per_phase: int, eps_final: float,
                    scale_factor: float, cost_ref, total_ref):
    cost = cost_ref[0]  # [N, N]
    n = cost.shape[0]
    benefit = -cost
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def iteration(prices, owner, eps):
        """One bid/assign round. prices [1, N]; owner[0, j] = bidder or -1."""
        value = benefit - prices  # [N(i), N(j)]
        top1 = jnp.max(value, axis=1, keepdims=True)  # [N, 1]
        best_j = jnp.argmax(value, axis=1)[:, None]  # [N, 1]
        chosen = col_ids == best_j
        masked = jnp.where(chosen, NEG, value)
        top2 = jnp.max(masked, axis=1, keepdims=True)
        # bidder i participates iff it owns no object
        owns = jnp.max(jnp.where(owner == row_ids, 1, 0), axis=1, keepdims=True)
        bid_amount = top1 - top2 + eps  # [N, 1]
        bids = jnp.where((owns == 0) & chosen, bid_amount, NEG)  # [N, N]
        win_bid = jnp.max(bids, axis=0, keepdims=True)  # [1, N]
        win_bidder = jnp.argmax(bids, axis=0)[None, :]  # [1, N]
        has_bid = win_bid > NEG / 2
        prices = jnp.where(has_bid, prices + win_bid, prices)
        owner = jnp.where(has_bid, win_bidder, owner)
        return prices, owner

    # epsilon-scaling: each phase reruns the auction (keeping prices, which
    # are near-optimal from the previous phase) at eps/scale_factor; fixed
    # eps alone needs O(C/eps) rounds and stalls on hard instances.
    eps0 = jnp.maximum(jnp.max(cost) - jnp.min(cost), eps_final) * 0.5

    def phase(p, carry):
        prices, _owner, eps_cur = carry
        eps = jnp.maximum(eps_final, eps_cur)
        owner0 = jnp.full((1, n), -1, jnp.int32)

        def cond(st):
            i, _prices, owner = st
            return (i < iters_per_phase) & jnp.any(owner < 0)

        def body(st):
            i, prices, owner = st
            prices, owner = iteration(prices, owner, eps)
            return i + 1, prices, owner

        _, prices, owner = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), prices, owner0))
        return prices, owner, eps / scale_factor

    prices0 = jnp.zeros((1, n), cost.dtype)
    owner0 = jnp.full((1, n), -1, jnp.int32)
    prices, owner, _ = jax.lax.fori_loop(0, n_phases, phase, (prices0, owner0, eps0))
    # unassigned columns (non-converged pathological case) fall back to diag
    owner = jnp.where(owner >= 0, owner, jax.lax.broadcasted_iota(jnp.int32, (1, n), 1))
    picked = jnp.where(owner == row_ids, cost, 0.0)
    # output block is one (8, 128) VMEM tile per problem (TPU min tile);
    # the scalar total is broadcast into it and sliced out by the caller
    total_ref[0] = jnp.full((8, 128), jnp.sum(picked), cost.dtype)


@partial(jax.jit, static_argnames=("n_phases", "iters_per_phase", "eps_final",
                                   "scale_factor", "interpret"))
def auction_assignment_cost_pallas(
    cost: jax.Array,  # [B, N, N]
    n_phases: int = 8,
    iters_per_phase: int = 0,  # 0 = 8*N
    eps_final: float = 1e-5,
    scale_factor: float = 6.0,
    interpret: bool | None = None,
) -> jax.Array:
    """Total optimal-assignment cost per batch element, [B, N, N] -> [B].
    Within N*eps_final of the Hungarian optimum (scipy-verified)."""
    B, N, _ = cost.shape
    if iters_per_phase == 0:
        iters_per_phase = 8 * N
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        partial(_auction_kernel, n_phases, iters_per_phase, eps_final, scale_factor),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(cost.astype(jnp.float32))
    return out[:, 0, 0]


def batched_assignment_error_pallas(
    query: np.ndarray,  # [N, 2] normalized query peaks
    candidates: np.ndarray,  # [C, M, 2] normalized candidate peak sets
    query_count: int,
    cand_counts: np.ndarray,
) -> np.ndarray:
    """Alias of rank.matching.batched_assignment_error (hung_dist_zero
    semantics: padding pairs at zero cost). Kept for the ops namespace;
    matching owns the implementation — it dispatches to the compiled
    Pallas kernel on TPU and to the fast jitted JAX auction elsewhere
    (running the Pallas interpreter off-TPU is per-op Python, far slower)."""
    from ..rank.matching import batched_assignment_error

    return batched_assignment_error(query, candidates, query_count, cand_counts)


def assignment_cost(cost: "np.ndarray | jax.Array", **kwargs) -> jax.Array:
    """Public entry: batched exact-within-eps assignment cost on the current
    backend (Pallas compiled on TPU, interpret elsewhere)."""
    return auction_assignment_cost_pallas(jnp.asarray(cost), **kwargs)
