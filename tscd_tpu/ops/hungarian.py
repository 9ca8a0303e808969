"""On-device Hungarian assignment (linear sum assignment).

The reference ships every frame's proposal-matching cost matrix to the CPU
and calls scipy.optimize.linear_sum_assignment
(yolox/models/tscd_matching.py:903-935) — a host sync inside the hot eval
loop. Here we run the Jonker-Volgenant shortest-augmenting-path algorithm
(the same algorithm scipy implements) entirely on device with
`lax.while_loop`/`lax.scan`, for fixed n x n cost matrices (n = proposal
count P <= ~128, so the O(n^3) scalar loop nest is negligible next to the
backbone convs and stays inside the jitted graph — no transfer, no sync).

Invalid slots are handled by masking the cost matrix before calling
(set rows/cols of invalid proposals to a large constant so they match
among themselves).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

INF = jnp.inf

# Pallas-kernel dispatch policy. None = auto: use the TPU kernel when
# jax.default_backend() is "tpu" and n <= 128. NOTE the auto check runs
# at TRACE time, so a computation explicitly placed on CPU from a
# TPU-default process (jax.default_device(cpu_dev)) would still pick the
# TPU kernel — set USE_PALLAS = False (or pass use_pallas=False) around
# such regions. Only the `jax_platforms` config is visible to the auto
# path. Tie-break caveat either way: both lowerings pick the FIRST
# minimal column (argmin), scipy prefers unassigned columns — results
# match scipy only for unique optima (random float costs in practice).
USE_PALLAS: Optional[bool] = None


def _augmenting_path_step(cost, u, v, row4col, cur_row):
    """One row insertion: Dijkstra over reduced costs to the nearest
    unassigned column, returning the predecessor array and visit sets."""
    n = cost.shape[0]

    def cond(state):
        sink, *_ = state
        return sink < 0

    def body(state):
        _, i, min_val, remaining, spc, path, sr = state
        sr = sr.at[i].set(True)
        r = min_val + cost[i] - u[i] - v  # (n,) reduced path costs via i
        better = (r < spc) & remaining
        spc = jnp.where(better, r, spc)
        path = jnp.where(better, i, path)
        masked = jnp.where(remaining, spc, INF)
        j = jnp.argmin(masked)
        min_val = masked[j]
        remaining = remaining.at[j].set(False)
        next_i = row4col[j]
        sink = jnp.where(next_i < 0, j, -1)
        return (sink, jnp.maximum(next_i, 0), min_val, remaining, spc, path, sr)

    init = (jnp.int32(-1), cur_row, jnp.float32(0.0),
            jnp.ones(n, bool), jnp.full(n, INF, jnp.float32),
            jnp.full(n, -1, jnp.int32), jnp.zeros(n, bool))
    sink, _, min_val, remaining, spc, path, sr = jax.lax.while_loop(
        cond, body, init)
    return sink, min_val, remaining, spc, path, sr


def linear_sum_assignment(cost: jax.Array,
                          use_pallas: Optional[bool] = None) -> jax.Array:
    """Square cost matrix (n, n) float32 -> col4row (n,) int32 giving the
    optimal column for each row. Matches scipy for unique optima (see the
    module-level tie-break note). `use_pallas` overrides the dispatch
    policy per call (None = module USE_PALLAS, None = backend auto).

    On TPU with n <= 128 this dispatches to the single-kernel pallas
    implementation (ops/pallas/hungarian.py) — bit-identical results,
    ~10x faster and seconds instead of minutes of compile time. The XLA
    while_loop lowering below is the portable fallback.

    The cost is stop_gradient'ed: the assignment is a discrete decision
    with no cotangent (the reference runs scipy on a detached tensor,
    tscd_matching.py:903-908), and a pallas_call cannot be linearized
    even for integer outputs — without the stop, TPU training through
    the matcher fails in jax.grad."""
    cost = jax.lax.stop_gradient(cost).astype(jnp.float32)
    n = cost.shape[0]
    policy = USE_PALLAS if use_pallas is None else use_pallas
    if policy is None:
        policy = jax.default_backend() == "tpu"
    if policy and n <= 128:
        from .pallas.hungarian import linear_sum_assignment_pallas
        return linear_sum_assignment_pallas(cost)

    def insert_row(carry, cur_row):
        u, v, row4col, col4row = carry
        sink, min_val, remaining, spc, path, sr = _augmenting_path_step(
            cost, u, v, row4col, cur_row)
        # dual updates
        u = u.at[cur_row].add(min_val)
        other = sr & (jnp.arange(n) != cur_row)
        u = u + jnp.where(other, min_val - spc[jnp.clip(col4row, 0, n - 1)], 0.0)
        visited_col = ~remaining
        v = v - jnp.where(visited_col, min_val - spc, 0.0)

        # augment along predecessor path
        def aug_cond(s):
            _, _, j, done = s
            return ~done

        def aug_body(s):
            row4col_, col4row_, j, _ = s
            i = path[j]
            row4col_ = row4col_.at[j].set(i)
            next_j = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            return (row4col_, col4row_, jnp.maximum(next_j, 0), i == cur_row)

        row4col, col4row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (row4col, col4row, sink, False))
        return (u, v, row4col, col4row), None

    init = (jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
            jnp.full(n, -1, jnp.int32), jnp.full(n, -1, jnp.int32))
    (u, v, row4col, col4row), _ = jax.lax.scan(
        insert_row, init, jnp.arange(n, dtype=jnp.int32))
    return col4row


def masked_linear_sum_assignment(cost: jax.Array, row_valid: jax.Array,
                                 col_valid: jax.Array,
                                 big: float = 1e4) -> jax.Array:
    """Assignment where invalid rows/cols are steered to match each other:
    valid-valid pairs keep their cost, valid-invalid pairs cost `big`,
    invalid-invalid pairs cost 0. Returns col4row (n,)."""
    vv = row_valid[:, None] & col_valid[None, :]
    ii = (~row_valid[:, None]) & (~col_valid[None, :])
    cost = jnp.where(vv, cost, jnp.where(ii, 0.0, big))
    return linear_sum_assignment(cost)
