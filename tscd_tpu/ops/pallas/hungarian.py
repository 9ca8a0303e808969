"""Pallas TPU kernel: Jonker-Volgenant linear sum assignment.

The XLA lowering of the JV shortest-augmenting-path solver
(tscd_tpu/ops/hungarian.py) is ~2500 sequential tiny HLO ops (outer scan
over n rows x inner Dijkstra while_loop), which costs several ms per
50x50 matrix on TPU purely in per-op overhead — it sat at ~25% of the
whole TSCD eval step (tools/profile_eval.py) — and minutes of XLA
compile time. This kernel runs the identical algorithm inside ONE
pallas_call: the cost matrix and all solver state live in VMEM/registers
as (1, 128) lane vectors, dynamic scalar reads become masked lane
reductions, and the (n, n) gather in the dual update becomes a one-hot
compare + row reduction. Same argmin tie-breaking as the XLA version
(first minimum), so results are bit-identical.

Capacity: n <= 128 (proposal counts P are 30-50; DETR queries <= 128).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30  # finite "infinity": keeps inf-inf NaNs out of the recursion
N = 128     # lane width; one vector register row per state array


def _at(vec: jax.Array, idx: jax.Array, lane: jax.Array) -> jax.Array:
    """Dynamic scalar read vec[0, idx] as a masked lane reduction."""
    return jnp.sum(jnp.where(lane == idx, vec, 0.0))


def _at_i32(vec: jax.Array, idx: jax.Array, lane: jax.Array) -> jax.Array:
    return jnp.sum(jnp.where(lane == idx, vec, 0))


def _kernel(cost_ref, out_ref, *, n: int):
    f32 = jnp.float32
    i32 = jnp.int32
    lane = jax.lax.broadcasted_iota(i32, (1, N), 1)
    valid = lane < n

    def insert_row(cur_row, carry):
        u, v, row4col, col4row = carry

        # --- Dijkstra to the nearest unassigned column ------------------
        def dcond(s):
            sink = s[0]
            return sink < 0

        # sr / remaining are int32 0/1 masks: Mosaic cannot materialize
        # bool (i1) vector selects
        def dbody(s):
            _, i, min_val, remaining, spc, path, sr = s
            sr = jnp.where(lane == i, 1, sr)
            cost_i = cost_ref[pl.ds(i, 1), :].astype(f32)        # (1, N)
            u_i = _at(u, i, lane)
            r = min_val + cost_i - u_i - v
            better = (r < spc) & (remaining == 1)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(remaining == 1, spc, BIG)
            j = jnp.argmin(masked).astype(i32)   # flat == lane index
            min_val = _at(masked, j, lane)
            remaining = jnp.where(lane == j, 0, remaining)
            next_i = _at_i32(row4col, j, lane)
            sink = jnp.where(next_i < 0, j, -1).astype(i32)
            return (sink, jnp.maximum(next_i, 0), min_val, remaining,
                    spc, path, sr)

        d0 = (jnp.int32(-1), cur_row, f32(0.0), valid.astype(i32),
              jnp.full((1, N), BIG, f32), jnp.full((1, N), -1, i32),
              jnp.zeros((1, N), i32))
        sink, _, min_val, remaining, spc, path, sr = jax.lax.while_loop(
            dcond, dbody, d0)

        # --- dual updates ------------------------------------------------
        u = jnp.where(lane == cur_row, u + min_val, u)
        # spc[col4row] via one-hot compare + row reduce: (N, N) bools
        c4r_col = col4row.reshape(N, 1)
        gathered = jnp.sum(
            jnp.where(c4r_col == lane, spc, 0.0), axis=1).reshape(1, N)
        other = (sr == 1) & (lane != cur_row)
        u = u + jnp.where(other, min_val - gathered, 0.0)
        v = v - jnp.where(valid & (remaining == 0), min_val - spc, 0.0)

        # --- augment along the predecessor path -------------------------
        def acond(s):
            return ~s[3]

        def abody(s):
            r4c, c4r, j, _ = s
            i = _at_i32(path, j, lane)
            r4c = jnp.where(lane == j, i, r4c)
            next_j = _at_i32(c4r, i, lane)
            c4r = jnp.where(lane == i, j, c4r)
            return (r4c, c4r, jnp.maximum(next_j, 0), i == cur_row)

        row4col, col4row, _, _ = jax.lax.while_loop(
            acond, abody, (row4col, col4row, sink, jnp.bool_(False)))
        return (u, v, row4col, col4row)

    init = (jnp.zeros((1, N), f32), jnp.zeros((1, N), f32),
            jnp.full((1, N), -1, i32), jnp.full((1, N), -1, i32))
    _, _, _, col4row = jax.lax.fori_loop(0, n, insert_row, init)
    out_ref[:] = jnp.broadcast_to(col4row, (8, N))


@functools.partial(jax.jit, static_argnames=("interpret",))
def linear_sum_assignment_pallas(cost: jax.Array,
                                 interpret: bool = False) -> jax.Array:
    """Square (n, n) f32 cost, n <= 128 -> col4row (n,) int32. Matches
    ops/hungarian.linear_sum_assignment (same algorithm and tie-breaks)."""
    n = cost.shape[0]
    assert cost.shape == (n, n) and n <= N, cost.shape
    padded = jnp.zeros((N, N), jnp.float32).at[:n, :n].set(
        cost.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
    return out[0, :n]
