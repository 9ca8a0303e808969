"""Decompose the banded-stem lowering's cost on the real TPU.

Times (as separate jitted programs, scalar-readback sync):
  1. full banded stem
  2. lhs build only (sum-reduced so the build fuses into a reduction)
  3. the big dot alone on a pre-materialized lhs
  4. dot + epilogue on pre-materialized lhs
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
import jax.numpy as jnp
import numpy as np

from tscd_tpu.ops import banded_stem as bs


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32).ravel()[:1]))


def timeit(fn, *args, iters=5):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) * 1000 / iters


def main():
    B, H, W = 32, 576, 576
    out_ch = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, out_ch)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, out_ch), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.5, out_ch), jnp.float32)

    H2, W2 = H // 2, W // 2
    TJ, LANES = bs.TJ, bs.LANES
    nj = W2 // TJ
    n = TJ * out_ch

    full = jax.jit(lambda x: bs.focus_stem_banded(x, w3, scale, shift,
                                                  jnp.bfloat16))
    print("full_banded_ms", timeit(full, x))

    def build_lhs(x):
        lane_pad = 6 * TJ * (nj - 1) + LANES - (W * 3 + 6)
        xp = x.astype(jnp.bfloat16).reshape(B, H, W * 3)
        xp = jnp.pad(xp, ((0, 0), (2, 2), (6, max(lane_pad, 0))))
        LW = xp.shape[-1]
        hp = (H + 4) // 2
        pairs = xp.reshape(B, hp, 2 * LW)
        ev, od = pairs[:, :, :LW], pairs[:, :, LW:]
        planes = [(ev if ky % 2 == 0 else od)[:, ky // 2: ky // 2 + H2]
                  for ky in range(6)]
        lhs = jnp.stack(
            [jnp.stack([p[:, :, 6 * TJ * j: 6 * TJ * j + LANES]
                        for j in range(nj)], axis=2)
             for p in planes], axis=3)
        return lhs.reshape(B, H2, nj, 6 * LANES)

    build_sum = jax.jit(lambda x: jnp.sum(build_lhs(x)
                                          .astype(jnp.float32)))
    print("lhs_build_fused_sum_ms", timeit(build_sum, x))

    build_mat = jax.jit(build_lhs)
    print("lhs_build_materialize_ms", timeit(build_mat, x))

    lhs = jax.block_until_ready(build_mat(x))
    wb = jnp.asarray(rng.normal(0, 0.1, (6 * LANES, n)), jnp.bfloat16)

    dot = jax.jit(lambda l, w: jnp.einsum(
        "bhjk,kn->bhjn", l, w, preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16))
    print("dot_only_ms", timeit(dot, lhs, wb))

    sh = jnp.tile(shift, TJ).astype(jnp.float32)

    def dot_epi(l, w):
        y = jnp.einsum("bhjk,kn->bhjn", l, w,
                       preferred_element_type=jnp.float32)
        y = y + sh[None, None, None]
        y = y * jax.nn.sigmoid(y)
        return y.astype(jnp.bfloat16).reshape(B, H2, W2, out_ch)

    print("dot_epilogue_ms", timeit(jax.jit(dot_epi), lhs, wb))

    # flattened-M variant: collapse batch dims before the dot
    def dot_flat(l, w):
        y = jax.lax.dot_general(
            l.reshape(-1, 6 * LANES), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    print("dot_flat_ms", timeit(jax.jit(dot_flat), lhs, wb))


if __name__ == "__main__":
    main()
