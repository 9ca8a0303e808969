"""Stem probes round 5 (VERDICT r4 next #4): the two untried levers on
the 13.6 ms Focus-stem wall (PROFILE.md §stem).

(a) int8 stem: the serving int8 path gates convs at C_in>=128, so the
    stem (C_in=12 fused form) has never run under the int8 emitter.
    Pixels are integers in [0,255], so activation quantization can be
    EXACT (x-128 fits int8; the shift folds into a per-channel bias via
    conv(x+c) = conv(x) + c*sum(w)); only weights are lossy (per-cout
    symmetric). Measures the XLA int8 conv emitter vs the bf16 one on
    the same fused 6x6-stride-2 stem.

(b) cross-window overlap: dispatch stem-of-window-N+1 and a heavy
    MXU-bound proxy tail of window N back-to-back without a sync.
    A single TensorCore executes programs serially, so the expectation
    is NO overlap — measured to close the question.

Methodology: in-program scan amortization (10 stem applications per
program with an iteration-dependent input so XLA cannot hoist) — the
standalone-microbench ~1.5 ms dispatch floor divides by 10.

Usage: python tools/probe_stem_int8.py [--frames 32] [--size 576]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser("probe_stem_int8")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--cout", type=int, default=64)   # TSCD-L stem width
    ap.add_argument("--iters", type=int, default=10)  # scan length
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    import jax.numpy as jnp
    import numpy as np

    F, S, O, N = args.frames, args.size, args.cout, args.iters
    k = 3
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 256, (F, S, S, 3)), jnp.float32)
    w6 = jnp.asarray(rng.normal(0, 0.1, (2 * k, 2 * k, 3, O)),
                     jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (O,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.1, (O,)), jnp.float32)
    pad = k - 1
    dims = dict(window_strides=(2, 2), padding=[(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bf16_stem(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w6.astype(jnp.bfloat16), **dims)
        y = y.astype(jnp.float32) * scale + shift
        return jax.nn.silu(y).astype(jnp.bfloat16)

    # int8: exact input quantization (integer pixels, shifted by -128),
    # per-cout symmetric weights
    s_w = jnp.maximum(jnp.max(jnp.abs(w6), axis=(0, 1, 2)), 1e-8) / 127.0
    wq = jnp.round(w6 / s_w).astype(jnp.int8)
    sum_w = jnp.sum(jnp.round(w6 / s_w), axis=(0, 1, 2))  # per cout

    def int8_stem(x):
        xq = (x - 128.0).astype(jnp.int8)   # exact for 0..255 ints
        y = jax.lax.conv_general_dilated(
            xq, wq, preferred_element_type=jnp.int32, **dims)
        y = (y.astype(jnp.float32) + 128.0 * sum_w) * s_w
        y = y * scale + shift
        return jax.nn.silu(y).astype(jnp.bfloat16)

    def scanner(stem):
        @jax.jit
        def run(x):
            def body(carry, i):
                xi = x + i.astype(jnp.float32)  # defeat hoisting
                y = stem(xi)
                return carry + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(N))
            return acc

        return run

    def time_it(fn, x):
        r = fn(x)
        float(r)                              # compile + sync
        best = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = fn(x)
            float(r)
            best.append((time.perf_counter() - t0) / N * 1e3)
        return min(best)

    res = {"shape": f"F={F} {S}px cout={O} fused 6x6 s2"}
    res["bf16_stem_ms"] = round(time_it(scanner(bf16_stem), x0), 3)
    res["int8_stem_ms"] = round(time_it(scanner(int8_stem), x0), 3)

    # numeric sanity of the int8 formulation (weights-only loss)
    yb = np.asarray(bf16_stem(x0[:1]), np.float32)
    yi = np.asarray(int8_stem(x0[:1]), np.float32)
    res["int8_max_delta"] = round(float(np.abs(yb - yi).max()), 4)

    # (b) cross-window overlap: stem(N+1) dispatched behind a heavy
    # MXU-bound tail(N); serial-sync vs async-chained
    M = 8192
    a = jnp.asarray(rng.normal(size=(M, M)), jnp.bfloat16)

    @jax.jit
    def tail(m):
        return jnp.sum((m @ m).astype(jnp.float32))

    @jax.jit
    def stem_once(x):
        return jnp.sum(bf16_stem(x).astype(jnp.float32))

    float(tail(a)); float(stem_once(x0))      # compile
    t0 = time.perf_counter()
    for _ in range(args.reps):
        float(tail(a))                        # sync each
        float(stem_once(x0))
    serial = (time.perf_counter() - t0) / args.reps * 1e3
    t0 = time.perf_counter()
    for _ in range(args.reps):
        r1 = tail(a)                          # no sync between
        r2 = stem_once(x0)
        float(r1); float(r2)
    chained = (time.perf_counter() - t0) / args.reps * 1e3
    res["overlap_serial_ms"] = round(serial, 2)
    res["overlap_chained_ms"] = round(chained, 2)
    res["overlap_saving_ms"] = round(serial - chained, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
