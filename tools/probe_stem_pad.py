"""Probe: does channel-padding the stem input past the conv emitter's
MXU threshold beat the C_in=3 fused 6x6 stem?

Round-2 established the Focus stem (fused 6x6 stride-2 conv, C_in=3)
is XLA-emitter-limited at ~1.4% MXU (PROFILE.md §stem): the emitter
refuses the MXU for C_in=3/12 and the vector path wastes 125/128
lanes. The round-2 sweep only tried pad 3->4. This probe sweeps the
untried region: zero-pad the input channel dim to C_pad in {8,16,32,
64} (kernel rows for the padded channels are zero, so the math is
bit-identical mod float reassociation) and measure whether the
emitter flips onto the MXU. FLOPs scale linearly with C_pad while
the utilization gap is ~65x, so any flip below C_pad=64 wins.

Methodology per CLAUDE.md: jitted whole programs, scalar-readback
sync (block_until_ready does not block on axon), relative timing vs
the same-session baseline, cost analysis from the compiled programs.

Usage: python tools/probe_stem_pad.py [--f 32] [--iters 20]
"""

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12


def force(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def bench(fn, args_, iters):
    jfn = jax.jit(fn)
    lowered = jfn.lower(*args_).compile()
    ca = lowered.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    r = jfn(*args_)
    force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(*args_)
    force(r)
    ms = (time.perf_counter() - t0) * 1000.0 / iters
    return ms, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=32)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    F, H, W = args.f, args.size, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    # (2k,2k,C,O) fused-Focus kernel, k=3 -> 6x6, O=64 (TSCD-Large stem)
    w6 = jnp.asarray(rng.normal(0, 0.1, (6, 6, 3, 64)), jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)

    def post(y):
        y = y.astype(jnp.float32) * scale + shift
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    def conv6(xp, wp):
        return jax.lax.conv_general_dilated(
            xp.astype(jnp.bfloat16), wp, window_strides=(2, 2),
            padding=[(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def baseline(x):
        return post(conv6(x, w6))

    ms0, fl0 = bench(baseline, (x,), args.iters)
    print(json.dumps({"form": "baseline_c3", "ms": round(ms0, 2),
                      "gflops": round(fl0 / 1e9, 1),
                      "mxu_pct": round(fl0 / ms0 / 1e-3
                                       / V5E_BF16_PEAK * 100, 1)}),
          flush=True)

    for c_pad in (4, 8, 16, 32, 64):
        wp = jnp.zeros((6, 6, c_pad, 64), jnp.bfloat16).at[:, :, :3].set(w6)

        def padded(x, wp=wp, c_pad=c_pad):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - 3)))
            return post(conv6(xp, wp))

        try:
            ms, fl = bench(padded, (x,), args.iters)
        except Exception as e:  # noqa: BLE001 - probe must report and go on
            print(json.dumps({"form": f"pad_c{c_pad}",
                              "error": repr(e)[:200]}), flush=True)
            continue
        print(json.dumps({"form": f"pad_c{c_pad}", "ms": round(ms, 2),
                          "gflops": round(fl / 1e9, 1),
                          "mxu_pct": round(fl / ms / 1e-3
                                           / V5E_BF16_PEAK * 100, 1),
                          "vs_baseline_ms": round(ms - ms0, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
