"""Does chaining eval windows INSIDE one program beat per-window dispatch?

The streaming evaluator issues one jitted call per (lframe+gframe)
window, carrying the matcher state between calls (the reference's
per-sequence-batch loop, yolox/evaluators/vid_evaluator_v2.py:240-275).
Dispatches pipeline through the axon tunnel, but each program still
pays per-dispatch overhead (command submission, output aliasing).
This tool measures the alternative: `lax.scan` over K device-resident
windows inside ONE program — the carry is exactly the matcher state the
python loop already threads, so the semantics are identical by
construction.

Reports ms/window for both formulations in the SAME process (same HBM
layout, same session) so the difference is attributable.

Usage: python tools/profile_chain.py [--k 8] [--f 32] [--iters 3]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8, help="windows per chain")
    ap.add_argument("--f", type=int, default=32, help="frames per window")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--iters", type=int, default=3,
                    help="timed repetitions of the whole K-window pass")
    args = ap.parse_args()

    from tscd_tpu.models.matching import init_matcher_state
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    K, F, H, W = args.k, args.f, args.size, args.size
    L, G = 1, F - 1
    P = 50
    model = TSCD(num_classes=30, depth=1.0, width=1.0, num_proposals=P,
                 heads=4, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(0, 255, (K, F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), xs[0], te, L, G))()
    state0 = init_matcher_state(P, 256, 1024, dtype=jnp.bfloat16)

    def window(v, x, st):
        out = model.apply(v, x, te, L, G, False, st)
        return (out["refined_boxes"], out["refined_cls_logits"],
                out["matcher_obj_logits"], out["matcher_state"])

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))

    # --- formulation A: one dispatch per window (the product path) ---
    fwd = jax.jit(window)
    r = fwd(variables, xs[0], state0)
    force(r)
    loop_ms = []
    for _ in range(args.iters):
        st = state0
        t0 = time.perf_counter()
        for i in range(K):
            r = fwd(variables, xs[i], st)
            st = r[-1]
        force(r)
        loop_ms.append((time.perf_counter() - t0) * 1000.0 / K)

    # --- formulation B: lax.scan over the K windows in ONE program ---
    @jax.jit
    def chain(v, xs, st):
        def body(st, x):
            b, c, o, st = window(v, x, st)
            return st, (b, c, o)
        st, outs = jax.lax.scan(body, st, xs)
        return outs, st

    r = chain(variables, xs, state0)
    force(r)
    chain_ms = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        r = chain(variables, xs, state0)
        force(r)
        chain_ms.append((time.perf_counter() - t0) * 1000.0 / K)

    loop, chained = min(loop_ms), min(chain_ms)
    print(json.dumps({
        "k": K, "frames": F, "size": args.size,
        "per_dispatch_ms_per_window": round(loop, 2),
        "scan_chain_ms_per_window": round(chained, 2),
        "delta_ms": round(loop - chained, 2),
        "loop_fps": round(F / (loop / 1000.0), 1),
        "chain_fps": round(F / (chained / 1000.0), 1),
        "all_loop_ms": [round(m, 2) for m in loop_ms],
        "all_chain_ms": [round(m, 2) for m in chain_ms],
    }))


if __name__ == "__main__":
    main()
