"""Backbone roofline profile: per-stage ms + FLOPs + MXU% on the real TPU.

Times cumulative cuts of CSPDarknet-L (+ PAFPN) at the TSCD-Large eval
shape (F x 576 x 576). Each cut is its own jitted program; XLA dead-code
eliminates the stages after the last requested `out_features` entry, so
the diffs attribute time per stage. FLOPs come from XLA cost analysis of
the same compiled programs, so MXU% = flops / time / peak is exact for
what actually ran.

Usage: python tools/profile_backbone.py [--f 32] [--iters 5] [--cast-bf16]
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

V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=32)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cast-bf16", action="store_true")
    args = ap.parse_args()

    from tscd_tpu.models.darknet import CSPDarknet
    from tscd_tpu.models.pafpn import YOLOPAFPN

    F, H, W = args.f, args.size, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))

    def bench(model, apply_kwargs=None):
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
        if args.cast_bf16:
            variables = {
                "params": jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16), variables["params"]),
                "batch_stats": variables["batch_stats"],
            }
        fn = jax.jit(lambda v, x: model.apply(v, x, **(apply_kwargs or {})))
        lowered = fn.lower(variables, x).compile()
        ca = lowered.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        bytes_ = float(ca.get("bytes accessed", float("nan")))
        r = fn(variables, x)
        force(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(variables, x)
        force(r)
        ms = (time.perf_counter() - t0) * 1000.0 / args.iters
        return ms, flops, bytes_

    stages = ["stem", "dark2", "dark3", "dark4", "dark5"]
    rows = []
    prev_ms, prev_fl = 0.0, 0.0
    for i, st in enumerate(stages):
        m = CSPDarknet(1.0, 1.0, out_features=(st,), dtype=jnp.bfloat16)
        ms, fl, by = bench(m)
        rows.append({
            "cut": st, "cum_ms": round(ms, 2),
            "stage_ms": round(ms - prev_ms, 2),
            "stage_gflops": round((fl - prev_fl) / 1e9, 1),
            "stage_mxu_pct": round(
                (fl - prev_fl) / max(ms - prev_ms, 1e-9) / 1e-3
                / V5E_BF16_PEAK * 100, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
        prev_ms, prev_fl = ms, fl

    m = YOLOPAFPN(1.0, 1.0, dtype=jnp.bfloat16)
    ms, fl, by = bench(m)
    rows.append({
        "cut": "pafpn(full)", "cum_ms": round(ms, 2),
        "stage_ms": round(ms - prev_ms, 2),
        "stage_gflops": round((fl - prev_fl) / 1e9, 1),
        "stage_mxu_pct": round(
            (fl - prev_fl) / max(ms - prev_ms, 1e-9) / 1e-3
            / V5E_BF16_PEAK * 100, 1),
    })
    print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({
        "total_ms": round(ms, 2),
        "total_gflops": round(fl / 1e9, 1),
        "total_mxu_pct": round(fl / ms / 1e-3 / V5E_BF16_PEAK * 100, 1),
        "bytes_gb": round(by / 1e9, 2),
        "cast_bf16": args.cast_bf16, "frames": F,
    }))


if __name__ == "__main__":
    main()
