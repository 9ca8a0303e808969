"""Probe per-executable XLA compiler options through the PJRT tunnel.

PROFILE.md §remaining-headroom records that terminal-side XLA_FLAGS
override client env flags on this rig — but `jax.jit(compiler_options=
...)` rides the compile REQUEST, not the environment, so it may still
reach the compiler. This tool answers two questions:

1. does the backend process compiler_options at all? (an invalid option
   must be rejected — silent acceptance means they are dropped)
2. do candidate options move the TSCD-Large eval step?

Usage:
  python tools/probe_compiler_options.py                 # full probe
  python tools/probe_compiler_options.py --opt xla_tpu_scoped_vmem_limit_kib=98304
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


def build_eval(size=576, frames=32):
    from tscd_tpu.models.matching import init_matcher_state
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    L, G = 1, frames - 1
    model = TSCD(num_classes=30, depth=1.0, width=1.0, num_proposals=50,
                 heads=4, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (frames, size, size, 3)),
                    jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(frames), 256),
                     jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, te, L, G))()
    st = init_matcher_state(50, 256, 1024, dtype=jnp.bfloat16)

    def fwd(variables, x, te, st):
        out = model.apply(variables, x, te, L, G, False, st)
        return (out["refined_boxes"], out["refined_cls_logits"],
                out["matcher_state"])

    return fwd, (variables, x, te, st)


def force(r):
    return float(jnp.sum(r[0].astype(jnp.float32)))


def time_jit(fn, args, opts, iters=10):
    f = jax.jit(fn, compiler_options=opts or None)
    r = f(*args)
    st = r[-1]
    force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args[:-1], st)
        st = r[-1]
    force(r)
    return (time.perf_counter() - t0) * 1000.0 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", action="append", default=[],
                    help="key=value compiler option (repeatable); "
                         "omit to run the built-in candidate sweep")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    # 1) rejection probe: a nonsense option must error if options are
    # actually processed by the compiler
    tiny = jax.jit(lambda a: a @ a,
                   compiler_options={"xla_this_option_does_not_exist": "1"})
    try:
        tiny(jnp.ones((8, 8))).block_until_ready()
        processed = False   # silently accepted -> options are dropped
    except Exception as e:
        processed = True
        print(f"invalid-option probe rejected (GOOD): "
              f"{str(e).splitlines()[0][:160]}")
    print(json.dumps({"compiler_options_processed": bool(processed)}))

    fwd, fargs = build_eval(args.size, args.frames)

    if args.opt:
        sweeps = [dict(kv.split("=", 1) for kv in args.opt)]
    else:
        sweeps = [
            {},  # baseline, same session (first-cut floor comparison)
            {"xla_tpu_scoped_vmem_limit_kib": "98304"},
            {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
        ]
    results = {}
    for opts in sweeps:
        key = ",".join(f"{k}={v}" for k, v in opts.items()) or "baseline"
        try:
            ms = time_jit(fwd, fargs, opts, args.iters)
            results[key] = round(ms, 2)
            print(json.dumps({key: results[key]}))
        except Exception as e:
            results[key] = f"error: {str(e).splitlines()[0][:160]}"
            print(json.dumps({key: results[key]}))
    print(json.dumps({"summary_ms": results}))


if __name__ == "__main__":
    main()
