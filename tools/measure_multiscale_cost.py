"""Measure the real cost of multiscale training on TPU: compile time +
steady-state step time of the stage-2 (frozen-backbone, fix_bn) TSCD
train step at every size in the video multiscale set (VERDICT r3 #6 —
"measure the compile-cache cost of the 7-size set and pick the default
with data"; reference default is ON,
/root/reference/exps/TSCD_VID/tscd_base.py:388-392 resizes in 64-px
steps every 10 iters).

Each size is its own XLA program (fixed shapes); the trainer keeps all
of them in its jit cache, so multiscale costs N_sizes compiles ONCE
(cached across runs via the persistent compile cache) and nothing per
step. This tool prints per-size compile seconds + step ms as one JSON
line.

Usage: python tools/measure_multiscale_cost.py [--f 16] [--base 576]
           [--range 3] [--step 64] [--iters 5]

CAUTION (this rig, axon-tunneled v5e): sizes >= 704 at F=16
kernel-fault the TPU worker at first execution (PROFILE.md
§multiscale) and take ~15 min to recover — measure the top sizes last
or pass --range 1/2 to stay in the safe set.
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--f", type=int, default=16)
    ap.add_argument("--base", type=int, default=576)
    ap.add_argument("--range", dest="rng_", type=int, default=3)
    ap.add_argument("--step", type=int, default=64)
    ap.add_argument("--lframe", type=int, default=4)
    ap.add_argument("--depth", type=float, default=1.0)
    ap.add_argument("--width", type=float, default=1.0)
    args = ap.parse_args()

    import optax

    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.train.ema import ema_update
    from tscd_tpu.train.losses import tscd_loss
    from tscd_tpu.train.optim import build_sgd
    from tscd_tpu.train.step import TrainState, init_train_state

    L = args.lframe
    F = args.f
    G = F - L
    strides = (8, 16, 32)
    sizes = [args.base + k * args.step
             for k in range(-args.rng_, args.rng_ + 1)]

    model = TSCD(num_classes=30, depth=args.depth, width=args.width,
                 num_proposals=50, heads=4, dtype=jnp.bfloat16,
                 stop_backbone_grad=True)
    rng = np.random.default_rng(0)

    def make_batch(size):
        x = jnp.asarray(rng.uniform(0, 255, (F, size, size, 3)),
                        jnp.float32)
        te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256),
                         jnp.float32)
        labels_np = np.zeros((F, 40, 5), np.float32)
        for f in range(F):
            for g in range(6):
                wh = rng.uniform(40, min(160, size / 4), 2)
                cxy = rng.uniform(wh / 2, size - wh / 2)
                labels_np[f, g] = [rng.integers(0, 30), *cxy, *wh]
        return x, te, jnp.asarray(labels_np)

    x0, te0, _ = make_batch(args.base)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, te0, L, G))()
    tx = build_sgd(lambda i: 0.01, freeze_prefixes=("backbone",))
    state = init_train_state(variables, tx)

    @jax.jit
    def full_step(state, x, te, labels):
        def loss_fn(p):
            out = model.apply({"params": p,
                               "batch_stats": state.batch_stats},
                              x, te, L, G, False)
            return tscd_loss(out, labels, strides, L)["total_loss"]
        grads = jax.grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        ns = state.step + 1
        return TrainState(
            params=params, batch_stats=state.batch_stats,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, ns),
            ema_batch_stats=state.ema_batch_stats, step=ns)

    def force(st):
        return float(jnp.sum(jax.tree_util.tree_leaves(
            st.params)[0].astype(jnp.float32).ravel()[:1]))

    rows = {}
    for size in sizes:
        x, te, labels = make_batch(size)
        t0 = time.perf_counter()
        ns = full_step(state, x, te, labels)
        force(ns)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            ns = full_step(state, x, te, labels)
        force(ns)
        step_ms = (time.perf_counter() - t0) / args.iters * 1e3
        rows[size] = {"compile_s": round(compile_s, 2),
                      "step_ms": round(step_ms, 2),
                      "fps": round(F / step_ms * 1e3, 2)}
        print(json.dumps({"size": size, **rows[size]}), flush=True)

    total_compile = round(sum(r["compile_s"] for r in rows.values()), 2)
    print(json.dumps({"metric": "multiscale_7size_cost",
                      "sizes": sizes, "rows": rows,
                      "total_compile_s": total_compile}))


if __name__ == "__main__":
    main()
