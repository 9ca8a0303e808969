"""Model-zoo throughput on one TPU chip: YOLOX-L, YOLOV++-L, TSCD-L,
each at bf16 and int8 (w8a8, dynamic scales). One JSON line per row.

Reference anchors (docs/model_zoo.md): YOLOX-L = 14.5 ms/img V100 fp16
(69 fps); the video models have no published fps (YOLOX-L is an upper
bound on both since they add the video stack on top of it).

Usage: python tools/bench_zoo.py [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
import jax.numpy as jnp
import numpy as np

YOLOX_L_V100_FPS = 69.0


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32).ravel()[:1]))


def bench_fn(fn, args, frames, iters):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return frames * iters / (time.perf_counter() - t0)


def _bench_yolox(rng, report, iters, int8_eval):
    from tscd_tpu.models.yolox import YOLOX
    B, S = 16, 640
    m = YOLOX(num_classes=80, depth=1.0, width=1.0, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    f = jax.jit(lambda v, x: m.apply(v, x, False, True)["decoded"])
    fps = bench_fn(f, (v, x), B, iters)
    with int8_eval():
        f8 = jax.jit(lambda v, x: m.apply(v, x, False, True)["decoded"])
        fps8 = bench_fn(f8, (v, x), B, iters)
    report("YOLOX-L", S, fps, fps8)


def _bench_yolov(rng, report, iters, int8_eval):
    from tscd_tpu.models.yolov import YOLOVPlus
    F, S = 32, 576
    m = YOLOVPlus(num_classes=30, depth=1.0, width=1.0,
                  num_proposals=30, heads=4, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 255, (F, S, S, 3)), jnp.float32)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, 0, F))()
    f = jax.jit(lambda v, x: m.apply(v, x, 0, F)["refined_cls_logits"])
    fps = bench_fn(f, (v, x), F, iters)
    with int8_eval():
        f8 = jax.jit(
            lambda v, x: m.apply(v, x, 0, F)["refined_cls_logits"])
        fps8 = bench_fn(f8, (v, x), F, iters)
    report("YOLOV++-L", S, fps, fps8)


def _bench_tscd(rng, report, iters, int8_eval):
    # same program shape as bench.py's fwd so the compile cache hits
    from tscd_tpu.models.matching import init_matcher_state
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d
    L, G, S = 1, 31, 576
    F = L + G
    m = TSCD(num_classes=30, depth=1.0, width=1.0, num_proposals=50,
             heads=4, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 255, (F, S, S, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256),
                     jnp.float32)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, te, L, G))()
    st = init_matcher_state(50, 256, 1024, dtype=jnp.bfloat16)

    def mk():
        return jax.jit(lambda v, x, te, st: (
            lambda o: (o["refined_boxes"], o["refined_cls_logits"],
                       o["matcher_obj_logits"], o["matcher_state"]))(
            m.apply(v, x, te, L, G, False, st)))

    fps = bench_fn(mk(), (v, x, te, st), F, iters)
    with int8_eval():
        fps8 = bench_fn(mk(), (v, x, te, st), F, iters)
    report("TSCD-L", S, fps, fps8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--models", type=str, default="yolox,yolov,tscd",
                    help="comma list: yolox,yolov,tscd")
    args = ap.parse_args()
    which = set(args.models.split(","))

    from tscd_tpu.models.blocks import int8_eval

    rng = np.random.default_rng(0)
    rows = []

    def report(name, px, fps_bf16, fps_int8):
        row = {"model": name, "px": px,
               "bf16_fps": round(fps_bf16, 1),
               "int8_fps": round(fps_int8, 1),
               "vs_yolox_l_v100": round(fps_bf16 / YOLOX_L_V100_FPS, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if "yolox" in which:
        _bench_yolox(rng, report, args.iters, int8_eval)
    if "yolov" in which:
        _bench_yolov(rng, report, args.iters, int8_eval)
    if "tscd" in which:
        _bench_tscd(rng, report, args.iters, int8_eval)

    print(json.dumps({"zoo": rows}))


if __name__ == "__main__":
    main()
