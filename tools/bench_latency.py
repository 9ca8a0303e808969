"""Streaming single-frame LATENCY benchmark (one TPU chip).

The fps benches (bench.py, tools/bench_zoo.py) measure windowed
THROUGHPUT — frames/sec over a 32-frame program. A live stream cares
about the other axis: the wall time from one frame arriving to its
detections being ready, with the temporal state (online feature bank)
carried on-device between calls. This is the serving mode of the
reference's streaming demo (/root/reference/tools/yolov_demo_online.py
:214-234 — per-frame inference against rolling feature banks), which
the reference never benchmarks.

Per-frame methodology: each step is forced to completion with a scalar
host readback before the next frame is issued (a real stream cannot
batch ahead), so the number INCLUDES the ~1.5 ms axon-tunnel dispatch
floor — on a non-tunneled TPU VM host the floor is far smaller, so
treat the p50 here as an upper bound. bf16 and (optionally) int8 w8a8
paths share one checkpoint.

Prints one JSON line:
  {"metric": "yolov_online_576_latency_ms", "p50": ..., "p99": ...,
   "fps_serial": ..., "int8": {...}}

Usage: python tools/bench_latency.py [--frames 100] [--size 576]
           [--depth 1.0] [--width 1.0] [--no-int8]
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


def main():
    ap = argparse.ArgumentParser("bench_latency")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--depth", type=float, default=1.0)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--proposals", type=int, default=30)
    ap.add_argument("--bank-frames", type=int, default=31)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--online-batch", type=int, nargs="*", default=[2, 4],
                    help="K values for the batched online-window ladder "
                         "(YOLOVOnline.window; [] disables)")
    args = ap.parse_args()
    # >=2 warmup calls: the first compiles, and timing must start from a
    # bank-carrying steady state (fresh-vs-carried state retrace trap,
    # PROFILE.md §latency); warmup 0 would also leave the post-warmup
    # sync's `sel` unbound.
    args.warmup = max(args.warmup, 2)

    from tscd_tpu.models.yolov import YOLOVOnline, yolov_eval_postprocess
    from tscd_tpu.models.yolov_heads import init_online_bank

    H = W = args.size
    P = args.proposals
    hidden = int(256 * args.width)
    C = 30

    model = YOLOVOnline(num_classes=C, depth=args.depth,
                        width=args.width, num_proposals=P, heads=4,
                        dtype=jnp.bfloat16)
    bank0 = init_online_bank(args.bank_frames * P, hidden)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, bank0))()

    frames = [jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
              for _ in range(8)]

    def make_step():
        @jax.jit
        def step(variables, x, bank):
            out = model.apply(variables, x, bank)
            refined, original = yolov_eval_postprocess(out, 1, C)
            sel = jax.tree_util.tree_map(
                lambda a, b: jnp.where(out["use_refined"], a, b),
                refined, original)
            return sel, out["bank"]

        return step

    def run(step, variables):
        bank = bank0
        # warmup (compile + bank fill past the frames<2 gate)
        for i in range(args.warmup):
            sel, bank = step(variables, frames[i % len(frames)], bank)
        _ = float(jnp.sum(sel.score))  # sync
        lat = []
        for i in range(args.frames):
            t0 = time.perf_counter()
            sel, bank = step(variables, frames[i % len(frames)], bank)
            _ = float(jnp.sum(sel.score))  # per-frame readback barrier
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)
        # pipelined mode: chain the same per-frame steps WITHOUT the
        # per-frame host readback (bank dependency still serializes the
        # device work) and sync once — per-frame device cost with the
        # tunnel round-trip amortized away. This is the streaming rate
        # when the consumer is async/device-side; the serial numbers
        # above are what a strict frame-in->result-out loop pays ON
        # THIS TUNNELED RIG (per-frame RTT dominates them).
        t0 = time.perf_counter()
        for i in range(args.frames):
            sel, bank = step(variables, frames[i % len(frames)], bank)
        _ = float(jnp.sum(sel.score))
        piped = (time.perf_counter() - t0) / args.frames * 1e3
        return {"p50": round(float(np.percentile(lat, 50)), 2),
                "p99": round(float(np.percentile(lat, 99)), 2),
                "mean": round(float(lat.mean()), 2),
                "fps_serial": round(1e3 / float(lat.mean()), 1),
                "pipelined_ms": round(float(piped), 2),
                "fps_pipelined": round(1e3 / piped, 1)}

    res = run(make_step(), variables)

    # --online-batch ladder: K frames per dispatch through ONE compiled
    # program (YOLOVOnline.window — batched backbone + in-graph bank
    # scan), the mode tools/yolov_demo_online.py --online-batch serves.
    # Reported as per-frame fps with the K-frame buffering latency.
    batched = {}
    for K in args.online_batch:
        @jax.jit
        def wstep(variables, xs, bank, K=K):
            out, bank = model.apply(variables, xs, bank,
                                    method=YOLOVOnline.window)
            refined, original = yolov_eval_postprocess(out, K, C)
            sel = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    out["use_refined"].reshape(
                        (-1,) + (1,) * (a.ndim - 1)), a, b),
                refined, original)
            return sel, bank

        xs = jnp.concatenate(frames[:K] * (1 + (K - 1) // len(frames)),
                             0)[:K]
        bank = bank0
        for _ in range(2):
            sel, bank = wstep(variables, xs, bank)
        _ = float(jnp.sum(sel.score))
        n_iters = max(1, args.frames // K)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            sel, bank = wstep(variables, xs, bank)
            _ = float(jnp.sum(sel.score))  # strict per-batch readback
        dt = time.perf_counter() - t0
        per_frame_ms = dt / (n_iters * K) * 1e3
        batched[f"K{K}"] = {
            "per_frame_ms": round(per_frame_ms, 2),
            "fps": round(1e3 / per_frame_ms, 1),
            "batch_latency_ms": round(dt / n_iters * 1e3, 2)}

    int8 = {}
    if not args.no_int8:
        try:
            from tscd_tpu.models.blocks import int8_eval
            with int8_eval():  # dynamic scales: zero-setup serving
                int8 = run(make_step(), variables)
        except Exception as e:  # noqa: BLE001 — report, keep headline
            int8 = {"error": repr(e)}

    print(json.dumps({
        "metric": f"yolov_online_{args.size}_latency_ms",
        **res,
        "online_batch": batched,
        "int8": int8,
        "note": "includes ~1.5 ms tunnel dispatch floor per frame",
    }))


if __name__ == "__main__":
    main()
