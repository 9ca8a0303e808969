"""End-to-end eval throughput WITH real host IO in the loop.

bench.py times the jitted forward on resident arrays (the reference's
accounting, vid_evaluator_v2.py:429-439, also excludes data loading).
This tool closes the loop the reference never measured: synthetic 720p
JPEG frames on disk -> WindowLoader (threaded decode + letterbox,
double-buffered) -> async device upload -> streaming TSCD eval with
pipelined dispatch/materialize. Reports end-to-end fps alongside
forward-only fps; the gap is un-hidden host time.

Usage: python tools/bench_eval_io.py [--videos 4] [--frames 96]
         [--size 576] [--depth 1.0] [--width 1.0]
"""

import argparse
import json
import os
import shutil
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
import jax.numpy as jnp
import numpy as np


def make_frames(root, n_videos, n_frames, hw=(720, 1280)):
    import cv2
    rng = np.random.default_rng(0)
    vids = []
    for v in range(n_videos):
        frames = []
        base = rng.integers(0, 200, (hw[0] // 8, hw[1] // 8, 3),
                            np.uint8)
        for f in range(n_frames):
            img = cv2.resize(base, (hw[1], hw[0]),
                             interpolation=cv2.INTER_LINEAR)
            noise = rng.integers(0, 40, img.shape, np.uint8)
            img = cv2.add(img, noise)
            path = os.path.join(root, f"v{v}_{f:06d}.jpg")
            cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            frames.append(path)
        vids.append(frames)
    return vids


class FrameSet:
    """Minimal dataset shim for collate_window: letterboxed frames."""

    def __init__(self, img_size):
        self.img_size = img_size

    def load_frame(self, path):
        import cv2
        img = cv2.imread(path)
        r = min(self.img_size[0] / img.shape[0],
                self.img_size[1] / img.shape[1])
        img = cv2.resize(img, (int(img.shape[1] * r),
                               int(img.shape[0] * r)),
                         interpolation=cv2.INTER_LINEAR)
        return img.astype(np.float32), np.zeros((0, 5), np.float32), \
            (img.shape[0], img.shape[1], r, path)

    def frame_index(self, path):
        return int(os.path.basename(path).split("_")[1].split(".")[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--depth", type=float, default=1.0)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--lframe", type=int, default=1)
    ap.add_argument("--gframe", type=int, default=31)
    ap.add_argument("--transport", choices=["fp32", "bf16", "uint8"],
                    default="bf16",
                    help="host->device dtype; bf16 halves upload bytes "
                    "and matches the compute dtype (no extra loss); "
                    "uint8 quarters them and is BIT-EXACT vs fp32 "
                    "(letterboxed pixels are integers; the backbone "
                    "casts on-chip)")
    args = ap.parse_args()

    from tscd_tpu.data.vid import collate_window
    from tscd_tpu.models.matching import init_matcher_state
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    L, G = args.lframe, args.gframe
    F = L + G
    H = W = args.size
    P = 50

    root = tempfile.mkdtemp(prefix="tscd_io_bench_")
    try:
        t0 = time.time()
        vids = make_frames(root, args.videos, args.frames)
        print(f"# synthesized {args.videos}x{args.frames} 720p jpegs "
              f"in {time.time() - t0:.1f}s", flush=True)

        model = TSCD(num_classes=30, depth=args.depth, width=args.width,
                     num_proposals=P, heads=4, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
        te0 = jnp.asarray(get_timing_signal_1d(np.arange(F), 256),
                          jnp.float32)
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), x0, te0, L, G))()
        hidden = int(256 * args.width)
        st0 = init_matcher_state(P, hidden, 4 * hidden,
                                 dtype=jnp.bfloat16)

        tdt = {"bf16": jnp.bfloat16, "fp32": jnp.float32,
               "uint8": jnp.uint8}[args.transport]

        @jax.jit
        def fwd(variables, x, te, st):
            out = model.apply(variables, x, te, L, G, False, st)
            return (out["refined_boxes"], out["refined_cls_logits"],
                    out["matcher_obj_logits"], out["matcher_state"])

        def force(r):
            return float(jnp.sum(r[0].astype(jnp.float32)))

        r = fwd(variables, x0.astype(tdt), te0, st0)   # compile
        force(r)

        ds = FrameSet((H, W))

        # windows: per video, chop into (L local + G random global)
        # windows like photo_to_sequence's gl mode
        windows = []
        for frames in vids:
            for i in range(0, len(frames) - L + 1, L):
                loc = frames[i:i + L]
                glob = list(np.random.default_rng(i).choice(
                    frames, G, replace=True))
                windows.append(loc + glob)

        def loader():
            # mirrors WindowLoader: one background thread, threaded
            # per-frame decode inside collate_window
            import queue
            import threading
            q = queue.Queue(maxsize=2)
            stop = object()

            def work():
                try:
                    for wpaths in windows:
                        q.put(collate_window(ds, wpaths))
                finally:
                    q.put(stop)

            threading.Thread(target=work, daemon=True).start()
            while True:
                item = q.get()
                if item is stop:
                    return
                yield item

        # warm loader + timing; upload is accounted separately (on the
        # axon dev tunnel host->device runs at ~40 MB/s and dominates —
        # a real TPU-VM host feeds over PCIe at GB/s)
        n_frames_done = 0
        fwd_time = 0.0
        upload_time = 0.0
        st = st0
        pending = None
        t_start = time.perf_counter()
        for batch in loader():
            t1 = time.perf_counter()
            x = jax.device_put(batch["imgs"].astype(tdt))
            # (uint8 path: raw bytes over the wire; cast happens in
            # YOLOPAFPN.__call__ on device)
            te = jax.device_put(batch["time_embedding"].astype(
                np.float32))
            upload_time += time.perf_counter() - t1
            t1 = time.perf_counter()
            r = fwd(variables, x, te, st)      # async dispatch
            st = r[-1]
            if pending is not None:
                force(pending)                  # materialize previous
            pending = r
            fwd_time += time.perf_counter() - t1
            n_frames_done += F
        if pending is not None:
            t1 = time.perf_counter()
            force(pending)
            fwd_time += time.perf_counter() - t1
        wall = time.perf_counter() - t_start

        print(json.dumps({
            "metric": "tscd_eval_io_fps",
            "end_to_end_fps": round(n_frames_done / wall, 2),
            "forward_only_fps": round(n_frames_done / fwd_time, 2),
            "upload_s": round(upload_time, 2),
            "transport": args.transport,
            "windows": len(windows), "frames": n_frames_done,
            "wall_s": round(wall, 2),
            "decode_workers": os.environ.get("TSCD_DECODE_WORKERS", "8"),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
