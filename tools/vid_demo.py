"""YOLOV/YOLOV++ streaming video demo (reference: tools/vid_demo.py
and vid_demo_wpost.py — same flow as tscd_demo with the YOLOV heads;
--post adds REPP).

Reads a video file (or image dir), chunks frames into (lframe_val +
gframe_val) windows mirroring photo_to_sequence, streams them through the
jitted TSCD eval step with carried matcher state (resume=chunk_id != 0),
draws refined detections, writes video/images. Optional --post runs
REPP tubelet post-processing offline.
"""

import argparse
import os
import random
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def make_parser():
    parser = argparse.ArgumentParser("TSCD-TPU demo")
    parser.add_argument("-f", "--exp_file", type=str,
                        default="exps/yolov/yolov_l.py")
    parser.add_argument("-c", "--ckpt", type=str, required=True)
    parser.add_argument("--path", type=str, required=True,
                        help="video file or image directory")
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--nms", type=float, default=None,
                        help="final-NMS IoU threshold (exp.nmsthre; "
                        "video default 0.5)")
    parser.add_argument("--output_dir", type=str, default="./demo_out")
    parser.add_argument("--post", action="store_true",
                        help="REPP tubelet post-processing")
    parser.add_argument("--save_result", action="store_true", default=True)
    parser.add_argument("--int8", action="store_true",
                        help="w8a8 int8 serving mode (dynamic "
                        "activation scales; models/blocks.py int8_eval)")
    parser.add_argument("--int8-calib", type=int, default=0, metavar="K",
                        help="with --int8: calibrate STATIC activation "
                        "scales on the video's first K windows and serve "
                        "with them (the measured serving default, "
                        "PROFILE.md §int8); 0 = dynamic scales")
    parser.add_argument("opts", nargs="*")
    return parser


def read_frames(path):
    if os.path.isdir(path):
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if os.path.splitext(f)[1].lower() in
                       (".jpg", ".jpeg", ".png", ".bmp"))
        for f in files:
            yield cv2.imread(f)
    else:
        cap = cv2.VideoCapture(path)
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            yield frame


def main():
    import jax
    import jax.numpy as jnp

    from tscd_tpu.data.transforms import letterbox
    from tscd_tpu.data.vid import VID_CLASSES
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant
    from tscd_tpu.utils.visualize import vis

    args = make_parser().parse_args()
    if args.int8_calib:
        args.int8 = True
    if args.int8 and not args.int8_calib:
        from tscd_tpu.models.blocks import set_int8_eval
        set_int8_eval(True)  # dynamic scales: sticky mode is enough
    exp = get_exp(args.exp_file)
    exp.merge(args.opts)
    if args.nms is not None:  # reaches yolov_eval_postprocess via the
        exp.nmsthre = args.nms  # trainer's eval fn (was silently ignored)
    L, G = exp.lframe_val, exp.gframe_val
    F = L + G
    H, W = exp.test_size

    frames = [f for f in read_frames(args.path) if f is not None]
    assert frames, f"no frames found at {args.path}"
    print(f"{len(frames)} frames")
    processed = []
    ratios = []
    for f in frames:
        p, r = letterbox(f, (H, W))
        processed.append(p)
        ratios.append(r)
    processed = np.stack(processed)

    trainer = exp.get_trainer(args)
    variables = trainer._init_variables(
        jnp.asarray(processed[:F]),
        jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32),
        L, G)
    restored = load_checkpoint(args.ckpt)
    variables = {
        "params": load_tolerant(variables["params"],
                                restored.get("params", restored)),
        "batch_stats": load_tolerant(variables.get("batch_stats", {}),
                                     restored.get("batch_stats", {}))}

    import contextlib
    int8_ctx = contextlib.nullcontext()
    if args.int8_calib:
        # static PTQ on the stream's own first K windows (built like the
        # serving loop's below, from a cloned rng so the loop's global
        # sampling is unchanged), folded through one scan program
        # (models/blocks.py quantize_int8_scan; same contract as
        # tscd_demo --int8-calib with the YOLOV forward signatures)
        from tscd_tpu.models.blocks import int8_eval, quantize_int8_scan
        from tscd_tpu.models.yolov import YOLOV

        crng = random.Random(42)
        xs, ts = [], []
        step = max(L, 1) if L else G
        for lo in range(0, len(frames), step):
            if len(xs) >= args.int8_calib:
                break
            if L == 0:
                li = list(range(lo, min(lo + G, len(frames))))
                li += [li[-1]] * (G - len(li))
                idxs = li
            else:
                li = list(range(lo, min(lo + L, len(frames))))
                while len(li) < L:
                    li.append(li[-1])
                pool = [i for i in range(len(frames))
                        if i not in li] or li
                idxs = li + [crng.choice(pool) for _ in range(G)]
            xs.append(processed[idxs].astype(np.float32))
            ts.append(get_timing_signal_1d(
                np.asarray(idxs, np.float32), 256))
        if isinstance(trainer.model, YOLOV):
            apply_q = lambda v, xa, ta: trainer.model.apply(
                v, xa, L, G, False, mutable=["quant"])
        else:
            apply_q = lambda v, xa, ta: trainer.model.apply(
                v, xa, L, G, ta, False, mutable=["quant"])
        variables = quantize_int8_scan(
            apply_q, variables, jnp.asarray(np.stack(xs)),
            jnp.asarray(np.stack(ts), jnp.float32))
        int8_ctx = int8_eval(static=True)
        print(f"int8: calibrated static scales on {len(xs)} windows")

    predict = trainer.make_predict_fn(variables, L, G)
    rng = random.Random(42)

    # chunk into windows (mirrors photo_to_sequence / tscd_demo.py:212-252)
    all_dets = [None] * len(frames)
    state = None
    t0 = time.time()
    with int8_ctx:  # static int8: the predict trace happens here
        if L == 0:
            # pure-gframe (YOLOV gmode) exps: consecutive G-sized chunks,
            # predictions consumed for EVERY frame of the chunk (reference
            # tools/vid_demo.py:199-210); the tail chunk pads with the last
            # frame like the reference pads local windows
            n_chunks = (len(frames) + G - 1) // G
            for ci in range(n_chunks):
                idxs = list(range(ci * G, min((ci + 1) * G, len(frames))))
                padded_idx = idxs + [idxs[-1]] * (G - len(idxs))
                imgs = processed[padded_idx]
                te = get_timing_signal_1d(
                    np.asarray(padded_idx, np.float32), 256)
                dets, state = predict(imgs, te, ci != 0, state)
                for k, fi in enumerate(idxs):
                    if all_dets[fi] is None:
                        all_dets[fi] = dets[k]
        else:
            n_chunks = max(len(frames) // L, 1)
            for ci in range(n_chunks):
                lo = ci * L
                local_idx = list(range(lo, min(lo + L, len(frames))))
                while len(local_idx) < L:
                    local_idx.append(local_idx[-1])
                pool = [i for i in range(len(frames))
                        if i not in local_idx] or local_idx
                global_idx = [rng.choice(pool) for _ in range(G)]
                idxs = local_idx + global_idx
                imgs = processed[idxs]
                te = get_timing_signal_1d(np.asarray(idxs, np.float32),
                                          256)
                dets, state = predict(imgs, te, ci != 0, state)
                for k, fi in enumerate(local_idx[:L]):
                    if fi < len(frames) and all_dets[fi] is None:
                        all_dets[fi] = dets[k]
    dt = time.time() - t0
    print(f"inference: {1000 * dt / len(frames):.1f} ms/frame "
          f"({len(frames) / dt:.1f} fps)")
    print(f"frames with predictions: "
          f"{sum(d is not None for d in all_dets)}/{len(frames)}")

    if args.post:
        from tscd_tpu.postprocess.repp import REPP
        repp = REPP(min_tubelet_score=args.conf * 0.5,
                    min_pred_score=0.01)
        all_dets = repp.process_video_dets(all_dets)

    os.makedirs(args.output_dir, exist_ok=True)
    writer = cv2.VideoWriter(
        os.path.join(args.output_dir, "tscd_out.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 25,
        (frames[0].shape[1], frames[0].shape[0]))
    names = VID_CLASSES[:exp.num_classes]
    for fi, f in enumerate(frames):
        d = all_dets[fi]
        if d is not None and len(d):
            boxes = d[:, :4] / ratios[fi]
            scores = d[:, 4] * d[:, 5]
            out = vis(f, boxes, scores, d[:, 6], args.conf, names)
        else:
            out = f
        writer.write(out)
    writer.release()
    print(f"wrote {os.path.join(args.output_dir, 'tscd_out.mp4')}")


if __name__ == "__main__":
    main()
