"""Streaming online YOLOV demo (reference: tools/yolov_demo_online.py
:214-234 — per-frame inference with rolling feature banks).

The bank here is the device-resident OnlineBank ring buffer carried
between jitted calls (no host-side feature lists)."""

import argparse
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def make_parser():
    p = argparse.ArgumentParser("YOLOV online demo")
    p.add_argument("-f", "--exp_file", type=str,
                   default="exps/yolov/yolov_l.py")
    p.add_argument("-c", "--ckpt", type=str, required=True)
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--bank_frames", type=int, default=31)
    p.add_argument("--output_dir", type=str, default="./demo_out")
    p.add_argument("opts", nargs="*")
    return p


def main():
    import jax
    import jax.numpy as jnp

    from tscd_tpu.data.transforms import letterbox
    from tscd_tpu.data.vid import VID_CLASSES
    from tscd_tpu.models.yolov import YOLOVOnline, yolov_eval_postprocess
    from tscd_tpu.models.yolov_heads import init_online_bank
    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant
    from tscd_tpu.utils.visualize import vis
    from tools.tscd_demo import read_frames

    args = make_parser().parse_args()
    exp = get_exp(args.exp_file)
    exp.merge(args.opts)
    H, W = exp.test_size
    P = exp.minimal_limit
    hidden = int(256 * exp.width)

    model = YOLOVOnline(num_classes=exp.num_classes, depth=exp.depth,
                        width=exp.width, num_proposals=P, heads=exp.heads,
                        sim_thresh=exp.sim_thresh)
    bank0 = init_online_bank(args.bank_frames * P, hidden)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, bank0)
    restored = load_checkpoint(args.ckpt)
    variables = {
        "params": load_tolerant(variables["params"],
                                restored.get("params", restored)),
        "batch_stats": load_tolerant(variables.get("batch_stats", {}),
                                     restored.get("batch_stats", {}))}

    @jax.jit
    def step(variables, x, bank):
        out = model.apply(variables, x, bank)
        refined, original = yolov_eval_postprocess(out, 1, exp.num_classes)
        # first two frames: no bank yet -> plain still-image result
        # (yolov_msa_online.py:281-283)
        sel = jax.tree_util.tree_map(
            lambda a, b: jnp.where(out["use_refined"], a, b),
            refined, original)
        return sel, out["bank"]

    os.makedirs(args.output_dir, exist_ok=True)
    writer = None
    bank = bank0
    names = VID_CLASSES[:exp.num_classes]
    t0 = time.time()
    n = 0
    for frame in read_frames(args.path):
        if frame is None:
            continue
        padded, r = letterbox(frame, (H, W))
        refined, bank = step(variables, jnp.asarray(padded[None]), bank)
        refined = jax.tree_util.tree_map(np.asarray, refined)
        m = refined.mask[0]
        boxes = refined.boxes[0][m] / r
        scores = (refined.obj[0] * refined.score[0])[m]
        out = vis(frame, boxes, scores, refined.cls_id[0][m], args.conf,
                  names)
        if writer is None:
            writer = cv2.VideoWriter(
                os.path.join(args.output_dir, "online_out.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), 25,
                (out.shape[1], out.shape[0]))
        writer.write(out)
        n += 1
    if writer:
        writer.release()
    dt = time.time() - t0
    print(f"{n} frames, {n / max(dt, 1e-9):.1f} fps (incl. IO)")


if __name__ == "__main__":
    main()
