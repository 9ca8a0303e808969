"""Run a video model over the val set and pickle per-frame REPP-format
predictions (reference: tools/val_to_imdb.py — Predictor.to_repp:166:
normalized bbox centers + C-dim score vectors x obj conf).

Output: pickle of {video_name: {frame_name: [det, ...]}} with det =
{"image_id", "bbox" [x,y,w,h] px, "bbox_center" normalized,
 "scores" (C,)}. Feed to tools/REPP.py.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def make_parser():
    p = argparse.ArgumentParser("val_to_imdb")
    p.add_argument("-f", "--exp_file", type=str,
                   default="exps/TSCD_VID/vid_tscd_large.py")
    p.add_argument("-c", "--ckpt", type=str, required=True)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--tnum", type=int, default=-1)
    p.add_argument("--output", type=str, default="val_imdb.pkl")
    p.add_argument("opts", nargs="*")
    return p


def main():
    import jax.numpy as jnp

    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    args = make_parser().parse_args()
    exp = get_exp(args.exp_file)
    exp.merge(args.opts)
    if args.dataset:
        exp.dataset_name = args.dataset
    exp.tnum = args.tnum

    loader = exp.get_eval_loader()
    trainer = exp.get_trainer(args)
    first = next(iter(loader))
    F = exp.lframe_val + exp.gframe_val
    variables = trainer._init_variables(
        jnp.asarray(first["imgs"][:F]),
        jnp.asarray(first["time_embedding"][:F]), exp.lframe_val,
        exp.gframe_val)
    restored = load_checkpoint(args.ckpt)
    variables = {
        "params": load_tolerant(variables["params"],
                                restored.get("params", restored)),
        "batch_stats": load_tolerant(variables.get("batch_stats", {}),
                                     restored.get("batch_stats", {}))}
    predict = trainer.make_predict_fn(variables, exp.lframe_val,
                                      exp.gframe_val)

    H, W = exp.test_size
    C = exp.num_classes
    out = {}
    state = None
    for batch in loader:
        # resume = continuation of the same video: first local frame
        # index != 0 (vid_evaluator_v2.py:255-258)
        stem = os.path.basename(batch["paths"][0])
        digits = "".join(c for c in os.path.splitext(stem)[0]
                         .split("_")[-1] if c.isdigit())
        resume = bool(digits) and int(digits) != 0
        dets_frames, state = predict(batch["imgs"],
                                     batch["time_embedding"], resume,
                                     state)
        for fidx, dets in enumerate(dets_frames):
            path = batch["paths"][fidx]
            video = os.path.dirname(path) or "video0"
            img_h, img_w = batch["infos"][fidx]
            scale = min(H / img_h, W / img_w)
            frame_dets = []
            for row in dets:
                x1, y1, x2, y2, obj, score, cls = row[:7]
                scores = np.zeros(C, np.float32)
                scores[int(cls)] = obj * score
                bw, bh = (x2 - x1) / scale, (y2 - y1) / scale
                bx, by = x1 / scale, y1 / scale
                frame_dets.append({
                    "image_id": path,
                    "bbox": [float(bx), float(by), float(bw), float(bh)],
                    "bbox_center": [float((bx + bw / 2) / img_w),
                                    float((by + bh / 2) / img_h)],
                    "scores": scores,
                })
            out.setdefault(video, {})[os.path.basename(path)] = frame_dets
    with open(args.output, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {args.output}: {len(out)} videos")


if __name__ == "__main__":
    main()
