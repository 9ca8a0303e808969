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
    p.add_argument("--online-batch", type=int, default=1, metavar="K",
                   help="process up to K frames per device dispatch "
                        "(ONE compiled program: batched backbone + "
                        "in-graph bank scan, YOLOVOnline.window). "
                        "Batch-1 streaming is dispatch-bound (~64 fps "
                        "on the bench rig); K=4 sustains ~267 fps at "
                        "<=K frames of buffering (PROFILE.md §latency)")
    p.add_argument("--max-wait-ms", type=float, default=25.0,
                   help="with --online-batch: flush a partial batch "
                        "once its oldest frame has waited this long "
                        "(live sources; file input always fills K)")
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

    K = max(1, args.online_batch)
    if K > 1:
        from tscd_tpu.models.yolov import YOLOVOnline as _M

        @jax.jit
        def window_step(variables, xs, bank):
            out, bank = model.apply(variables, xs, bank,
                                    method=_M.window)
            refined, original = yolov_eval_postprocess(
                out, K, exp.num_classes)
            sel = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    out["use_refined"].reshape(
                        (-1,) + (1,) * (a.ndim - 1)), a, b),
                refined, original)
            return sel, bank

    os.makedirs(args.output_dir, exist_ok=True)
    writer = None
    bank = bank0
    names = VID_CLASSES[:exp.num_classes]
    t0 = time.time()
    n = 0

    def emit(frame, refined, f, r):
        nonlocal writer, n
        m = refined.mask[f]
        boxes = refined.boxes[f][m] / r
        scores = (refined.obj[f] * refined.score[f])[m]
        out = vis(frame, boxes, scores, refined.cls_id[f][m], args.conf,
                  names)
        if writer is None:
            writer = cv2.VideoWriter(
                os.path.join(args.output_dir, "online_out.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), 25,
                (out.shape[1], out.shape[0]))
        writer.write(out)
        n += 1

    if K == 1:
        for frame in read_frames(args.path):
            if frame is None:
                continue
            padded, r = letterbox(frame, (H, W))
            refined, bank = step(variables, jnp.asarray(padded[None]),
                                 bank)
            refined = jax.tree_util.tree_map(np.asarray, refined)
            emit(frame, refined, 0, r)
    else:
        # latency-budgeted accumulation (utils/batcher.FrameBatcher);
        # partial batches pad to K (one compiled program) and padded
        # results are dropped — but their bank writes must not land, so
        # the pre-pad bank is restored on partial flushes
        from tscd_tpu.utils.batcher import FrameBatcher

        batcher = FrameBatcher(K, args.max_wait_ms)

        def run_batch(items):
            nonlocal bank
            k = len(items)
            xs = np.stack([p for _, p, _ in items])
            if k < K:
                xs = np.concatenate(
                    [xs, np.repeat(xs[-1:], K - k, 0)], 0)
            pre_bank = bank
            refined, bank_new = window_step(variables, jnp.asarray(xs),
                                            pre_bank)
            # a padded (replayed) frame would double-push the bank;
            # re-run the partial frames one by one instead of keeping
            # the polluted bank
            if k == K:
                bank = bank_new
                refined = jax.tree_util.tree_map(np.asarray, refined)
                for f, (frame, _, r) in enumerate(items):
                    emit(frame, refined, f, r)
            else:
                bank = pre_bank
                for frame, padded, r in items:
                    ref1, bank = step(variables,
                                      jnp.asarray(padded[None]), bank)
                    ref1 = jax.tree_util.tree_map(np.asarray, ref1)
                    emit(frame, ref1, 0, r)

        for frame in read_frames(args.path):
            if frame is None:
                continue
            padded, r = letterbox(frame, (H, W))
            full = batcher.push((frame, padded, r))
            if full is None:
                full = batcher.poll()
            if full:
                run_batch(full)
        tail = batcher.flush()
        if tail:
            run_batch(tail)
    if writer:
        writer.release()
    dt = time.time() - t0
    print(f"{n} frames, {n / max(dt, 1e-9):.1f} fps (incl. IO)")


if __name__ == "__main__":
    main()
