"""YOLOV/YOLOV++ video evaluation CLI (reference: tools/vid_eval.py —
same surface as tscd_eval for the YOLOV family).

--tnum N runs only the first N val sequences ("Roughly Evaluation",
reference README.md:151-154); -1 = full eval.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def make_parser():
    parser = argparse.ArgumentParser("YOLOV-TPU eval")
    parser.add_argument("-f", "--exp_file", type=str,
                        default="exps/yolov/yolov_l.py")
    parser.add_argument("-c", "--ckpt", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None,
                        choices=[None, "vid", "ovis"])
    parser.add_argument("--lframe", type=int, default=None)
    parser.add_argument("--gframe", type=int, default=None)
    parser.add_argument("--tnum", type=int, default=-1)
    parser.add_argument("--output", type=str, default=None,
                        help="optional json dump of per-frame predictions")
    parser.add_argument("--int8", action="store_true",
                        help="w8a8 int8 serving mode (dynamic "
                        "activation scales; models/blocks.py int8_eval)")
    parser.add_argument("--int8-calib", type=int, default=0, metavar="K",
                        help="with --int8: calibrate STATIC activation "
                        "scales on the first K val windows "
                        "(quantize_int8_scan) and serve with them — the "
                        "measured serving default (PROFILE.md §int8). "
                        "0 = dynamic scales")
    parser.add_argument("opts", nargs="*")
    return parser


def main():
    import jax
    import numpy as np

    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    args = make_parser().parse_args()
    if args.int8_calib:
        args.int8 = True
    if args.int8 and not args.int8_calib:
        from tscd_tpu.models.blocks import set_int8_eval
        set_int8_eval(True)  # dynamic scales: sticky mode is enough
    exp = get_exp(args.exp_file)
    exp.merge(args.opts)
    if args.dataset:
        exp.dataset_name = args.dataset
    if args.lframe is not None:
        exp.lframe_val = args.lframe
    if args.gframe is not None:
        exp.gframe_val = args.gframe
    exp.tnum = args.tnum

    loader = exp.get_eval_loader()
    trainer = exp.get_trainer(args)
    trainer.val_loader = loader
    model = trainer.model

    loader_it = iter(loader)
    first = next(loader_it)
    import jax.numpy as jnp
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

    import contextlib
    int8_ctx = contextlib.nullcontext()
    if args.int8_calib:
        # static PTQ at the eval shape (same contract as tscd_eval
        # --int8-calib): fold per-layer activation maxima over the first
        # K val windows in ONE chunked-scan program, then trace the eval
        # forward inside int8_eval(static=True). The YOLOV forward takes
        # no time embedding; YOLOV++ takes one (core/yolov_trainer.py
        # _apply_model signatures).
        from tscd_tpu.models.blocks import int8_eval, quantize_int8_scan
        from tscd_tpu.models.yolov import YOLOV

        xs, ts = [first["imgs"][:F]], [first["time_embedding"][:F]]
        for _ in range(args.int8_calib - 1):
            b = next(loader_it, None)
            if b is None:
                break
            xs.append(b["imgs"][:F])
            ts.append(b["time_embedding"][:F])
        if isinstance(model, YOLOV):
            apply_q = lambda v, xa, ta: model.apply(
                v, xa, exp.lframe_val, exp.gframe_val, False,
                mutable=["quant"])
        else:
            apply_q = lambda v, xa, ta: model.apply(
                v, xa, exp.lframe_val, exp.gframe_val, ta, False,
                mutable=["quant"])
        variables = quantize_int8_scan(
            apply_q, variables,
            jnp.asarray(np.stack(xs).astype(np.float32)),
            jnp.asarray(np.stack(ts).astype(np.float32)))
        int8_ctx = int8_eval(static=True)
        print(f"int8: calibrated static scales on {len(xs)} windows")

    evaluator = exp.get_evaluator(loader)
    predict = trainer.make_predict_fn(variables, exp.lframe_val,
                                      exp.gframe_val)
    with int8_ctx:  # static int8: the first predict call traces here
        res = evaluator.evaluate(predict)
    print(res.get("mAP"), res.get("AP50"))
    if args.output:  # the flag existed but was never honored
        import json
        with open(args.output, "w") as f:
            json.dump({k: v for k, v in res.items()
                       if not hasattr(v, "shape")}, f, indent=1)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
