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
    parser.add_argument("opts", nargs="*")
    return parser


def main():
    import jax
    import numpy as np

    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    args = make_parser().parse_args()
    if args.int8:
        from tscd_tpu.models.blocks import set_int8_eval
        set_int8_eval(True)
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

    first = next(iter(loader))
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

    evaluator = exp.get_evaluator(loader)
    predict = trainer.make_predict_fn(variables, exp.lframe_val,
                                      exp.gframe_val)
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
