"""Still-image COCO evaluation CLI (reference: tools/eval.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def make_parser():
    parser = argparse.ArgumentParser("YOLOX-TPU eval")
    parser.add_argument("-n", "--name", type=str, default=None)
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-c", "--ckpt", type=str, required=True)
    parser.add_argument("-b", "--batch-size", type=int, default=8)
    parser.add_argument("--conf", type=float, default=None)
    parser.add_argument("--nms", type=float, default=None)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--int8", action="store_true",
                        help="w8a8 int8 serving mode (dynamic "
                        "activation scales; models/blocks.py int8_eval)")
    parser.add_argument("opts", nargs="*")
    return parser


def main():
    import jax
    import jax.numpy as jnp

    from tscd_tpu.core.trainer import Trainer
    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    args = make_parser().parse_args()
    if getattr(args, "int8", False):
        from tscd_tpu.models.blocks import set_int8_eval
        set_int8_eval(True)
    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.conf is not None:
        exp.test_conf = args.conf
    if args.nms is not None:
        exp.nmsthre = args.nms
    if args.tsize is not None:
        exp.test_size = (args.tsize, args.tsize)

    trainer = Trainer(exp, args)
    model = trainer.model
    H, W = exp.test_size
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3), jnp.float32), False,
                           False)
    restored = load_checkpoint(args.ckpt)
    variables = {
        "params": load_tolerant(variables["params"],
                                restored.get("params", restored)),
        "batch_stats": load_tolerant(variables.get("batch_stats", {}),
                                     restored.get("batch_stats", {}))}
    evaluator = exp.get_evaluator()
    evaluator.batch_size = args.batch_size
    res = evaluator.evaluate(trainer.make_predict_fn(variables))
    print(res.get("mAP"), res.get("AP50"))


if __name__ == "__main__":
    main()
