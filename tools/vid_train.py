"""TSCD video training CLI (reference: tools/tscd_train.py:102).

Single-program SPMD: no launch()/process groups — multi-chip scaling is a
mesh inside the trainer, multi-host is jax.distributed.initialize.
"""

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def make_parser():
    parser = argparse.ArgumentParser("YOLOV-TPU train")
    parser.add_argument("-expn", "--experiment-name", type=str,
                        default=None)
    parser.add_argument("-n", "--name", type=str, default=None,
                        help="exp name (registry)")
    parser.add_argument("-f", "--exp_file", type=str,
                        default="exps/yolov/yolov_l.py")
    parser.add_argument("-c", "--ckpt", type=str, default=None,
                        help="initial weights (e.g. converted YOLOX ckpt)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("-e", "--start_epoch", type=int, default=None)
    parser.add_argument("--fp16", action="store_true",
                        help="bf16 compute (TPU analogue)")
    parser.add_argument("--mesh-data", type=int, default=None,
                        help="data-parallel mesh axis (windows/step; "
                             "-1 = all devices). Replaces the "
                             "reference's -d/--devices DDP fan-out.")
    parser.add_argument("--mesh-model", type=int, default=None,
                        help="tensor-parallel mesh axis (DP x TP)")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard params/momenta/EMA over the data "
                             "axis (ZeRO-3)")
    parser.add_argument("opts", nargs="*",
                        help="exp attribute overrides: key value ...")
    return parser


def main():
    args = make_parser().parse_args()
    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.mesh_data is not None:
        exp.mesh_data = args.mesh_data
    if args.mesh_model is not None:
        exp.mesh_model = args.mesh_model
    if args.fsdp:
        exp.fsdp = True
    if args.experiment_name:
        exp.exp_name = args.experiment_name
    if exp.seed is not None:
        random.seed(exp.seed)
        np.random.seed(exp.seed)
    trainer = exp.get_trainer(args)
    trainer.train()


if __name__ == "__main__":
    main()
