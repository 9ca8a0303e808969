"""Convert a reference PyTorch checkpoint (.pth) to this framework's
msgpack format (reference 2-stage recipe: init TSCD from a YOLOX ckpt).

Usage: python tools/convert_weights.py in.pth out.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("torch->flax weight converter")
    p.add_argument("src", help="torch .pth checkpoint")
    p.add_argument("dst", help="output .msgpack path")
    args = p.parse_args()

    from tscd_tpu.train.checkpoint import save_checkpoint
    from tscd_tpu.utils.convert import load_torch_checkpoint, torch_to_flax

    sd = load_torch_checkpoint(args.src)
    variables = torch_to_flax(sd)
    out_dir = os.path.dirname(os.path.abspath(args.dst)) or "."
    name = os.path.splitext(os.path.basename(args.dst))[0]
    if name.endswith("_ckpt"):
        name = name[:-5]
    path = save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, out_dir, name=name)
    os.replace(path, args.dst) if path != args.dst else None
    print(f"converted {len(sd)} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
