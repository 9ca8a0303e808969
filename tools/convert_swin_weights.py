"""Convert official Swin Transformer torch checkpoints to this
framework's flax layout (reference: tools/convert_swin_weights.py).

Usage: python tools/convert_swin_weights.py swin_tiny.pth out.msgpack
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def translate_swin(sd):
    """torch swin state_dict -> flax param paths of
    tscd_tpu.models.swin.SwinTransformer."""
    from flax import traverse_util
    params = {}
    for name, val in sd.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        p = name.split(".")
        if p[0] == "patch_embed":
            if p[1] == "proj":
                key = ("patch_embed",
                       "kernel" if p[-1] == "weight" else "bias")
                if p[-1] == "weight":
                    arr = arr.transpose(2, 3, 1, 0)
            else:
                key = ("patch_norm",
                       "scale" if p[-1] == "weight" else "bias")
            params[key] = arr
            continue
        if p[0].startswith("norm") and p[0][4:].isdigit():
            # per-out-index feature norms (reference swin_transfomer.py:
            # 557-560 add_module(f'norm{i}')) -> our out_norm{i}; dropping
            # them would serve pretrained Swins with fresh-init out-norms
            params[(f"out_norm{p[0][4:]}",
                    "scale" if p[-1] == "weight" else "bias")] = arr
            continue
        if p[0] != "layers":
            continue
        stage = int(p[1])
        if p[2] == "blocks":
            blk = int(p[3])
            base = (f"layer{stage}_block{blk}",)
            rest = p[4:]
            if rest[0] in ("norm1", "norm2"):
                key = base + (rest[0],
                              "scale" if rest[-1] == "weight" else "bias")
            elif rest[0] == "attn":
                if rest[1] == "relative_position_bias_table":
                    key = base + ("attn",
                                  "relative_position_bias_table")
                elif rest[1] == "relative_position_index":
                    continue
                else:
                    key = base + ("attn", rest[1],
                                  "kernel" if rest[-1] == "weight"
                                  else "bias")
                    if rest[-1] == "weight":
                        arr = arr.T
            elif rest[0] == "mlp":
                fc = "mlp_fc1" if rest[1] == "fc1" else "mlp_fc2"
                key = base + (fc,
                              "kernel" if rest[-1] == "weight" else "bias")
                if rest[-1] == "weight":
                    arr = arr.T
            else:
                continue
        elif p[2] == "downsample":
            base = (f"merge{stage}",)
            if p[3] == "norm":
                key = base + ("norm",
                              "scale" if p[-1] == "weight" else "bias")
            else:
                key = base + ("reduction", "kernel")
                arr = arr.T
        else:
            continue
        params[key] = arr
    return traverse_util.unflatten_dict(params)


def main():
    p = argparse.ArgumentParser("swin weight converter")
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()
    import torch

    from tscd_tpu.train.checkpoint import save_checkpoint
    ckpt = torch.load(args.src, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    params = translate_swin({k: v.cpu().numpy() for k, v in sd.items()})
    out_dir = os.path.dirname(os.path.abspath(args.dst)) or "."
    name = os.path.splitext(os.path.basename(args.dst))[0]
    path = save_checkpoint({"params": params}, out_dir, name=name)
    if path != args.dst:  # save_checkpoint appends _ckpt; honor dst
        os.replace(path, args.dst)
        path = args.dst
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
