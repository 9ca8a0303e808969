"""Convert official Swin Transformer torch checkpoints to this
framework's flax layout (reference: tools/convert_swin_weights.py).

Usage: python tools/convert_swin_weights.py swin_tiny.pth out.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def translate_swin(sd):
    """torch swin state_dict -> flax param paths of
    tscd_tpu.models.swin.SwinTransformer. Thin wrapper over the shared
    converter (tscd_tpu.utils.convert.backbone_to_flax, parity-tested in
    tests/test_torch_parity_backbones.py)."""
    from tscd_tpu.utils.convert import backbone_to_flax
    return backbone_to_flax(sd, "swin")["params"]


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
