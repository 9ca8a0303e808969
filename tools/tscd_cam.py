"""Feature-map CAM heatmap dump (reference: tools/tscd_cam.py:13 +
yolox/utils/feature_visualization.py): overlays the channel-mean FPN
activation as a JET heatmap on the input image."""

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def feature_to_cam(feat: np.ndarray, out_hw) -> np.ndarray:
    """(H, W, C) feature -> uint8 JET heatmap at out_hw."""
    act = np.mean(np.maximum(feat, 0), axis=-1)
    act = (act - act.min()) / max(act.max() - act.min(), 1e-9)
    act = cv2.resize((act * 255).astype(np.uint8),
                     (out_hw[1], out_hw[0]))
    return cv2.applyColorMap(act, cv2.COLORMAP_JET)


def main():
    import jax
    import jax.numpy as jnp

    from tscd_tpu.data.transforms import letterbox
    from tscd_tpu.models.pafpn import YOLOPAFPN
    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    p = argparse.ArgumentParser("tscd_cam")
    p.add_argument("-f", "--exp_file", type=str,
                   default="exps/TSCD_VID/vid_tscd_large.py")
    p.add_argument("-c", "--ckpt", type=str, default=None)
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./cam_out")
    p.add_argument("opts", nargs="*")
    args = p.parse_args()

    exp = get_exp(args.exp_file)
    exp.merge(args.opts)
    H, W = exp.test_size

    backbone = YOLOPAFPN(exp.depth, exp.width)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = backbone.init(jax.random.PRNGKey(0), x0, False)
    if args.ckpt:
        restored = load_checkpoint(args.ckpt)
        params = restored.get("params", restored)
        params = params.get("backbone", params)
        variables = {
            "params": load_tolerant(variables["params"], params),
            "batch_stats": load_tolerant(
                variables.get("batch_stats", {}),
                restored.get("batch_stats", {}).get(
                    "backbone", restored.get("batch_stats", {})))}

    img = cv2.imread(args.path)
    padded, r = letterbox(img, (H, W))
    feats = jax.jit(lambda v, x: backbone.apply(v, x, False))(
        variables, jnp.asarray(padded[None]))
    os.makedirs(args.output_dir, exist_ok=True)
    for lvl, f in zip(("p3", "p4", "p5"), feats):
        cam = feature_to_cam(np.asarray(f[0], np.float32), img.shape[:2])
        overlay = cv2.addWeighted(img, 0.5, cam, 0.5, 0)
        out = os.path.join(args.output_dir,
                           f"cam_{lvl}_" + os.path.basename(args.path))
        cv2.imwrite(out, overlay)
        print("wrote", out)


if __name__ == "__main__":
    main()
