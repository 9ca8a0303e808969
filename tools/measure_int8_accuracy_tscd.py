"""int8 (w8a8) serving accuracy on a TRAINED TSCD **video** model at
production width (VERDICT r4 next #3).

tools/measure_int8_accuracy_width.py pinned the still-image YOLOX-L
numbers (fp 0.9304 / static drop 0.004); the video-model evidence was a
loose <=0.1 CI ceiling on a 0.125-width toy. This tool runs the same
protocol on the TSCD model itself:

  1. build a synthetic ILSVRC-VID task whose classes hinge on a small
     gray-level margin (the thing per-tensor activation quantization
     blurs first) with objects MOVING across frames, so the matcher /
     temporal stack is exercised, not just the backbone;
  2. train TSCD at --width/--depth (default 1.0/1.0) through the real
     TSCDTrainer;
  3. evaluate the SAME weights fp32 / int8-dynamic / int8-static
     (quantize_int8_scan calibration at the eval window, exactly the
     tools/tscd_eval.py --int8-calib path) and report the mAP deltas.

Numbers recorded in PROFILE.md §int8 (video row).

Usage: python tools/measure_int8_accuracy_tscd.py [--epochs 40]
           [--width 1.0] [--depth 1.0] [--size 256] [--workdir DIR]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# first four VID synsets (tscd_tpu/data/vid.py:47) = classes 0..3
_SYNSETS = ["n02691156", "n02419796", "n02131653", "n02834778"]


def make_vid_dataset(root, n_videos=16, n_frames=16, size=256):
    """{square, tall} x {gray 118, gray 142} on a textured background,
    drifting linearly across the video — classification hinges on a
    24-level intensity margin; localization must track motion."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(11)
    videos = []
    for v in range(n_videos):
        cls = int(rng.integers(0, 4))
        tall = cls % 2
        gray = 118 if cls < 2 else 142
        w = int(rng.integers(size // 6, size // 4))
        h = int(w * (1.9 if tall else 1.0))
        span = max(6, size - h - 5 - 2 * n_frames)
        x = float(rng.integers(5, max(6, size - w - 5 - 2 * n_frames)))
        y = float(rng.integers(5, span))
        dx, dy = rng.uniform(0.5, 2.0, 2)
        rel_frames = []
        for f in range(n_frames):
            rel = f"Data/VID/val/vid{v}/{f:06d}.JPEG"
            path = os.path.join(root, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            img = rng.integers(60, 100, (size, size, 3)).astype(np.uint8)
            x0, y0 = int(x + dx * f), int(y + dy * f)
            cv2.rectangle(img, (x0, y0), (x0 + w, y0 + h),
                          (gray, gray, gray), -1)
            cv2.imwrite(path, img)
            xml_rel = rel.replace("Data", "Annotations").replace(
                "JPEG", "xml")
            xml_path = os.path.join(root, xml_rel)
            os.makedirs(os.path.dirname(xml_path), exist_ok=True)
            with open(xml_path, "w") as fh:
                fh.write(f"""<annotation>
  <size><width>{size}</width><height>{size}</height></size>
  <object><name>{_SYNSETS[cls]}</name>
    <bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>
            <xmax>{x0 + w}</xmax><ymax>{y0 + h}</ymax></bndbox>
  </object>
</annotation>""")
            rel_frames.append(rel)
        videos.append(rel_frames)
    np.save(os.path.join(root, "train_seq.npy"),
            np.asarray(videos, object), allow_pickle=True)
    np.save(os.path.join(root, "val_seq.npy"),
            np.asarray(videos, object), allow_pickle=True)
    return root


def make_still_dataset(root, n_imgs=96, size=256):
    """COCO-layout still dataset from the SAME class scheme as
    make_vid_dataset, for the reference's stage-1 fine-tune
    (README.md:88). Categories 1..4 = VID classes 0..3."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(23)
    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_imgs):
        img = rng.integers(60, 100, (size, size, 3)).astype(np.uint8)
        for _ in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(0, 4))
            tall = cls % 2
            gray = 118 if cls < 2 else 142
            w = int(rng.integers(size // 6, size // 4))
            h = int(w * (1.9 if tall else 1.0))
            x0 = int(rng.integers(0, max(1, size - w)))
            y0 = int(rng.integers(0, max(1, size - h)))
            cv2.rectangle(img, (x0, y0), (x0 + w, y0 + h),
                          (gray, gray, gray), -1)
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cls + 1,
                "bbox": [x0, y0, min(w, size - x0), min(h, size - y0)],
                "area": w * h, "iscrowd": 0})
            ann_id += 1
        fn = f"{i:012d}.jpg"
        cv2.imwrite(os.path.join(root, "train2017", fn), img)
        images.append({"id": i, "file_name": fn, "width": size,
                       "height": size})
    import json as _json
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "instances_train2017.json"),
              "w") as f:
        _json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": c + 1, "name": f"c{c}"}
                           for c in range(4)]}, f)
    return root


def run_two_stage(args, work, root):
    """The reference 2-stage recipe (README.md:88-150) through the real
    CLIs via tools/run_vid_workflow.py --int8-eval, at --width/--depth.
    Adds an int8-DYNAMIC eval of the stage-2 checkpoint on top."""
    import subprocess

    tools = os.path.dirname(os.path.abspath(__file__))
    coco_root = make_still_dataset(os.path.join(work, "coco"),
                                   size=args.size)
    out_dir = os.path.join(work, "out")
    yolox_exp = os.path.join(work, "exp_stage1.py")
    with open(yolox_exp, "w") as f:
        f.write(f"""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = {args.depth!r}, {args.width!r}
        self.num_classes = 30
        self.input_size = self.test_size = ({args.size}, {args.size})
        self.batch_size = 8
        self.max_epoch = {args.stage1_epochs}
        self.no_aug_epochs = {args.stage1_epochs * 2 // 3}
        self.eval_interval = 100000
        self.basic_lr_per_img = 0.10 / 64
        self.warmup_epochs = 5
        self.data_dir = {coco_root!r}
        self.train_name = self.val_name = "train2017"
        self.output_dir = {out_dir!r}
        self.exp_name = "int8_tscd_stage1"
        self.enable_mixup = False
        self.mosaic_prob = 0.0
        self.flip_prob = 0.0
        self.ckpt_interval = 1000   # final-epoch save only (650 MB/ckpt)
        self.seed = 0
""")
    tscd_exp = os.path.join(work, "exp_stage2.py")
    with open(tscd_exp, "w") as f:
        f.write(f"""
import os
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = {args.depth!r}, {args.width!r}
        self.num_classes = 30
        self.minimal_limit = 20
        self.heads = 4
        self.lframe, self.gframe = 1, {args.gframe}
        self.lframe_val, self.gframe_val = 1, {args.gframe}
        self.input_size = self.test_size = ({args.size}, {args.size})
        self.max_epoch = {args.epochs}
        self.eval_interval = 100000
        self.data_dir = {root!r}
        self.train_seq_path = os.path.join({root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {out_dir!r}
        self.exp_name = "int8_tscd_stage2"
        self.ckpt_interval = 1000   # final-epoch save only
        self.seed = 0
""")
    import json as _json
    r = subprocess.run(
        [sys.executable, os.path.join(tools, "run_vid_workflow.py"),
         "--yolox-exp", yolox_exp, "--tscd-exp", tscd_exp,
         "--workdir", os.path.join(work, "wf"),
         "--int8-eval", str(args.calib_windows)],
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:], file=sys.stderr)
        print(r.stderr[-3000:], file=sys.stderr)
        sys.exit(1)
    summary = _json.loads(r.stdout.strip().splitlines()[-1])

    # int8-DYNAMIC eval of the same stage-2 checkpoint for the 3-way
    # comparison the single-stage mode reports
    r2 = subprocess.run(
        [sys.executable, os.path.join(tools, "tscd_eval.py"), "-f",
         tscd_exp, "-c", summary["stage2_ckpt"], "--int8"],
        capture_output=True, text=True)
    dyn = None
    if r2.returncode == 0:
        try:
            dyn = float(r2.stdout.strip().splitlines()[-1].split()[0])
        except (ValueError, IndexError):
            pass
    res = {
        "model": f"tscd d{args.depth} w{args.width} @{args.size}px "
                 f"F={args.gframe + 1} two-stage (default C_in gates)",
        "fp": {"mAP": summary["rough_mAP"],
               "AP50": summary["rough_AP50"]},
        "int8_static": {"mAP": summary["int8_mAP"],
                        "AP50": summary["int8_AP50"]},
        "drop_static": summary["int8_mAP_drop"],
    }
    if dyn is not None:
        res["int8_dynamic"] = {"mAP": dyn}
        res["drop_dynamic"] = round(summary["rough_mAP"] - dyn, 4)
    print(_json.dumps(res))


def main():
    ap = argparse.ArgumentParser("measure_int8_accuracy_tscd")
    ap.add_argument("--two-stage", action="store_true",
                    help="the reference recipe: stage-1 still fine-tune "
                         "-> frozen-backbone stage-2 (README.md:88-150) "
                         "via tools/run_vid_workflow.py — gives a much "
                         "stronger fp base than from-scratch")
    ap.add_argument("--stage1-epochs", type=int, default=120)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--depth", type=float, default=1.0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--videos", type=int, default=16)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--gframe", type=int, default=7)
    ap.add_argument("--calib-windows", type=int, default=4)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    import jax.numpy as jnp
    import numpy as np

    from tscd_tpu.exp import get_exp
    from tscd_tpu.models.blocks import int8_eval, quantize_int8_scan
    from tscd_tpu.models.matching import init_matcher_state

    work = args.workdir or tempfile.mkdtemp(prefix="int8_tscd_")
    root = make_vid_dataset(os.path.join(work, "vid"), args.videos,
                            args.frames, args.size)
    if args.two_stage:
        return run_two_stage(args, work, root)
    exp_file = os.path.join(work, "exp_int8_tscd.py")
    with open(exp_file, "w") as f:
        f.write(f"""
import os
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = {args.depth!r}, {args.width!r}
        self.num_classes = 30
        self.minimal_limit = 20
        self.heads = 4
        self.lframe, self.gframe = 1, {args.gframe}
        self.lframe_val, self.gframe_val = 1, {args.gframe}
        self.input_size = self.test_size = ({args.size}, {args.size})
        self.max_epoch = {args.epochs}
        self.eval_interval = 100000
        self.basic_lr_per_img = 0.02 / 64
        self.warmup_epochs = 2
        self.no_aug_epochs = {args.epochs}
        self.data_dir = {root!r}
        self.train_seq_path = os.path.join({root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {os.path.join(work, 'out')!r}
        self.exp_name = "int8_tscd"
        # full from-scratch training: the stage-2 recipe freezes a
        # (normally pretrained) backbone; here there is none to freeze
        self.fix_bn = False
        self.stop_backbone_grad = False
        self.seed = 0
    def freeze_prefixes(self):
        return ()
    def stem_lr_prefixes(self):
        return ()
""")
    exp = get_exp(exp_file)
    trainer = exp.get_trainer(None)
    # a width-1.0 checkpoint save per epoch would dominate wall time
    trainer.save_ckpt = lambda *a, **k: None
    state = trainer.train()
    variables = {"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats}

    loader = exp.get_eval_loader()
    evaluator = exp.get_evaluator(loader)
    Lv, Gv = exp.lframe_val, exp.gframe_val

    def ap_of(res):
        return {"mAP": round(float(res["mAP"]), 4),
                "AP50": round(float(res["AP50"]), 4)}

    res = {"model": f"tscd d{args.depth} w{args.width} "
                    f"@{args.size}px F={Lv + Gv} (default C_in gates)"}
    res["fp"] = ap_of(evaluator.evaluate(
        trainer.make_predict_fn(variables, Lv, Gv)))

    with int8_eval():
        res["int8_dynamic"] = ap_of(evaluator.evaluate(
            trainer.make_predict_fn(variables, Lv, Gv)))

    # static calibration at the serving window (tscd_eval --int8-calib)
    xs, ts = [], []
    for b in loader:
        xs.append(b["imgs"][:Lv + Gv])
        ts.append(b["time_embedding"][:Lv + Gv])
        if len(xs) >= args.calib_windows:
            break
    P = exp.minimal_limit
    hidden = int(256 * exp.width)
    st0 = init_matcher_state(P, hidden, 4 * hidden,
                             dtype=getattr(trainer.model, "dtype",
                                           jnp.float32))
    vq = quantize_int8_scan(
        lambda v, xa, ta: trainer.model.apply(
            v, xa, ta, Lv, Gv, False, st0, mutable=["quant"]),
        variables,
        jnp.asarray(np.stack(xs).astype(np.float32)),
        jnp.asarray(np.stack(ts).astype(np.float32)))
    with int8_eval(static=True):
        res["int8_static"] = ap_of(evaluator.evaluate(
            trainer.make_predict_fn(vq, Lv, Gv)))

    res["drop_dynamic"] = round(res["fp"]["mAP"]
                                - res["int8_dynamic"]["mAP"], 4)
    res["drop_static"] = round(res["fp"]["mAP"]
                               - res["int8_static"]["mAP"], 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
