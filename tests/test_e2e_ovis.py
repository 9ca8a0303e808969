"""End-to-end OVIS workflow through the REAL CLIs on synthetic data
(reference README.md:63-105): VIS-format json -> tools/
ovis_data_division.py (split + per-frame COCO conversion) ->
tools/tscd_train.py with an OVIS exp (OVISVideoDataset + OVISEvaluator)
-> tools/tscd_eval.py --dataset ovis. The VID counterpart lives in
tests/test_e2e_workflow.py; this covers the OVIS dataset plumbing the
VID chain never touches (dataset_name switch, ovis_*_json knobs,
division-tool output consumed as the training annotations).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _make_vis_dataset(root, n_videos=2, n_frames=6, size=(96, 128)):
    """VIS-format json (per-video annotations with per-frame bbox
    lists) + frames on disk under <root>/train/ — the input the
    reference README's step-2 division tool consumes."""
    import cv2

    h, w = size
    videos, annotations = [], []
    ann_id = 1
    for v in range(n_videos):
        file_names = []
        for f in range(n_frames):
            fn = f"v{v}/img_{f:07d}.jpg"
            path = os.path.join(root, "train", fn)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            img = np.full((h, w, 3), 70, np.uint8)
            cv2.rectangle(img, (20 + 2 * f, 15), (70 + 2 * f, 55),
                          (250,) * 3, -1)
            cv2.imwrite(path, img)
            file_names.append(fn)
        videos.append({"id": v + 1, "width": w, "height": h,
                       "file_names": file_names})
        annotations.append({
            "id": ann_id, "video_id": v + 1, "category_id": 3,
            "bboxes": [[20 + 2 * f, 15, 50, 40] for f in range(n_frames)],
            "areas": [2000] * n_frames, "iscrowd": 0})
        ann_id += 1
    vis = {"videos": videos, "annotations": annotations,
           "categories": [{"id": c + 1, "name": f"c{c}"}
                          for c in range(25)]}
    src = os.path.join(root, "vis_train.json")
    with open(src, "w") as f:
        json.dump(vis, f)
    return src


def _run(cmd, timeout=480, env_extra=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable] + cmd, capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=REPO)
    assert r.returncode == 0, (
        f"{os.path.basename(cmd[0])} failed:\n{r.stdout[-1200:]}\n"
        f"{r.stderr[-2000:]}")
    return r


@pytest.mark.slow
def test_ovis_workflow_division_train_eval(tmp_path):
    root = str(tmp_path / "ovis")
    os.makedirs(root)
    src = _make_vis_dataset(root)

    # step 2 of the README: division + VIS->per-frame-COCO conversion
    ann_dir = os.path.join(root, "annotations")
    _run([os.path.join(REPO, "tools", "ovis_data_division.py"),
          "--src", src, "--out_dir", ann_dir, "--valid_ratio", "0.5",
          "--seed", "0"], timeout=120)
    train_json = os.path.join(ann_dir, "annotations_train.json")
    val_json = os.path.join(ann_dir, "annotations_valid.json")
    assert os.path.exists(train_json) and os.path.exists(val_json)

    out_dir = str(tmp_path / "out")
    exp_file = tmp_path / "tiny_ovis_exp.py"
    exp_file.write_text(f"""
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 25
        self.minimal_limit = 8
        self.heads = 2
        self.dataset_name = "ovis"
        self.lframe, self.gframe = 1, 3
        self.lframe_val, self.gframe_val = 1, 3
        self.input_size = self.test_size = (96, 128)
        self.max_epoch = 1
        self.eval_interval = 10
        self.hsv_prob = 0.0
        self.flip_prob = 0.0
        self.data_dir = {root!r}
        self.ovis_train_json = {train_json!r}
        self.ovis_val_json = {val_json!r}
        self.ovis_name = "train"
        self.output_dir = {out_dir!r}
        self.exp_name = "tiny_ovis_e2e"
        self.fix_bn = False
        self.seed = 0
""")
    # stage-2 video training straight on the divided annotations
    _run([os.path.join(REPO, "tools", "tscd_train.py"),
          "-f", str(exp_file)])
    ckpt = os.path.join(out_dir, "tiny_ovis_e2e", "latest_ckpt.msgpack")
    assert os.path.exists(ckpt), "OVIS training wrote no checkpoint"

    # OVIS evaluation path (OVISEvaluator via --dataset ovis)
    out_json = str(tmp_path / "ovis_eval.json")
    _run([os.path.join(REPO, "tools", "tscd_eval.py"),
          "-f", str(exp_file), "-c", ckpt, "--dataset", "ovis",
          "--tnum", "1", "--output", out_json])
    res = json.load(open(out_json))
    assert "mAP" in res and np.isfinite(res["mAP"])
