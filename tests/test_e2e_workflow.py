"""The reference README's full 2-stage workflow, end-to-end through the
REAL CLIs on synthetic data (reference: README.md:88-154): tools/train.py
(stage-1 YOLOX) -> tools/tscd_train.py -c stage1 (stage-2, frozen
backbone + frozen base head) -> tools/tscd_eval.py -> tools/val_to_imdb.py
-> tools/REPP.py [--post] --evaluate (motion mAP).

Two oracles:
  1. the chain produces a sane final mAP and REPP --post does not hurt
     it (README.md:141-144's own regression check), and
  2. a deterministic flicker construction where --post MUST recover mAP
     (tubelet rescoring lifts low-confidence frames above a
     frame-jumping false positive — the failure mode REPP exists for).
"""

import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from test_e2e_still import _make_coco
from test_e2e_train import _make_vid_dataset


def _run(cmd, timeout=1500):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable] + cmd, capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=REPO)
    assert r.returncode == 0, (
        f"{' '.join(cmd)}\n--- stdout ---\n{r.stdout[-3000:]}"
        f"\n--- stderr ---\n{r.stderr[-3000:]}")
    return r.stdout


def _motion(stdout):
    for line in reversed(stdout.strip().splitlines()):
        if "mAP_total" in line:
            return json.loads(re.sub(r"'", '"', line.strip()))
    raise AssertionError(f"no motion mAP in output:\n{stdout[-2000:]}")


def _vid_gts(root, n_videos, n_frames):
    """GT pickle for tools/REPP.py --evaluate, from the same box layout
    _make_vid_dataset draws: (N,5) [x1,y1,x2,y2,cls] per frame in
    original pixel coords; class n02691156 = VID index 0."""
    gts = {}
    for v in range(n_videos):
        video = f"Data/VID/val/vid{v}"
        frames = {}
        for f in range(n_frames):
            x0, y0 = 20 + 2 * f + 10 * v, 15 + f
            frames[f"{f:06d}.JPEG"] = np.asarray(
                [[x0, y0, x0 + 40, y0 + 30, 0]], np.float32)
        gts[video] = frames
    return gts


@pytest.mark.slow
def test_two_stage_workflow_through_clis(tmp_path):
    """README.md:88-154 chain via tools/run_vid_workflow.py."""
    coco_root = _make_coco(str(tmp_path / "coco"), n_categories=30)
    vid_root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=4,
                                 n_frames=8)
    out_dir = str(tmp_path / "out")

    # stage-1 exp: the tiny recipe test_int8_trained.py proved reaches
    # AP50 > 0.85 on this data, at 30 classes to match the VID label
    # space (the reference fine-tunes stage-1 on the video dataset's
    # classes, README.md:86-90, so the base head transfers frozen)
    yolox_exp = tmp_path / "wf_yolox.py"
    yolox_exp.write_text(f"""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.input_size = self.test_size = (96, 128)
        self.batch_size = 8
        self.max_epoch = 150
        self.no_aug_epochs = 100
        self.eval_interval = 1000
        self.basic_lr_per_img = 0.25 / 64
        self.warmup_epochs = 5
        self.data_dir = {coco_root!r}
        self.train_name = self.val_name = "train2017"
        self.output_dir = {out_dir!r}
        self.exp_name = "wf_stage1"
        self.enable_mixup = False
        self.mosaic_prob = 0.0
        self.flip_prob = 0.0
        self.seed = 0
""")
    tscd_exp = tmp_path / "wf_tscd.py"
    tscd_exp.write_text(f"""
import os
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.heads = 2
        self.lframe, self.gframe = 1, 3
        self.lframe_val, self.gframe_val = 1, 3
        self.input_size = self.test_size = (96, 128)
        self.max_epoch = 10
        self.eval_interval = 1000
        self.data_dir = {vid_root!r}
        self.train_seq_path = os.path.join({vid_root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({vid_root!r}, "val_seq.npy")
        self.output_dir = {out_dir!r}
        self.exp_name = "wf_stage2"
        self.seed = 0
""")
    gts_pkl = str(tmp_path / "gts.pkl")
    with open(gts_pkl, "wb") as f:
        pickle.dump(_vid_gts(vid_root, 4, 8), f)

    out = _run(["tools/run_vid_workflow.py",
                "--yolox-exp", str(yolox_exp),
                "--tscd-exp", str(tscd_exp),
                "--workdir", str(tmp_path / "wf"),
                "--int8-eval", "2",
                "--annotations", gts_pkl], timeout=3000)
    summary = json.loads(out.strip().splitlines()[-1])

    assert os.path.exists(summary["stage1_ckpt"])
    assert os.path.exists(summary["stage2_ckpt"])
    # the trivial synthetic task must actually be learned end-to-end
    assert summary["rough_mAP"] > 0.25, summary
    base = summary["repp"]["motion"]["mAP_total"]
    post = summary["repp_post"]["motion"]["mAP_total"]
    assert base > 0.25, summary
    # README.md:141-144 oracle: post-processing must not hurt
    assert post >= base - 0.02, summary
    # int8 serving of the SAME trained VIDEO checkpoint (static scales
    # calibrated on 2 val windows) must hold accuracy — the first int8
    # accuracy evidence on the TSCD model itself rather than still
    # YOLOX (PROFILE.md §int8 measured the still-image side)
    assert summary["int8_mAP"] > 0.2, summary
    assert summary["int8_mAP_drop"] <= 0.1, summary


def test_repp_post_recovers_flicker(tmp_path):
    """Deterministic REPP oracle through the tools/REPP.py CLI: a
    tubelet whose score flickers low on every 3rd frame, plus a
    frame-jumping false positive that outranks the flickered frames.
    Without --post the FP outranks 1/3 of the TPs (precision dents the
    AP); with --post tubelet rescoring lifts the flickered frames above
    the unlinkable FP and mAP must recover (reference README.md:141-144,
    REPPM.py rescoring)."""
    C = 30
    n_frames = 12
    preds = {}
    frames = {}
    w, h = 128, 96
    for f in range(n_frames):
        x0, y0 = 20.0 + f, 15.0
        tp_score = 0.15 if f % 3 == 2 else 0.9
        scores = np.zeros(C, np.float32)
        scores[0] = tp_score
        tp = {"image_id": f"vid0/{f:06d}.JPEG",
              "bbox": [x0, y0, 40.0, 30.0],
              "bbox_center": [(x0 + 20.0) / w, (y0 + 15.0) / h],
              "scores": scores}
        # FP jumps corners so no tubelet links it; constant mid score
        fx = 4.0 if f % 2 else 80.0
        fy = 4.0 if f % 4 < 2 else 60.0
        fscores = np.zeros(C, np.float32)
        fscores[0] = 0.4
        fp = {"image_id": f"vid0/{f:06d}.JPEG",
              "bbox": [fx, fy, 12.0, 10.0],
              "bbox_center": [(fx + 6.0) / w, (fy + 5.0) / h],
              "scores": fscores}
        frames[f"{f:06d}.JPEG"] = [tp, fp]
    preds["vid0"] = frames
    imdb = str(tmp_path / "flicker.pkl")
    with open(imdb, "wb") as f:
        pickle.dump(preds, f)

    gts = {"vid0": {f"{f:06d}.JPEG": np.asarray(
        [[20.0 + f, 15.0, 60.0 + f, 45.0, 0]], np.float32)
        for f in range(n_frames)}}
    gts_pkl = str(tmp_path / "gts.pkl")
    with open(gts_pkl, "wb") as f:
        pickle.dump(gts, f)

    res = {}
    for tag, extra in (("base", []), ("post", ["--post"])):
        out = _run(["tools/REPP.py", "--predictions", imdb,
                    "--out", str(tmp_path / f"{tag}.json"),
                    "--min_tubelet_score", "0.05",
                    "--evaluate", "--annotations", gts_pkl] + extra,
                   timeout=300)
        res[tag] = _motion(out)

    assert res["base"]["mAP_total"] < 0.999, res
    assert res["post"]["mAP_total"] > res["base"]["mAP_total"] + 0.05, res
