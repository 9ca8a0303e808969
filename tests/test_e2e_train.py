"""End-to-end integration: synthetic VID dataset on disk -> exp ->
TSCDTrainer (jitted step, ckpt) -> VIDEvaluator scoring, all through the
public framework surface (the SURVEY §4 'tnum mini-eval' strategy)."""

import os
import sys
from xml.sax.saxutils import escape

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _make_vid_dataset(root, n_videos=2, n_frames=8, size=(96, 128)):
    """ILSVRC-style layout: Data/VID/.../*.JPEG + Annotations xmls +
    seq npy files."""
    import cv2
    h, w = size
    videos = []
    for v in range(n_videos):
        rel_frames = []
        for f in range(n_frames):
            rel = f"Data/VID/val/vid{v}/{f:06d}.JPEG"
            path = os.path.join(root, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            img = np.full((h, w, 3), 90, np.uint8)
            x0, y0 = 20 + 2 * f + 10 * v, 15 + f
            cv2.rectangle(img, (x0, y0), (x0 + 40, y0 + 30),
                          (255, 255, 255), -1)
            cv2.imwrite(path, img)
            xml_rel = rel.replace("Data", "Annotations").replace(
                "JPEG", "xml")
            xml_path = os.path.join(root, xml_rel)
            os.makedirs(os.path.dirname(xml_path), exist_ok=True)
            with open(xml_path, "w") as fh:
                fh.write(f"""<annotation>
  <size><width>{w}</width><height>{h}</height></size>
  <object><name>n02691156</name>
    <bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>
            <xmax>{x0 + 40}</xmax><ymax>{y0 + 30}</ymax></bndbox>
  </object>
</annotation>""")
            rel_frames.append(rel)
        videos.append(rel_frames)
    np.save(os.path.join(root, "train_seq.npy"),
            np.asarray(videos, object), allow_pickle=True)
    np.save(os.path.join(root, "val_seq.npy"),
            np.asarray(videos, object), allow_pickle=True)
    return root


@pytest.mark.slow
def test_tscd_end_to_end_train_and_eval(tmp_path):
    root = _make_vid_dataset(str(tmp_path / "vid"))
    exp_file = tmp_path / "tiny_exp.py"
    exp_file.write_text(f"""
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
        self.max_epoch = 1
        self.eval_interval = 10  # skip in-loop eval; we eval manually
        self.data_dir = {root!r}
        self.train_seq_path = os.path.join({root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_e2e"
        self.fix_bn = False
        self.seed = 0
""")
    from tscd_tpu.exp import get_exp
    exp = get_exp(str(exp_file))
    trainer = exp.get_trainer(None)
    state = trainer.train()
    assert int(state.step) >= 1
    assert os.path.exists(os.path.join(exp.output_dir, "tiny_e2e",
                                       "latest_ckpt.msgpack"))
    # eval path: scores must come out finite, COCO pipeline runs
    res_ap = trainer.evaluate()
    assert isinstance(res_ap, float)


@pytest.mark.slow
@pytest.mark.parametrize("knob", ["int8_frozen_backbone", "int8_qat"])
def test_tscd_e2e_int8_frozen_backbone(tmp_path, knob):
    """Stage-2 recipe with the int8 training knobs through the real
    TSCDTrainer: fix_bn + frozen backbone, with either the scoped w8a8
    backbone forward or full fake-quant QAT (core/tscd_trainer.py).
    Asserts the jitted step runs, the loss is finite, and frozen
    backbone params are untouched while head params move."""
    import jax
    import tscd_tpu.models.blocks as blocks

    root = _make_vid_dataset(str(tmp_path / "vid"))
    exp_file = tmp_path / "tiny_int8_exp.py"
    exp_file.write_text(f"""
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
        self.max_epoch = 1
        self.eval_interval = 10
        self.data_dir = {root!r}
        self.train_seq_path = os.path.join({root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_e2e_int8bb"
        self.{knob} = True   # fix_bn stays True (stage-2)
        self.seed = 0
""")
    from tscd_tpu.exp import get_exp
    exp = get_exp(str(exp_file))
    assert exp.fix_bn and "backbone" in exp.freeze_prefixes()
    old = blocks.INT8_MIN_CIN
    blocks.INT8_MIN_CIN = 16   # tiny width: let its convs quantize
    try:
        trainer = exp.get_trainer(None)
        state = trainer.train()
    finally:
        blocks.INT8_MIN_CIN = old
    assert int(state.step) >= 1
    # frozen backbone: raw params never move (set_to_zero updates), so
    # EMA tracks them to within fp ulps (d*p + (1-d)*p rounds); the
    # trained head diverges from its EMA by orders of magnitude more
    for (k1, p), (k2, e) in zip(
            jax.tree_util.tree_leaves_with_path(
                state.params["backbone"]),
            jax.tree_util.tree_leaves_with_path(
                state.ema_params["backbone"])):
        np.testing.assert_allclose(np.asarray(p), np.asarray(e),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(k1))
    # head params moved
    moved = any(
        float(np.max(np.abs(np.asarray(p) - np.asarray(e)))) > 0
        for p, e in zip(
            jax.tree_util.tree_leaves(state.params["head"]),
            jax.tree_util.tree_leaves(state.ema_params["head"])))
    assert moved
