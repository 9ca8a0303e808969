"""Tests: numpy deployment utils, model factory, TIDE breakdown."""

import numpy as np
import pytest

from tscd_tpu.models.build import create_model, create_yolox_model
from tscd_tpu.utils.demo_utils import (demo_postprocess, multiclass_nms,
                                       nms_numpy)


def test_nms_numpy_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_numpy(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_multiclass_nms_per_class():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([[0.9, 0.0], [0.0, 0.8]], np.float32)
    out = multiclass_nms(boxes, scores, 0.5, 0.1)
    assert out.shape == (2, 6)        # same box kept for both classes


def test_demo_postprocess_matches_jax_decode():
    import jax.numpy as jnp

    from tscd_tpu.ops.decode import decode_outputs
    rng = np.random.default_rng(0)
    hw = [(8, 8), (4, 4), (2, 2)]
    A = sum(h * w for h, w in hw)
    raw = rng.normal(size=(A, 9)).astype(np.float32)
    np_dec = demo_postprocess(raw, (64, 64))
    jx_dec = np.asarray(decode_outputs(jnp.asarray(raw[None]), hw,
                                       (8, 16, 32)))[0]
    np.testing.assert_allclose(np_dec[:, :4], jx_dec[:, :4], atol=1e-4)


def test_model_factory():
    m = create_yolox_model("yolox-s", num_classes=5)[0]
    assert m.depth == 0.33 and m.width == 0.50
    t = create_model("tscd", num_classes=5, depth=0.33, width=0.125,
                     num_proposals=8, heads=2)
    assert type(t).__name__ == "TSCD"
    v7 = create_model("yolov7", num_classes=5, arch="tiny")
    assert type(v7).__name__ == "YOLOv7"


def test_tide_breakdown():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from TIDE_analysis import tide_breakdown
    g = np.array([[10, 10, 50, 50, 0], [100, 100, 150, 150, 1]],
                 np.float32)
    d = np.array([
        [10, 10, 50, 50, 1, 0.9, 0],      # TP
        [11, 11, 51, 51, 1, 0.8, 0],      # dupe
        [100, 100, 150, 150, 1, 0.7, 0],  # cls error
        [300, 300, 340, 340, 1, 0.6, 1],  # bkg
    ], np.float32)
    c = tide_breakdown({"img": d}, {"img": g})
    assert c["TP"] == 1 and c["Dupe"] == 1 and c["Cls"] == 1
    assert c["Bkg"] == 1 and c["Miss"] == 1
