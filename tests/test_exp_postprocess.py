"""Tests for the exp/config system and offline post-processing suite."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tscd_tpu.exp import get_exp
from tscd_tpu.postprocess import (REPP, get_pair_features, get_tubelets,
                                  online_previous_selection, post_linking,
                                  vid_eval_motion)
from tscd_tpu.postprocess.linking import get_linking_mat


def _drifting_frames(n_frames=6, k=3, drift=2.0, seed=0):
    """k tracked objects drifting slowly -> (K,7) rows per frame."""
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(n_frames):
        boxes = np.stack([
            10 + drift * f + 40 * np.arange(k),
            10 + drift * f + np.zeros(k),
            50 + drift * f + 40 * np.arange(k),
            50 + drift * f + np.zeros(k)], -1)
        rows = np.concatenate([
            boxes, np.full((k, 1), 0.9),
            rng.uniform(0.5, 0.9, (k, 1)),
            np.arange(k, dtype=float)[:, None]], -1)
        frames.append(rows.astype(np.float32))
    return frames


def test_get_exp_and_merge():
    exp = get_exp(os.path.join(REPO, "exps/TSCD_VID/vid_tscd_large.py"))
    assert exp.depth == 1.0 and exp.gframe_val == 31
    exp.merge(["lframe", "2", "sim_thresh", "0.8"])
    assert exp.lframe == 2 and exp.sim_thresh == 0.8
    with pytest.raises(AttributeError):
        exp.merge(["not_a_knob", "1"])


def test_exp_registry_names():
    exp = get_exp(None, "yolox_s")
    assert exp.depth == 0.33 and exp.width == 0.50


def test_linking_mat_same_class_and_iou():
    f = _drifting_frames(2)
    m = get_linking_mat(f[0], f[1])
    assert m.shape == (3, 3)
    assert np.array_equal(np.diag(m), [True] * 3)   # same obj links
    assert m.sum() == 3                              # different cls don't


def test_post_linking_tubelet_mean():
    frames = _drifting_frames(5)
    out = post_linking(frames)
    # every tubelet member carries the tubelet-mean score
    for obj in range(3):
        scores = [out[f][obj, 4] * out[f][obj, 5] for f in range(5)]
        assert np.allclose(scores, scores[0], atol=1e-5)
    expected = np.mean([frames[f][0, 4] * frames[f][0, 5]
                        for f in range(5)])
    assert np.isclose(out[0][0, 4] * out[0][0, 5], expected, atol=1e-5)


def test_repp_rescore_and_recoordinate():
    frames = _drifting_frames(8)
    repp = REPP(min_tubelet_score=0.05, min_pred_score=0.01)
    out = repp.process_video_dets(frames, num_classes=3)
    assert all(len(o) == 3 for o in out)
    # rescored: per-object scores equal across frames
    s0 = [o[0, 5] for o in out]
    assert np.allclose(s0, s0[0], atol=1e-5)


def test_repp_filters_low_score_tubelets():
    frames = _drifting_frames(4)
    for f in frames:
        f[:, 5] = 0.01
    repp = REPP(min_tubelet_score=0.5, min_pred_score=0.001)
    out = repp.process_video_dets(frames, num_classes=3)
    assert all(len(o) == 0 for o in out)


def test_pair_features_identity():
    # reference feature set (repp_utils.get_pair_features:31)
    d = {"bbox": [10, 10, 20, 20], "bbox_center": [0.5, 0.5],
         "scores": np.array([0.1, 0.9])}
    f = get_pair_features(d, d)
    assert f["iou"] == pytest.approx(1.0)
    assert f["width_rel"] == pytest.approx(1.0)
    assert f["height_rel"] == pytest.approx(1.0)
    assert f["center_distances_corrected"] == 0.0


def test_online_previous_selection_eviction():
    bank = {"feats": [np.ones((2, 4)) * i for i in range(40)]}
    rng = np.random.default_rng(0)
    merged = online_previous_selection(bank, frame_num=31, rng=rng)
    assert len(bank["feats"]) == 31
    assert merged["feats"].shape == (62, 4)
    # newest frame always survives
    assert np.allclose(bank["feats"][-1], 39)


def test_motion_eval_perfect_dets():
    frames = _drifting_frames(6)
    gts = [np.concatenate([f[:, :4], f[:, 6:7]], -1) for f in frames]
    r = vid_eval_motion(frames, gts, num_classes=3)
    assert r["mAP_total"] == pytest.approx(1.0)
    assert r["mAP_slow"] == pytest.approx(1.0)


def test_tubelets_lengths():
    frames = _drifting_frames(5)
    tubes = get_tubelets(frames)
    assert len(tubes) == 3
    assert all(len(t) == 5 for t in tubes)


def test_voc_eval_difficult_gts_ignored():
    from tscd_tpu.data.voc import voc_eval
    # one normal + one difficult gt; detections on both
    g = np.array([[10, 10, 60, 60, 0, 0],
                  [100, 100, 160, 150, 0, 1]], np.float32)
    # the difficult-object detection OUTRANKS the normal one, so if it
    # were counted as an FP it would drag AP below 1.0
    d = np.array([[10, 10, 60, 60, 1, 0.90, 0],
                  [100, 100, 160, 150, 1, 0.95, 0]], np.float32)
    r = voc_eval({"img": d}, {"img": g}, num_classes=1)
    # difficult match ignored (not FP), npos counts only the normal gt
    assert r["mAP"] == pytest.approx(1.0)
    # without the difficult gt present, that same det becomes an FP
    g5 = g[:1, :5]
    r2 = voc_eval({"img": d}, {"img": g5}, num_classes=1)
    assert r2["mAP"] < 1.0
