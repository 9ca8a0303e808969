"""Parity test: native C++ COCOeval vs the numpy implementation."""

import numpy as np
import pytest

from tscd_tpu.eval.coco_api import COCO
from tscd_tpu.eval.cocoeval import COCOeval
from tscd_tpu.eval.fast_cocoeval import COCOeval_opt, _get_lib


def _synthetic_dataset(n_imgs=12, n_cats=4, seed=0):
    rng = np.random.default_rng(seed)
    images, annotations, preds = [], [], []
    ann_id = 1
    for i in range(n_imgs):
        images.append({"id": i, "width": 640, "height": 480})
        for _ in range(rng.integers(0, 6)):
            x, y = rng.uniform(0, 500), rng.uniform(0, 350)
            w, h = rng.uniform(8, 120), rng.uniform(8, 120)
            cat = int(rng.integers(1, n_cats + 1))
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "bbox": [x, y, w, h], "area": w * h,
                "iscrowd": int(rng.uniform() < 0.1)})
            ann_id += 1
            # jittered true positive + random negative
            if rng.uniform() < 0.8:
                preds.append({
                    "image_id": i, "category_id": cat,
                    "bbox": [x + rng.normal(0, 4), y + rng.normal(0, 4),
                             w * rng.uniform(0.8, 1.2),
                             h * rng.uniform(0.8, 1.2)],
                    "score": float(rng.uniform(0.3, 1.0))})
        for _ in range(rng.integers(0, 3)):
            preds.append({
                "image_id": i,
                "category_id": int(rng.integers(1, n_cats + 1)),
                "bbox": [rng.uniform(0, 500), rng.uniform(0, 350),
                         rng.uniform(8, 120), rng.uniform(8, 120)],
                "score": float(rng.uniform(0.01, 1.0))})
    gt = COCO({
        "images": images,
        "categories": [{"id": c + 1, "name": f"c{c}"}
                       for c in range(n_cats)],
        "annotations": annotations})
    return gt, gt.loadRes(preds)


def test_native_lib_builds():
    assert _get_lib() is not None, "g++ build of cocoeval.cpp failed"


def test_native_matches_numpy():
    gt, dt = _synthetic_dataset()
    ref = COCOeval(gt, dt, "bbox")
    ref.evaluate(); ref.accumulate(); ref_stats = ref.summarize()

    fast = COCOeval_opt(gt, dt, "bbox")
    assert _get_lib() is not None
    fast.evaluate(); fast.accumulate(); fast_stats = fast.summarize()

    np.testing.assert_allclose(fast_stats, ref_stats, atol=1e-10)
    np.testing.assert_allclose(fast.eval["precision"],
                               ref.eval["precision"], atol=1e-10)
    np.testing.assert_allclose(fast.eval["recall"],
                               ref.eval["recall"], atol=1e-10)
    # scores too — ignored dts keep their slots in the native path
    np.testing.assert_allclose(fast.eval["scores"],
                               ref.eval["scores"], atol=1e-10)
    # per-image matching identical
    for key, ref_img in ref.evalImgs.items():
        fast_img = fast.evalImgs[key]
        if ref_img is None:
            assert fast_img is None
            continue
        for a in range(4):
            np.testing.assert_array_equal(fast_img[a]["dtMatches"],
                                          ref_img[a]["dtMatches"])
            np.testing.assert_array_equal(fast_img[a]["dtIgnore"],
                                          ref_img[a]["dtIgnore"])
            assert (fast_img[a]["num_nonignored_gt"]
                    == ref_img[a]["num_nonignored_gt"])


def test_native_speedup_sanity():
    """The native path must not be slower than numpy on a larger set."""
    import time
    gt, dt = _synthetic_dataset(n_imgs=60, n_cats=8, seed=1)
    t0 = time.time()
    ref = COCOeval(gt, dt); ref.evaluate(); ref.accumulate()
    t_ref = time.time() - t0
    t0 = time.time()
    fast = COCOeval_opt(gt, dt); fast.evaluate(); fast.accumulate()
    t_fast = time.time() - t0
    assert t_fast < t_ref * 1.5, (t_fast, t_ref)
