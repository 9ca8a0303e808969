import numpy as np

from tscd_tpu.eval.coco_api import COCO
from tscd_tpu.eval.cocoeval import COCOeval


def make_gt(annos, num_imgs=2, num_cats=2):
    return COCO({
        "images": [{"id": i, "width": 100, "height": 100}
                   for i in range(num_imgs)],
        "categories": [{"id": c, "name": f"cat{c}"}
                       for c in range(1, num_cats + 1)],
        "annotations": [
            {"id": i + 1, "image_id": a[0], "category_id": a[1],
             "bbox": list(a[2]), "area": a[2][2] * a[2][3], "iscrowd": 0}
            for i, a in enumerate(annos)],
    })


def run_eval(gt, dets):
    dt = gt.loadRes(dets)
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    return e.summarize(), e


def test_perfect_detection():
    gt = make_gt([(0, 1, (10, 10, 40, 40)), (1, 2, (20, 20, 30, 30))])
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
         "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [20, 20, 30, 30],
         "score": 0.8},
    ]
    stats, _ = run_eval(gt, dets)
    assert abs(stats[0] - 1.0) < 1e-6   # mAP
    assert abs(stats[1] - 1.0) < 1e-6   # AP50


def test_missed_gt_halves_recall():
    gt = make_gt([(0, 1, (10, 10, 40, 40)), (1, 1, (20, 20, 30, 30))])
    dets = [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
             "score": 0.9}]
    stats, _ = run_eval(gt, dets)
    # one of two gts found: AP ~ 0.5 (precision 1 up to recall 0.5)
    assert abs(stats[1] - 0.5) < 0.02


def test_false_positive_lowers_precision():
    gt = make_gt([(0, 1, (10, 10, 40, 40))])
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
         "score": 0.5},
        {"image_id": 0, "category_id": 1, "bbox": [60, 60, 30, 30],
         "score": 0.9},  # higher-scored FP
    ]
    stats, _ = run_eval(gt, dets)
    # FP ranked first: precision at recall 1 is 0.5
    assert abs(stats[1] - 0.5) < 0.02


def test_localization_quality_affects_map_not_ap50():
    gt = make_gt([(0, 1, (10, 10, 40, 40))])
    # IoU ~ 0.68 detection: counts at 0.5..0.65, misses 0.7+
    dets = [{"image_id": 0, "category_id": 1, "bbox": [14, 14, 40, 40],
             "score": 0.9}]
    stats, _ = run_eval(gt, dets)
    assert abs(stats[1] - 1.0) < 1e-6   # AP50 perfect
    assert stats[0] < 0.75              # mAP degraded


def test_per_class_ap():
    gt = make_gt([(0, 1, (10, 10, 40, 40)), (1, 2, (20, 20, 30, 30))])
    dets = [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
             "score": 0.9}]
    _, e = run_eval(gt, dets)
    table = e.per_class_ap(iouThr=0.5)
    assert abs(table["cat1"] - 100.0) < 1e-4
    assert abs(table["cat2"] - 0.0) < 1e-4


def test_crowd_gt_is_ignored():
    gt = COCO({
        "images": [{"id": 0}],
        "categories": [{"id": 1, "name": "c"}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [10, 10, 40, 40], "area": 1600, "iscrowd": 0},
            {"id": 2, "image_id": 0, "category_id": 1,
             "bbox": [60, 60, 30, 30], "area": 900, "iscrowd": 1},
        ],
    })
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
         "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [60, 60, 30, 30],
         "score": 0.8},  # matches crowd -> ignored, not FP
    ]
    stats, _ = run_eval(gt, dets)
    assert abs(stats[1] - 1.0) < 1e-6
