"""Still-image COCO evaluator (reference: yolox/evaluators/
coco_evaluator.py:103 + per-class AP/AR tables).

Iterates the val set in fixed-size batches, runs a jitted
forward+postprocess, converts to COCO json dicts, scores with the COCO
evaluator (numpy or native fast path), and reports the same
"Average forward/NMS/inference time" accounting.
"""

import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .fast_cocoeval import COCOeval_opt as COCOeval


def per_class_table(per_class: Dict[str, float], headers=("class", "AP"),
                    columns: int = 6) -> str:
    """Flat multi-column text table (reference per_class_AP_table).
    Values arrive already in percent (per_class_ap returns mean*100)."""
    items = [f"{k:<18}{v:6.2f}" for k, v in per_class.items()]
    rows = []
    for i in range(0, len(items), columns):
        rows.append(" | ".join(items[i:i + columns]))
    return "\n".join(rows)


class COCOEvaluator:
    def __init__(self, dataset, img_size=(640, 640), confthre=0.01,
                 nmsthre=0.65, num_classes=80, batch_size: int = 8,
                 per_class_ap: bool = True):
        self.dataset = dataset
        self.img_size = tuple(img_size)
        self.confthre = confthre
        self.nmsthre = nmsthre
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.per_class_ap = per_class_ap

    def evaluate(self, predict_fn: Callable, log=print) -> Dict:
        """predict_fn(imgs (B,H,W,3) f32) -> per-image list of (K, 7)
        numpy [x1,y1,x2,y2,obj,score,cls]; rows with obj*score <= 0 are
        padding."""
        from ..data.transforms import letterbox

        data_list: List[dict] = []
        n_samples = 0
        forward_time = 0.0
        B = self.batch_size
        H, W = self.img_size
        ids = list(range(len(self.dataset)))
        for start in range(0, len(ids), B):
            chunk = ids[start:start + B]
            imgs = np.full((B, H, W, 3), 114.0, np.float32)
            metas = []
            for bi, idx in enumerate(chunk):
                img, _, (h0, w0), img_id = self.dataset.pull_item(idx)
                padded, r = letterbox(img, self.img_size)
                imgs[bi] = padded
                metas.append((img_id, r))
            t0 = time.time()
            dets_batch = predict_fn(imgs)
            forward_time += time.time() - t0
            n_samples += len(chunk)
            for bi, (img_id, r) in enumerate(metas):
                for row in np.asarray(dets_batch[bi]):
                    x1, y1, x2, y2, obj, score, cls = row[:7]
                    s = float(obj) * float(score)
                    if s <= self.confthre:
                        continue
                    data_list.append({
                        "image_id": int(img_id),
                        "category_id": self.dataset.class_ids[int(cls)],
                        "bbox": [float(x1) / r, float(y1) / r,
                                 float(x2 - x1) / r, float(y2 - y1) / r],
                        "score": s,
                    })

        if not data_list:
            log("no predictions")
            return {"mAP": 0.0, "AP50": 0.0}
        gt = self.dataset.coco
        dt = gt.loadRes(data_list)
        e = COCOeval(gt, dt, "bbox")
        e.evaluate()
        e.accumulate()
        stats = e.summarize()
        avg_ms = 1000 * forward_time / max(n_samples, 1)
        log(f"mAP 0.5:0.95 = {stats[0]:.4f}  AP50 = {stats[1]:.4f}")
        log(f"Average inference time: {avg_ms:.2f} ms/img")
        result = {"mAP": float(stats[0]), "AP50": float(stats[1]),
                  "ms_per_image": avg_ms, "stats": stats.tolist()}
        if self.per_class_ap:
            pc = e.per_class_ap(iouThr=0.5)
            log(per_class_table(pc))
            result["per_class_AP50"] = pc
        return result
