"""C++-accelerated COCOeval (reference: yolox/layers/fast_coco_eval_api.py
COCOeval_opt:17 — replaces evaluate()/accumulate() with native calls,
falling back to the python implementation if the op can't load,
vid_evaluator_v2.py:462-467).

Identical results to tscd_tpu.eval.cocoeval.COCOeval; the per-image
greedy matching (and the per-cell accumulate inner loop) run in C++."""

import ctypes
from typing import Optional

import numpy as np

from ..native import load_library
from .cocoeval import COCOeval, Params

_lib = None
_lib_tried = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if not _lib_tried:
        _lib_tried = True
        _lib = load_library("cocoeval")
        if _lib is not None:
            _lib.cocoeval_evaluate_img.restype = None
            _lib.cocoeval_accumulate_cell.restype = None
    return _lib


def _cp(a, t):
    return np.ascontiguousarray(a, dtype=t)


class COCOeval_opt(COCOeval):
    """Drop-in COCOeval with native evaluate/accumulate."""

    def _evaluate_img(self, img_id, cat_id, maxDet):
        lib = _get_lib()
        if lib is None:
            return super()._evaluate_img(img_id, cat_id, maxDet)
        p = self.params
        gts = self._gts[(img_id, cat_id)]
        dts = self._dts[(img_id, cat_id)]
        if len(gts) == 0 and len(dts) == 0:
            return None
        dts = sorted(dts, key=lambda d: -d["score"])[:maxDet]
        D, G = len(dts), len(gts)
        T, A = len(p.iouThrs), len(p.areaRng)

        d_boxes = _cp([d["bbox"] for d in dts], np.float64).reshape(-1, 4)
        g_boxes = _cp([g["bbox"] for g in gts], np.float64).reshape(-1, 4)
        d_area = _cp(d_boxes[:, 2] * d_boxes[:, 3], np.float64)
        g_crowd = _cp([g.get("iscrowd", 0) for g in gts], np.uint8)
        g_ignore = _cp([1 if (g.get("ignore", 0) or g.get("iscrowd", 0))
                        else 0 for g in gts], np.uint8)
        g_area = _cp([g.get("area", g["bbox"][2] * g["bbox"][3])
                      for g in gts], np.float64)
        scores = _cp([d["score"] for d in dts], np.float64)
        iou_thrs = _cp(p.iouThrs, np.float64)
        area_rng = _cp(p.areaRng, np.float64)

        dtm = np.zeros((A, T, D), np.int64)
        dt_ig = np.zeros((A, T, D), np.uint8)
        g_ig = np.zeros((A, G), np.uint8)
        npig = np.zeros((A,), np.int32)

        c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        lib.cocoeval_evaluate_img(
            c(d_boxes), c(d_area), ctypes.c_int64(D),
            c(g_boxes), c(g_crowd), c(g_ignore), c(g_area),
            ctypes.c_int64(G),
            c(iou_thrs), ctypes.c_int64(T),
            c(area_rng), ctypes.c_int64(A),
            c(dtm), c(dt_ig), c(g_ig), c(npig))

        result = {"dtScores": scores, "num_dt": D, "num_gt": G}
        for a in range(A):
            result[a] = {
                "dtMatches": dtm[a], "dtIgnore": dt_ig[a].astype(bool),
                "gtIgnore": g_ig[a].astype(bool),
                "num_nonignored_gt": int(npig[a]),
            }
        return result

    def accumulate(self):
        lib = _get_lib()
        if lib is None:
            return super().accumulate()
        p = self.params
        T, R = len(p.iouThrs), len(p.recThrs)
        K, A, M = len(p.catIds), len(p.areaRng), len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores_out = -np.ones((T, R, K, A, M))
        rec_thrs = _cp(p.recThrs, np.float64)
        c = lambda a: a.ctypes.data_as(ctypes.c_void_p)

        for k, cat_id in enumerate(p.catIds):
            per_img = [self.evalImgs.get((img_id, cat_id))
                       for img_id in p.imgIds]
            per_img = [e for e in per_img if e is not None]
            if not per_img:
                continue
            for a in range(A):
                for m, maxDet in enumerate(p.maxDets):
                    dt_scores = np.concatenate(
                        [e["dtScores"][:maxDet] for e in per_img])
                    order = np.argsort(-dt_scores, kind="mergesort")
                    ds = _cp(dt_scores[order], np.float64)
                    dtm = _cp(np.concatenate(
                        [e[a]["dtMatches"][:, :maxDet] for e in per_img],
                        axis=1)[:, order], np.int64)
                    dt_ig = _cp(np.concatenate(
                        [e[a]["dtIgnore"][:, :maxDet] for e in per_img],
                        axis=1)[:, order], np.uint8)
                    npig = sum(e[a]["num_nonignored_gt"] for e in per_img)
                    if npig == 0:
                        continue
                    N = ds.shape[0]
                    prec = np.zeros((T, R), np.float64)
                    sc = np.zeros((T, R), np.float64)
                    rec = np.zeros((T,), np.float64)
                    lib.cocoeval_accumulate_cell(
                        c(dtm), c(dt_ig), c(ds),
                        ctypes.c_int64(T), ctypes.c_int64(N),
                        ctypes.c_int64(npig),
                        c(rec_thrs), ctypes.c_int64(R),
                        c(prec), c(sc), c(rec))
                    precision[:, :, k, a, m] = prec
                    scores_out[:, :, k, a, m] = sc
                    recall[:, k, a, m] = rec
        self.eval = {"params": p, "precision": precision,
                     "recall": recall, "scores": scores_out}
