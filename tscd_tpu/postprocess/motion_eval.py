"""ImageNet VID motion-speed mAP breakdown (reference:
tools/imagenet_vid_eval_motion.py — MOTION_RANGES :22, get_motion_mAP :36,
vid_eval_motion :113).

Detections and GT are IMDB-style per-frame lists; per-GT motion IoU (the
average IoU of a GT box with itself ±10 frames) classifies objects into
slow/medium/fast, and AP50 is computed per motion range by ignoring GTs
(and their matched detections) outside the range. The reference reads the
precomputed `imagenet_vid_groundtruth_motion_iou.mat`; this module can
load that (scipy.io) or compute motion IoU from the GT tracks directly.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MOTION_RANGES = [[0.0, 1.0], [0.0, 0.7], [0.7, 0.9], [0.9, 1.0]]
MOTION_NAMES = ["total", "fast", "medium", "slow"]
AREA_RANGES = [[0, 1e5 ** 2]]


def box_iou(b1: np.ndarray, b2: np.ndarray) -> float:
    ix = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
    iy = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
    inter = ix * iy
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    return inter / max(a1 + a2 - inter, 1e-12)


def compute_motion_ious(gt_tracks: Dict[int, List[Tuple[int, np.ndarray]]],
                        window: int = 10) -> Dict[Tuple[int, int], float]:
    """track_id -> [(frame, xyxy box)] -> {(frame, track_id): motion iou}
    (mean IoU of the box with the same track's boxes ±window frames,
    normalized to frame-center coordinates — the standard FGFA metric)."""
    out = {}
    for tid, tr in gt_tracks.items():
        frames = {f: b for f, b in tr}
        for f, b in tr:
            ious = []
            for df in range(-window, window + 1):
                if df == 0 or (f + df) not in frames:
                    continue
                ious.append(box_iou(b, frames[f + df]))
            out[(f, tid)] = float(np.mean(ious)) if ious else 1.0
    return out


def voc_ap(rec: np.ndarray, prec: np.ndarray) -> float:
    """VOC-style AP with all-points interpolation."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def vid_eval_motion(dets_per_frame: List[np.ndarray],
                    gts_per_frame: List[np.ndarray],
                    gt_motion_iou: Optional[List[np.ndarray]] = None,
                    num_classes: int = 30,
                    iou_thresh: float = 0.5) -> Dict[str, float]:
    """AP50 per motion range (reference vid_eval_motion :113).

    dets_per_frame[f]: (K, 7) [x1,y1,x2,y2,obj,score,cls];
    gts_per_frame[f]: (N, 5) [x1,y1,x2,y2,cls];
    gt_motion_iou[f]: (N,) per-GT motion iou (defaults to all 1.0 = slow).
    """
    if gt_motion_iou is None:
        gt_motion_iou = [np.ones(len(g)) for g in gts_per_frame]
    results = {}
    for rng, name in zip(MOTION_RANGES, MOTION_NAMES):
        aps = []
        for c in range(num_classes):
            # collect per-class detections and gts
            recs = []
            npos = 0
            gt_flags = []
            for f, g in enumerate(gts_per_frame):
                sel = np.where(g[:, 4] == c)[0] if len(g) else []
                in_range = [rng[0] <= gt_motion_iou[f][i] <= rng[1]
                            for i in sel]
                gt_flags.append((sel, np.asarray(in_range, bool),
                                 np.zeros(len(sel), bool)))
                npos += int(np.sum(in_range))
            if npos == 0:
                continue
            all_rows = []
            for f, d in enumerate(dets_per_frame):
                if len(d) == 0:
                    continue
                for r in d[d[:, 6] == c]:
                    all_rows.append((f, r[4] * r[5], r[:4]))
            if not all_rows:
                aps.append(0.0)
                continue
            all_rows.sort(key=lambda t: -t[1])
            tp = np.zeros(len(all_rows))
            fp = np.zeros(len(all_rows))
            ignored = np.zeros(len(all_rows), bool)
            for k, (f, score, box) in enumerate(all_rows):
                sel, in_r, matched = gt_flags[f]
                best, bi = 0.0, -1
                for gi, g_idx in enumerate(sel):
                    i = box_iou(box, gts_per_frame[f][g_idx, :4])
                    if i > best:
                        best, bi = i, gi
                if best >= iou_thresh and bi >= 0:
                    if not in_r[bi]:
                        ignored[k] = True       # matched out-of-range GT
                    elif not matched[bi]:
                        tp[k] = 1
                        matched[bi] = True
                    else:
                        fp[k] = 1
                else:
                    fp[k] = 1
            keep = ~ignored
            tp, fp = np.cumsum(tp[keep]), np.cumsum(fp[keep])
            rec = tp / max(npos, 1)
            prec = tp / np.maximum(tp + fp, 1e-12)
            aps.append(voc_ap(rec, prec))
        results[f"mAP_{name}"] = float(np.mean(aps)) if aps else 0.0
    return results
