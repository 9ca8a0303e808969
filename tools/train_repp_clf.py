"""Train the REPP logistic-regression pair classifier.

The reference ships a pretrained pickle (tools/matching_model_logreg.pckl,
loaded at REPPM.py:60-62) but no trainer. This tool fits the same model
from a val imdb dump + track-annotated ground truth:

  predictions: pickle {video: {frame: [repp det dicts]}}
               (tools/val_to_imdb.py output)
  annotations: pickle {video: {frame: (N, 6) rows
               [x1, y1, x2, y2, cls, track_id]}}

Pair construction: a detection inherits the track id of its best-IoU
(>= --assign_iou) GT; detection pairs in consecutive frames are
positives when their track ids match, negatives otherwise. Features are
the reference's matching set (repp_utils.get_pair_features:31). The
model is written as dependency-free JSON ({"coef", "intercept",
"feats"}) consumed by tscd_tpu.postprocess.repp.load_pair_classifier;
--pickle_out additionally writes the reference-compatible
(sklearn_clf, feats) pickle.
"""

import argparse
import json
import pickle

import numpy as np

from tscd_tpu.postprocess.repp import (PAIR_FEATURE_ORDER,
                                       get_pair_features, iou_xywh)


def assign_tracks(dets, gt_rows, assign_iou):
    """det dicts + (N,6) gt -> per-det track id (-1 = unmatched)."""
    tids = []
    for d in dets:
        best, tid = assign_iou, -1
        for g in np.asarray(gt_rows, float).reshape(-1, 6):
            gt_xywh = [g[0], g[1], g[2] - g[0], g[3] - g[1]]
            i = iou_xywh(d["bbox"], gt_xywh)
            if i >= best:
                best, tid = i, int(g[5])
        tids.append(tid)
    return tids


def build_pairs(preds, annos, feats, assign_iou=0.5, neg_per_pos=3,
                seed=0):
    rng = np.random.default_rng(seed)
    X, y = [], []
    for video, frames in preds.items():
        if video not in annos:
            continue
        names = sorted(frames.keys())
        for f in range(len(names) - 1):
            n1, n2 = names[f], names[f + 1]
            if n1 not in annos[video] or n2 not in annos[video]:
                continue
            d1, d2 = frames[n1], frames[n2]
            t1 = assign_tracks(d1, annos[video][n1], assign_iou)
            t2 = assign_tracks(d2, annos[video][n2], assign_iou)
            pos, neg = [], []
            for i, a in enumerate(d1):
                if t1[i] < 0:
                    continue
                for j, b in enumerate(d2):
                    if t2[j] < 0:
                        continue
                    (pos if t1[i] == t2[j] else neg).append((a, b))
            if len(neg) > neg_per_pos * max(len(pos), 1):
                sel = rng.choice(len(neg),
                                 neg_per_pos * max(len(pos), 1),
                                 replace=False)
                neg = [neg[k] for k in sel]
            for a, b in pos:
                X.append([get_pair_features(a, b, feats)[k] for k in feats])
                y.append(1)
            for a, b in neg:
                X.append([get_pair_features(a, b, feats)[k] for k in feats])
                y.append(0)
    return np.asarray(X, float), np.asarray(y, int)


def fit_logreg(X, y):
    from sklearn.linear_model import LogisticRegression
    clf = LogisticRegression(max_iter=1000)
    clf.fit(X, y)
    return clf


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--predictions", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--out", default="matching_model_logreg.json")
    p.add_argument("--pickle_out", default=None,
                   help="also write the reference-format pickle")
    p.add_argument("--assign_iou", type=float, default=0.5)
    p.add_argument("--neg_per_pos", type=int, default=3)
    args = p.parse_args()

    with open(args.predictions, "rb") as f:
        preds = pickle.load(f)
    with open(args.annotations, "rb") as f:
        annos = pickle.load(f)

    feats = list(PAIR_FEATURE_ORDER)
    X, y = build_pairs(preds, annos, feats, args.assign_iou,
                       args.neg_per_pos)
    print(f"pairs: {len(y)} ({int(y.sum())} positive)")
    clf = fit_logreg(X, y)
    acc = float((clf.predict(X) == y).mean())
    print(f"train accuracy: {acc:.4f}")

    with open(args.out, "w") as f:
        json.dump({"coef": clf.coef_.tolist(),
                   "intercept": clf.intercept_.tolist(),
                   "feats": feats}, f)
    print("wrote", args.out)
    if args.pickle_out:
        with open(args.pickle_out, "wb") as f:
            pickle.dump((clf, feats), f)
        print("wrote", args.pickle_out)


if __name__ == "__main__":
    main()
