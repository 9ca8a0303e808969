"""TIDE-style detection error breakdown (reference: tools/
TIDE_analysis.py — an 11-line stub there; a working classifier here).

Buckets each detection into TIDE error types at AP50: Cls (right box,
wrong class), Loc (right class, 0.1<=IoU<0.5), Both, Dupe (second match
to an already-matched gt), Bkg (IoU<0.1), Miss (unmatched gt).
Inputs: pickles of {image_key: (K,7) det rows} / {image_key: (N,5) gts}.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.postprocess.linking import iou_matrix


def tide_breakdown(dets, gts, pos_thr=0.5, bkg_thr=0.1):
    counts = {"Cls": 0, "Loc": 0, "Both": 0, "Dupe": 0, "Bkg": 0,
              "Miss": 0, "TP": 0}
    for key, d in dets.items():
        g = np.asarray(gts.get(key, np.zeros((0, 5))), np.float32)
        d = np.asarray(d, np.float32)
        matched = np.zeros(len(g), bool)
        order = np.argsort(-(d[:, 4] * d[:, 5])) if len(d) else []
        for i in order:
            if len(g) == 0:
                counts["Bkg"] += 1
                continue
            iou = iou_matrix(d[i:i + 1, :4], g[:, :4])[0]
            same = g[:, 4] == d[i, 6]
            best_same = (iou * same).max() if same.any() else 0.0
            best_any = iou.max()
            j = int(np.argmax(iou * same)) if same.any() else -1
            if best_same >= pos_thr:
                if matched[j]:
                    counts["Dupe"] += 1
                else:
                    counts["TP"] += 1
                    matched[j] = True
            elif best_any >= pos_thr:
                counts["Cls"] += 1
            elif best_same >= bkg_thr:
                counts["Loc"] += 1
            elif best_any >= bkg_thr:
                counts["Both"] += 1
            else:
                counts["Bkg"] += 1
        counts["Miss"] += int((~matched).sum())
    return counts


def main():
    p = argparse.ArgumentParser("TIDE analysis")
    p.add_argument("--dets", required=True,
                   help="pickle {image: (K,7) rows}")
    p.add_argument("--gts", required=True,
                   help="pickle {image: (N,5) rows}")
    args = p.parse_args()
    with open(args.dets, "rb") as f:
        dets = pickle.load(f)
    with open(args.gts, "rb") as f:
        gts = pickle.load(f)
    counts = tide_breakdown(dets, gts)
    total_err = sum(v for k, v in counts.items() if k != "TP") or 1
    print(f"{'type':<6} count  share")
    for k, v in counts.items():
        share = "" if k == "TP" else f"{100 * v / total_err:5.1f}%"
        print(f"{k:<6} {v:5d}  {share}")


if __name__ == "__main__":
    main()
