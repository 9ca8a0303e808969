"""REPP logreg pair classifier: training (tools/train_repp_clf.py), the
JSON/pickle loaders, and the VERDICT-required check that the trained
logreg distance links noisy synthetic tubelets better than the baseline
IoU-score distance (reference REPPM.py:80 vs :72)."""

import json
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tscd_tpu.postprocess.repp import (REPP, PAIR_FEATURE_ORDER,
                                       load_pair_classifier)


def _make_video(rng, n_frames=30, n_tracks=3, C=5, drift=25.0,
                flicker=0.5, box_lo=60.0, box_hi=120.0):
    """Synthetic crossing tracks with noisy scores: per-frame det dicts
    with track ids (for scoring link accuracy) + (N, 6) GT rows."""
    size = 600.0
    tracks = []
    for t in range(n_tracks):
        x, y = rng.uniform(50, 400, 2)
        vx, vy = rng.uniform(-drift, drift, 2)
        w, h = rng.uniform(box_lo, box_hi, 2)
        cls = int(rng.integers(0, C))
        tracks.append((x, y, vx, vy, w, h, cls))
    frames, gts = [], []
    for f in range(n_frames):
        dets, gt = [], []
        for tid, (x, y, vx, vy, w, h, cls) in enumerate(tracks):
            cx = np.clip(x + vx * f + rng.normal(0, 4), 0, size - w)
            cy = np.clip(y + vy * f + rng.normal(0, 4), 0, size - h)
            # flickering noisy scores: the class score jumps around, so
            # the baseline's score dot product is unreliable
            scores = rng.uniform(0, flicker, C)
            scores[cls] += rng.uniform(0.1, 0.9)
            scores = scores / scores.sum()
            dets.append({"bbox": [cx, cy, w, h],
                         "bbox_center": [(cx + w / 2) / size,
                                         (cy + h / 2) / size],
                         "scores": scores, "_tid": tid})
            gt.append([cx, cy, cx + w, cy + h, cls, tid])
        frames.append(dets)
        gts.append(np.asarray(gt, float))
    return frames, gts


def _link_accuracy(repp, frames):
    """Fraction of correct (same-track) links produced by
    get_video_pairs."""
    pairs, _ = repp.get_video_pairs(frames)
    good = total = 0
    for f, link in enumerate(pairs):
        for i, j in link:
            total += 1
            good += frames[f][i]["_tid"] == frames[f + 1][j]["_tid"]
    return good / max(total, 1), total


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tools.train_repp_clf import build_pairs, fit_logreg

    rng = np.random.default_rng(0)
    preds, annos = {}, {}
    for v in range(8):
        # mix of slow and fast motion so the classifier learns that
        # center distance / size ratios carry linking signal when IoU
        # vanishes
        frames, gts = _make_video(rng, drift=float(rng.uniform(10, 90)),
                                  box_lo=40, box_hi=120)
        names = [f"{i:04d}" for i in range(len(frames))]
        preds[f"vid{v}"] = dict(zip(names, frames))
        annos[f"vid{v}"] = dict(zip(names, gts))
    feats = list(PAIR_FEATURE_ORDER)
    X, y = build_pairs(preds, annos, feats)
    assert y.sum() > 50 and (1 - y).sum() > 50
    clf = fit_logreg(X, y)

    d = tmp_path_factory.mktemp("repp_clf")
    jpath = d / "model.json"
    with open(jpath, "w") as f:
        json.dump({"coef": clf.coef_.tolist(),
                   "intercept": clf.intercept_.tolist(),
                   "feats": feats}, f)
    ppath = d / "model.pckl"
    with open(ppath, "wb") as f:
        pickle.dump((clf, feats), f)
    return str(jpath), str(ppath), clf, feats


def test_json_and_pickle_loaders_agree(trained, rng):
    jpath, ppath, clf, feats = trained
    pj, fj = load_pair_classifier(jpath)
    pp, fp = load_pair_classifier(ppath)
    assert fj == fp == tuple(feats)
    x = rng.uniform(0, 1, size=(8, len(feats)))
    np.testing.assert_allclose(pj(x), pp(x), rtol=1e-6, atol=1e-8)


def test_logreg_beats_baseline_on_noisy_tubelets(trained):
    jpath, _, _, _ = trained
    rng = np.random.default_rng(123)
    # fast motion: frame-to-frame displacement > box size, so same-track
    # IoU is ~zero and the baseline's IoU*score-dot distance starves
    # entirely (the REPP paper's motivation for the learned classifier)
    frames, _ = _make_video(rng, n_frames=40, n_tracks=4, drift=85.0,
                            flicker=0.9, box_lo=40, box_hi=70)

    base = REPP()  # no model -> baseline distance
    lr = REPP(clf_model_path=jpath, clf_threshold=0.3, clf_mode="raw")

    acc_base, n_base = _link_accuracy(base, frames)
    acc_lr, n_lr = _link_accuracy(lr, frames)
    assert n_lr > 0
    # the learned distance must recover more correct links than the
    # baseline manages at all (n_base correct = acc_base * n_base)
    assert acc_lr * n_lr > acc_base * n_base, (
        f"logreg {acc_lr:.3f} (n={n_lr}) vs baseline {acc_base:.3f} "
        f"(n={n_base})")
    assert acc_lr > 0.9


def test_train_repp_clf_cli(tmp_path):
    rng = np.random.default_rng(7)
    preds, annos = {}, {}
    for v in range(2):
        frames, gts = _make_video(rng, n_frames=15)
        names = [f"{i:04d}" for i in range(len(frames))]
        preds[f"vid{v}"] = dict(zip(names, frames))
        annos[f"vid{v}"] = dict(zip(names, gts))
    pp, ap = tmp_path / "preds.pkl", tmp_path / "annos.pkl"
    with open(pp, "wb") as f:
        pickle.dump(preds, f)
    with open(ap, "wb") as f:
        pickle.dump(annos, f)
    out = tmp_path / "model.json"
    import os
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "tools/train_repp_clf.py", "--predictions",
         str(pp), "--annotations", str(ap), "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr
    fn, feats = load_pair_classifier(str(out))
    assert tuple(feats) == PAIR_FEATURE_ORDER
