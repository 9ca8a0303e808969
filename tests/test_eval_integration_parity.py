"""Integration parity for the last two untested hops between head output
and the reported mAP number (VERDICT r2 Missing #4/#6, Next #3):

1. `build_sequences` (tscd_tpu/data/vid.py) vs the reference
   `VIDDataset.photo_to_sequence` (/root/reference/yolox/data/datasets/
   vid.py:133-236) — EXACT sequence-list equality with a shared seeded
   `random` module for every mode (uniform, random local+global,
   training caps + label-empty skip, traj_linking, formal tails,
   lframe=0, tnum truncation), plus the OVIS-class 'gl' mode (:667).

2. The repo VIDEvaluator vs the reference's `convert_to_coco_format`
   (vid_evaluator_v2.py:298-354) on identical synthetic detections/GT:
   both COCO-dict streams are scored with the repo COCOeval (which is
   bit-parity-locked against the reference's C++ COCOeval_opt by
   tests/test_cocoeval.py + test_fast_cocoeval.py — the same scorer the
   reference calls), and the headline AP50-95/AP50 must agree exactly.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

REF = "/root/reference/yolox"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def refvid():
    import refpkg
    return refpkg.load("yolox.data.datasets.vid")


@pytest.fixture(scope="module")
def refeval():
    import refpkg
    return refpkg.load("yolox.evaluators.vid_evaluator_v2")


def _videos(sizes):
    return [[f"v{k}/{i:06d}.JPEG" for i in range(n)]
            for k, n in enumerate(sizes)]


def _ref_dataset(refvid, cls=None, **attrs):
    ds = object.__new__(cls or refvid.VIDDataset)
    defaults = dict(formal=False, mode="random", local_stride=1,
                    traj_linking=False, training=False, val=False,
                    tnum=-1, annotations={})
    defaults.update(attrs)
    for k, v in defaults.items():
        setattr(ds, k, v)
    return ds


SEQ_CASES = [
    # (tag, dataset attrs, lframe, gframe, video sizes, label-empty frames)
    ("val_uniform", dict(mode="uniform", val=True), 0, 8, (37, 12, 64), ()),
    ("val_random_window", dict(mode="random", val=True), 1, 31,
     (70, 40), ()),
    ("train_random", dict(mode="random", training=True), 4, 12,
     (37, 30, 64), ("v0/000004.JPEG", "v0/000005.JPEG",
                    "v0/000006.JPEG", "v0/000007.JPEG")),
    ("train_random_cap15", dict(mode="random", training=True), 4, 12,
     (120,), ()),
    ("val_traj_formal", dict(mode="random", val=True, traj_linking=True,
                             formal=True), 8, 0, (37, 19), ()),
    ("val_formal_short_video", dict(mode="random", val=True, formal=True),
     4, 12, (10, 40), ()),
    ("train_lframe0", dict(mode="random", training=True), 0, 16,
     (37, 64), ()),
    ("val_tnum", dict(mode="uniform", val=True, tnum=3), 0, 8,
     (64,), ()),
    ("train_stride2", dict(mode="random", training=True, local_stride=2),
     4, 0, (37,), ()),
]


@pytest.mark.parametrize("tag,attrs,lf,gf,sizes,empty", SEQ_CASES,
                         ids=[c[0] for c in SEQ_CASES])
def test_build_sequences_matches_photo_to_sequence(refvid, tag, attrs, lf,
                                                   gf, sizes, empty):
    from tscd_tpu.data.vid import build_sequences

    videos = _videos(sizes)
    # annotations: one box per frame except the listed empty frames
    # (the reference checks len(self.annotations[path]))
    ann = {p: ([] if p in empty else [0])
           for v in videos for p in v}

    ds = _ref_dataset(refvid, annotations=ann, **attrs)
    random.seed(1234)
    want = ds.photo_to_sequence([list(v) for v in videos], lf, gf)

    random.seed(1234)
    got = build_sequences(
        [list(v) for v in videos], lf, gf, mode=ds.mode,
        training=ds.training, local_stride=ds.local_stride,
        traj_linking=ds.traj_linking, formal=ds.formal,
        label_counts={p: len(a) for p, a in ann.items()},
        val=ds.val, tnum=ds.tnum)

    assert got == [list(s) for s in want], (
        f"{tag}: {len(got)} vs {len(want)} sequences")


def test_build_sequences_gl_matches_ovis(refvid, tmp_path):
    """'gl' mode only exists on the OVIS/Arg_VID classes (vid.py:667);
    OVIS reads its video list from the COCO-json (vid.py:611-617) and
    pads short videos by repeating the last frame (:622-624)."""
    import json

    from tscd_tpu.data.vid import build_sequences

    videos = _videos((40, 24, 7))  # the 7-frame video gets padded
    anno = {"videos": [{} for _ in videos],
            "images": [{"sid": k, "file_name": p}
                       for k, v in enumerate(videos) for p in v]}
    p = tmp_path / "ovis.json"
    p.write_text(json.dumps(anno))
    ds = _ref_dataset(refvid, cls=refvid.OVIS, mode="gl", val=True,
                      coco_anno_path=str(p))
    random.seed(77)
    want = ds.photo_to_sequence(4, 8)
    padded = [list(v) + [v[-1]] * max(0, 12 - len(v)) for v in videos]
    random.seed(77)
    got = build_sequences(padded, 4, 8, mode="gl", val=True)
    assert got == [list(s) for s in want]


# ------------------------------------------------------------ evaluator


def _synthetic_video_dets(rng, n_videos=2, frames_per_video=6, C=30):
    """Per-frame GT + detections: some true positives with jittered boxes
    and varied scores, some false positives, one missed gt."""
    frames = []
    for v in range(n_videos):
        for f in range(frames_per_video):
            n_gt = int(rng.integers(1, 4))
            gts = []
            for g in range(n_gt):
                w, h = rng.uniform(40, 160, 2)
                x1 = rng.uniform(0, 500 - w)
                y1 = rng.uniform(0, 500 - h)
                gts.append([int(rng.integers(0, C)), x1, y1, x1 + w, y1 + h])
            dets = []
            for g, gt in enumerate(gts):
                if rng.uniform() < 0.15:
                    continue  # missed detection
                jit = rng.normal(0, 4, 4)
                dets.append([gt[1] + jit[0], gt[2] + jit[1],
                             gt[3] + jit[2], gt[4] + jit[3],
                             rng.uniform(0.5, 1.0), rng.uniform(0.5, 1.0),
                             gt[0]])
                if rng.uniform() < 0.3:  # duplicate with lower score
                    dets.append([gt[1] - 8, gt[2] - 8, gt[3] + 8, gt[4] + 8,
                                 rng.uniform(0.1, 0.4),
                                 rng.uniform(0.1, 0.4), gt[0]])
            # false positive, random class
            dets.append([*rng.uniform(0, 300, 2), 0, 0,
                         rng.uniform(0.05, 0.6), rng.uniform(0.05, 0.6),
                         int(rng.integers(0, C))])
            dets[-1][2] = dets[-1][0] + rng.uniform(30, 120)
            dets[-1][3] = dets[-1][1] + rng.uniform(30, 120)
            frames.append(dict(
                video=v, frame=f, path=f"v{v}/{f:06d}.JPEG",
                hw=(540, 960), gts=np.asarray(gts, np.float32),
                dets=np.asarray(dets, np.float32)))
    return frames


def _score_with_repo_cocoeval(gt_dict, data_list):
    from tscd_tpu.eval.coco_api import COCO
    from tscd_tpu.eval.cocoeval import COCOeval
    gt = COCO(gt_dict)
    dt = gt.loadRes(data_list)
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    return e.summarize()


def test_vid_evaluator_matches_reference_pipeline(refeval, rng):
    """Identical synthetic detections through (a) the reference
    convert_to_coco_format + COCOeval-semantics scoring and (b) the repo
    VIDEvaluator.evaluate -> identical AP50-95 / AP50."""
    from tscd_tpu.eval.vid_evaluator import VIDEvaluator

    frames = _synthetic_video_dets(rng)
    img_size = (576, 576)

    # ---- reference path
    ref_ev = refeval.VIDEvaluator(None, img_size, 0.001, 0.5, 30,
                                  lframe=2, gframe=0)
    data_list, labels_list = [], []
    scale = {f["path"]: min(img_size[0] / f["hw"][0],
                            img_size[1] / f["hw"][1]) for f in frames}
    for fr in frames:
        s = scale[fr["path"]]
        outputs = [torch.from_numpy(np.concatenate(
            [fr["dets"][:, :4] * s, fr["dets"][:, 4:6],
             fr["dets"][:, 6:7]], -1))]
        labels = [torch.from_numpy(np.concatenate(
            [fr["gts"][:, :1], fr["gts"][:, 1:] * s], -1))]
        d, l = ref_ev.convert_to_coco_format(outputs, [fr["hw"]], labels)
        data_list.extend(d)
        labels_list.extend(l)
    ref_ev.vid_to_coco["annotations"].extend(labels_list)
    want = _score_with_repo_cocoeval(ref_ev.vid_to_coco, data_list)

    # ---- repo path: windows of 2 frames, dets returned by predict_fn
    windows = [frames[i:i + 2] for i in range(0, len(frames), 2)]

    class Loader:
        def __iter__(self):
            for w in windows:
                s0 = scale[w[0]["path"]]
                yield {
                    "imgs": np.zeros((len(w), 4, 4, 3), np.float32),
                    "time_embedding": np.zeros((len(w), 256), np.float32),
                    "infos": [f["hw"] for f in w],
                    "labels": [np.concatenate(
                        [f["gts"][:, :1],
                         f["gts"][:, 1:] * scale[f["path"]]], -1)
                        for f in w],
                    "paths": [f["path"] for f in w],
                }

    it = iter([[
        np.concatenate([f["dets"][:, :4] * scale[f["path"]],
                        f["dets"][:, 4:6], f["dets"][:, 6:7]], -1)
        for f in w] for w in windows])

    def predict_fn(imgs, te, resume, state):
        return next(it), state

    ev = VIDEvaluator(Loader(), img_size=img_size, confthre=0.001,
                      num_classes=30, lframe=2, gframe=0)
    got = ev.evaluate(predict_fn, log=lambda *a, **k: None)

    np.testing.assert_allclose(got["stats"][0], want[0], atol=1e-10,
                               err_msg="AP50-95")
    np.testing.assert_allclose(got["stats"][1], want[1], atol=1e-10,
                               err_msg="AP50")
    assert got["stats"][0] > 0.3  # the scene is actually scored
