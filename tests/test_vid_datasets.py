"""Tests: OVIS video dataset loading + build_sequences window modes."""

import json
import os
import random

import numpy as np
import pytest

from tscd_tpu.data.vid import (OVISVideoDataset, build_sequences,
                               collate_window)


def _ovis_json(root, n_videos=2, n_frames=6, size=(48, 64)):
    import cv2
    h, w = size
    images, annotations, videos = [], [], []
    img_id, ann_id = 0, 1
    for v in range(n_videos):
        videos.append({"id": v + 1})
        for f in range(n_frames):
            fn = f"v{v}/img_{f:07d}.jpg"
            path = os.path.join(root, "train", fn)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            img = np.full((h, w, 3), 70, np.uint8)
            cv2.rectangle(img, (10 + f, 8), (34 + f, 28), (250,) * 3, -1)
            cv2.imwrite(path, img)
            images.append({"id": img_id, "file_name": fn, "width": w,
                           "height": h, "sid": v, "fid": f})
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 3,
                "bbox": [10 + f, 8, 24, 20], "area": 480, "iscrowd": 0})
            img_id += 1
            ann_id += 1
    j = {"images": images, "annotations": annotations,
         "categories": [{"id": c + 1, "name": f"c{c}"}
                        for c in range(25)],
         "videos": videos}
    jp = os.path.join(root, "ovis.json")
    with open(jp, "w") as f:
        json.dump(j, f)
    return jp


def test_ovis_video_dataset_windows(tmp_path):
    root = str(tmp_path)
    jp = _ovis_json(root)
    ds = OVISVideoDataset(jp, data_dir=root, name="train",
                          img_size=(48, 64), lframe=2, gframe=2,
                          val=True, training=False)
    assert len(ds.res) > 0
    for seq in ds.res:
        assert len(seq) == 4
    batch = collate_window(ds, ds.res[0])
    assert batch["imgs"].shape == (4, 48, 64, 3)
    assert batch["time_embedding"].shape == (4, 256)
    lab = batch["labels"][0]
    real = lab[lab.sum(-1) > 0]
    assert len(real) == 1 and real[0, 0] == 2   # class index of cat 3


def test_ovis_pads_short_videos(tmp_path):
    root = str(tmp_path)
    jp = _ovis_json(root, n_videos=1, n_frames=3)
    ds = OVISVideoDataset(jp, data_dir=root, name="train",
                          img_size=(48, 64), lframe=2, gframe=4,
                          val=True, training=False)
    # 3-frame video padded by repeating the last frame to lframe+gframe
    assert len(ds.res) >= 1
    assert len(ds.res[0]) == 6


def _videos(n=2, length=12):
    return [[f"v{v}/{i:06d}.JPEG" for i in range(length)]
            for v in range(n)]


def test_build_sequences_random_local_global():
    rng = random.Random(0)
    res = build_sequences(_videos(), lframe=2, gframe=3, mode="random",
                          val=True, rng=rng)
    assert all(len(s) == 5 for s in res)
    for s in res:
        # local frames consecutive, globals from the same video
        v = s[0].split("/")[0]
        assert all(p.split("/")[0] == v for p in s)
        i0 = int(s[0].split("/")[1].split(".")[0])
        i1 = int(s[1].split("/")[1].split(".")[0])
        assert i1 == i0 + 1


def test_build_sequences_gframe_only():
    rng = random.Random(0)
    res = build_sequences(_videos(), lframe=0, gframe=4, mode="random",
                          val=True, rng=rng)
    assert all(len(s) == 4 for s in res)


def test_build_sequences_uniform_mode():
    rng = random.Random(0)
    res = build_sequences(_videos(1), lframe=0, gframe=4, mode="uniform",
                          val=True, rng=rng)
    assert all(len(s) == 4 for s in res)
    idxs = [int(p.split("/")[1].split(".")[0]) for p in res[0]]
    steps = np.diff(idxs)
    assert (steps == steps[0]).all()   # uniform stride


def test_build_sequences_traj_linking_overlap():
    rng = random.Random(0)
    res = build_sequences(_videos(1), lframe=4, gframe=2, mode="random",
                          traj_linking=True, val=True, rng=rng)
    # second window's local frames start one before the boundary
    first_locals = [int(p.split("/")[1].split(".")[0])
                    for p in res[1][:5]]
    assert first_locals[0] == 3   # overlap-by-1 (i-1..i+lframe)


def test_build_sequences_training_caps():
    vids = _videos(1, length=400)
    rng = random.Random(0)
    counts = {p: 1 for v in vids for p in v}
    res = build_sequences(vids, lframe=4, gframe=2, mode="random",
                          training=True, label_counts=counts,
                          seq_cap_per_video=15, rng=rng)
    assert len(res) <= 15


def test_uint8_transport_exact():
    """uint8 window transport is bit-exact vs the fp32 feed: letterboxed
    pixels are integer-valued either way (data_augment.py:248 keeps
    uint8 through the resize), and YOLOPAFPN casts uint8 inputs on
    device. This is the 4x host->HBM upload saving (VERDICT r2 Next #6);
    no resize/normalize divergence exists because the model family feeds
    raw 0-255 pixels."""
    import jax
    import jax.numpy as jnp

    from tscd_tpu.models.yolox import YOLOX

    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, (40, 52, 3), np.uint8)

    from tscd_tpu.data.transforms import letterbox
    f32, r1 = letterbox(img_u8, (64, 64))
    assert f32.dtype == np.float32
    u8 = f32.astype(np.uint8)
    np.testing.assert_array_equal(u8.astype(np.float32), f32)

    m = YOLOX(num_classes=5, depth=0.33, width=0.125)
    x_f32 = jnp.asarray(f32[None])
    x_u8 = jnp.asarray(u8[None])
    v = m.init(jax.random.PRNGKey(0), x_f32)
    out_f = m.apply(v, x_f32)
    out_u = m.apply(v, x_u8)
    np.testing.assert_array_equal(np.asarray(out_f["decoded"]),
                                  np.asarray(out_u["decoded"]))
