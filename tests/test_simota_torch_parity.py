"""SimOTA parity against the ACTUAL torch implementation.

Drives the reference `YOLOXHead.get_assignments` / `dynamic_k_matching`
(/root/reference/yolox/models/yolo_head.py:442-659) directly on
parametrized scenes and asserts `tscd_tpu.ops.simota.simota_assign`
produces the identical assignment (fg_mask, matched gt, iou-weighted cls
targets). Closes VERDICT r2 Missing #2 — the prior oracle in
test_simota.py was a self-written numpy loop, not the torch code.

Scenes cover the edges the fixed-shape rewrite could diverge on:
  - crowded overlapping gts (anchor conflicts -> argmin-cost resolution)
  - a tiny gt with very few own candidate anchors (dynamic_k vs
    candidate-count interaction; the repo's top-k runs over ALL anchor
    columns with BIG costs, the reference only over candidate columns)
  - a gt whose own candidate set is empty but the union set is not
  - single gt / single anchor-level degenerate grids
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

REF = "/root/reference/yolox/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_head():
    import refpkg
    yolo_head = refpkg.load("yolox.models.yolo_head")
    return yolo_head.YOLOXHead(num_classes=5, width=0.25)


def _grid(hw=((8, 8), (4, 4), (2, 2)), strides=(8, 16, 32)):
    xs, ys, ss = [], [], []
    for (h, w), s in zip(hw, strides):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        xs.append(xx.ravel())
        ys.append(yy.ravel())
        ss.append(np.full(h * w, s, np.float32))
    return (np.concatenate(xs).astype(np.float32),
            np.concatenate(ys).astype(np.float32),
            np.concatenate(ss))


def _preds(rng, A, C):
    # decoded cxcywh predictions scattered over the 64x64 image
    bbox = np.stack([rng.uniform(0, 64, A), rng.uniform(0, 64, A),
                     rng.uniform(4, 40, A), rng.uniform(4, 40, A)],
                    -1).astype(np.float32)
    obj = rng.normal(size=A).astype(np.float32)
    cls = rng.normal(size=(A, C)).astype(np.float32)
    return bbox, obj, cls


def _scene(name, rng, C=5):
    if name == "random":
        G = 7
        gts = np.stack([rng.uniform(8, 56, G), rng.uniform(8, 56, G),
                        rng.uniform(8, 40, G), rng.uniform(8, 40, G)],
                       -1).astype(np.float32)
    elif name == "crowded":
        # 12 heavily-overlapping gts in one quadrant -> many conflicted
        # anchors exercising the argmin-cost reassignment
        G = 12
        gts = np.stack([rng.uniform(20, 36, G), rng.uniform(20, 36, G),
                        rng.uniform(16, 30, G), rng.uniform(16, 30, G)],
                       -1).astype(np.float32)
    elif name == "tiny_gt":
        # one normal gt + one 1.5px gt between grid centers: the tiny
        # gt's in-box set is empty, only center-radius anchors remain
        gts = np.array([[32, 32, 30, 30],
                        [6.1, 6.2, 1.5, 1.5]], np.float32)
    elif name == "edge_gt":
        # gt hanging off the image edge: own candidates nearly empty
        gts = np.array([[32, 32, 24, 24],
                        [-6.0, 30.0, 10.0, 10.0]], np.float32)
    elif name == "single":
        gts = np.array([[30, 30, 20, 20]], np.float32)
    else:
        raise AssertionError(name)
    gt_cls = rng.integers(0, C, len(gts)).astype(np.float32)
    return gts, gt_cls


def _run_ref(ref_head, bbox, obj, cls, gts, gt_cls, xs, ys, ss):
    A, C = cls.shape
    G = len(gts)
    with torch.no_grad():
        out = ref_head.get_assignments(
            0, G, A,
            torch.from_numpy(gts), torch.from_numpy(gt_cls),
            torch.from_numpy(bbox),
            torch.from_numpy(ss[None]), torch.from_numpy(xs[None]),
            torch.from_numpy(ys[None]),
            torch.from_numpy(cls[None]), torch.from_numpy(bbox[None]),
            torch.from_numpy(obj[None, :, None]),
            None, None)
    gt_matched_classes, fg_mask, pred_ious, matched_gt, num_fg = out
    return (gt_matched_classes.numpy(), fg_mask.numpy(),
            pred_ious.numpy(), matched_gt.numpy(), num_fg)


@pytest.mark.parametrize("name", ["random", "crowded", "tiny_gt",
                                  "edge_gt", "single"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_simota_matches_torch_get_assignments(ref_head, name, seed):
    import jax.numpy as jnp
    from tscd_tpu.ops.simota import simota_assign

    rng = np.random.default_rng(seed)
    C = 5
    xs, ys, ss = _grid()
    A = len(xs)
    bbox, obj, cls = _preds(rng, A, C)
    gts, gt_cls = _scene(name, rng, C)
    G = len(gts)

    want_cls, want_fg, want_ious, want_gt, want_nfg = _run_ref(
        ref_head, bbox, obj, cls, gts, gt_cls, xs, ys, ss)

    # pad gts to a larger fixed slot count to exercise the validity mask
    Gp = G + 3
    gts_p = np.zeros((Gp, 4), np.float32)
    gts_p[:G] = gts
    cls_p = np.zeros(Gp, np.float32)
    cls_p[:G] = gt_cls
    valid = np.arange(Gp) < G

    tgt = simota_assign(
        jnp.asarray(bbox), jnp.asarray(obj), jnp.asarray(cls),
        jnp.asarray(gts_p), jnp.asarray(cls_p), jnp.asarray(valid),
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))

    got_fg = np.asarray(tgt.fg_mask)
    assert (got_fg == want_fg).all(), (
        f"fg mismatch: extra={np.where(got_fg & ~want_fg)[0]}, "
        f"missing={np.where(~got_fg & want_fg)[0]}")
    assert int(np.asarray(tgt.num_fg)) == int(want_nfg)

    fg_idx = np.where(want_fg)[0]  # anchor-index order, both sides
    got_gt = np.asarray(tgt.matched_gt)[fg_idx]
    assert (got_gt == want_gt).all(), "matched gt index mismatch"
    got_cls_t = np.asarray(tgt.cls_target)[fg_idx]
    want_cls_t = (np.eye(C)[want_cls.astype(int)]
                  * want_ious[:, None]).astype(np.float32)
    np.testing.assert_allclose(got_cls_t, want_cls_t, rtol=1e-4, atol=1e-5)
    # reg targets: the matched gt boxes
    np.testing.assert_allclose(np.asarray(tgt.reg_target)[fg_idx],
                               gts[want_gt], rtol=1e-6, atol=1e-6)


def test_simota_fewer_candidates_than_k(ref_head):
    """Degenerate grid (one 2x2 level): every gt has <10 candidates, so
    dynamic_k routinely equals the full candidate count — the top-k
    columns then run off the candidate set unless restricted."""
    import jax.numpy as jnp
    from tscd_tpu.ops.simota import simota_assign

    rng = np.random.default_rng(3)
    C = 5
    xs, ys, ss = _grid(hw=((2, 2),), strides=(32,))
    A = len(xs)
    bbox, obj, cls = _preds(rng, A, C)
    # gts with near-perfect predicted boxes -> high ious -> max dynamic_k
    gts = np.array([[32, 32, 40, 40], [16, 16, 20, 20]], np.float32)
    bbox[0] = [16, 16, 20, 20]
    bbox[1] = [32, 32, 40, 40]
    gt_cls = np.array([1.0, 3.0], np.float32)

    want_cls, want_fg, want_ious, want_gt, want_nfg = _run_ref(
        ref_head, bbox, obj, cls, gts, gt_cls, xs, ys, ss)
    tgt = simota_assign(
        jnp.asarray(bbox), jnp.asarray(obj), jnp.asarray(cls),
        jnp.asarray(gts), jnp.asarray(gt_cls), jnp.ones(2, bool),
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))
    assert (np.asarray(tgt.fg_mask) == want_fg).all()
    fg_idx = np.where(want_fg)[0]
    assert (np.asarray(tgt.matched_gt)[fg_idx] == want_gt).all()
