"""ota_mode=False (IoU-based refined label) semantics tests.

The candidate columns are the frame's SimOTA fg anchors' matched gt
boxes (reference get_iou_based_label, tscd_head.py:1873) — see
iou_based_refined_targets' docstring for the exact semantics; torch
parity lives in test_torch_parity_train.py::test_iou_based_label_parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tscd_tpu.train.losses import iou_based_refined_targets, tscd_loss


def _ota(rows):
    """rows: list of (gt_box cxcywh, pred_iou, cls_id or None-for-bg)."""
    A = len(rows)
    C = 5
    reg = np.zeros((A, 4), np.float32)
    cls = np.zeros((A, C), np.float32)
    fg = np.zeros(A, bool)
    for a, (box, iou, cid) in enumerate(rows):
        reg[a] = box
        if cid is not None:
            fg[a] = True
            cls[a, cid] = iou
    return jnp.asarray(reg), jnp.asarray(cls), jnp.asarray(fg)


def test_fg_bg_ignore_buckets_and_reg_target():
    props = jnp.asarray([[10, 10, 50, 50],      # IoU 1.0 -> fg
                         [200, 200, 240, 240],  # IoU 0   -> bg
                         [10, 10, 50, 33]],     # IoU ~0.57 -> ignore
                        jnp.float32)
    # one fg anchor matched to the gt (class 2, pred-iou 0.8)
    reg, cls, fgm = _ota([([30, 30, 40, 40], 0.8, 2),
                          ([0, 0, 1, 1], 0.0, None)])
    fg, ignore, cls_t, reg_t = iou_based_refined_targets(
        props, jnp.ones(3, bool), reg, cls, fgm)
    assert list(np.asarray(fg)) == [True, False, False]
    assert list(np.asarray(ignore)) == [False, False, True]
    assert float(cls_t[0, 2]) > 0.99 and float(cls_t[1].sum()) == 0
    np.testing.assert_allclose(np.asarray(reg_t[0]), [30, 30, 40, 40])


def test_invalid_proposals_never_fg():
    props = jnp.asarray([[10, 10, 50, 50], [10, 10, 50, 50]], jnp.float32)
    reg, cls, fgm = _ota([([30, 30, 40, 40], 0.9, 1)])
    fg, ignore, cls_t, _ = iou_based_refined_targets(
        props, jnp.asarray([True, False]), reg, cls, fgm)
    assert bool(fg[0]) and not bool(fg[1])
    assert float(cls_t[0, 1]) > 0.99


def test_gt_without_fg_anchor_is_invisible():
    """A gt whose SimOTA assignment produced no fg anchors cannot
    supervise any proposal (tscd_head.py:1873 gathers only fg rows)."""
    props = jnp.asarray([[10, 10, 50, 50]], jnp.float32)
    reg, cls, fgm = _ota([([30, 30, 40, 40], 0.9, 1)])
    fgm = jnp.zeros_like(fgm)  # drop the anchor
    fg, ignore, cls_t, _ = iou_based_refined_targets(
        props, jnp.ones(1, bool), reg, cls, fgm)
    assert not bool(fg[0]) and float(cls_t.sum()) == 0


def test_zero_pred_iou_anchor_gives_zero_cls_label():
    """Reference :1889-1893: the first maximal anchor's iou-weighted
    one-hot is thresholded >0 — a center-matched anchor with pred-iou 0
    yields an all-zero cls label while the row stays fg (obj target 1)."""
    props = jnp.asarray([[10, 10, 50, 50]], jnp.float32)
    # two anchors share the same matched gt box; the FIRST has pred-iou 0
    reg, cls, fgm = _ota([([30, 30, 40, 40], 0.0, 1),
                          ([30, 30, 40, 40], 0.9, 1)])
    fg, ignore, cls_t, _ = iou_based_refined_targets(
        props, jnp.ones(1, bool), reg, cls, fgm)
    assert bool(fg[0])
    assert float(cls_t.sum()) == 0.0


def test_tscd_loss_ota_false_runs_and_differs():
    rng = np.random.default_rng(0)
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d
    m = TSCD(num_classes=5, depth=0.33, width=0.125, num_proposals=8,
             heads=2)
    x = jnp.asarray(rng.uniform(0, 255, (4, 64, 64, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(4), 256))
    v = m.init(jax.random.PRNGKey(0), x, te, 1, 3)
    labels = np.zeros((4, 6, 5), np.float32)
    labels[:, 0] = [1, 30, 30, 20, 20]
    out = m.apply(v, x, te, 1, 3)
    l_ota = tscd_loss(out, jnp.asarray(labels), (8, 16, 32), 1,
                      ota_mode=True)
    l_iou = tscd_loss(out, jnp.asarray(labels), (8, 16, 32), 1,
                      ota_mode=False)
    for l in (l_ota, l_iou):
        for k, val in l.items():
            assert np.isfinite(float(val)), k
    # base detector losses identical regardless of refined-label mode
    # (at random init neither mode finds fg proposals, so the refined
    # terms may coincide — the bucket tests above pin the semantics)
    assert np.isclose(float(l_ota["iou_loss"]), float(l_iou["iou_loss"]))
