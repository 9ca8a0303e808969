import jax.numpy as jnp
import numpy as np

from tscd_tpu.ops.boxes import pairwise_iou_xyxy, iou_loss_cxcywh
from tscd_tpu.ops.nms import nms_fixed, batched_class_aware_nms, topk_nms_select


def test_pairwise_iou():
    a = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    iou = np.asarray(pairwise_iou_xyxy(a, a))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25 / 175, atol=1e-5)


def test_nms_basic():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    keep = np.asarray(nms_fixed(boxes, scores, valid, 0.5))
    assert keep.tolist() == [True, False, True]


def test_nms_invalid_cannot_suppress():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([False, True])
    keep = np.asarray(nms_fixed(boxes, scores, valid, 0.5))
    assert keep.tolist() == [False, True]


def test_class_aware_nms_keeps_cross_class():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    cls = jnp.array([0, 1])
    valid = jnp.ones(2, bool)
    keep = np.asarray(batched_class_aware_nms(boxes, scores, cls, valid, 0.5))
    assert keep.tolist() == [True, True]


def test_topk_nms_select_shapes():
    n = 100
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 100, (n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + 10], -1), jnp.float32)
    scores = jnp.asarray(rng.uniform(size=n), jnp.float32)
    cls = jnp.zeros(n, jnp.int32)
    valid = jnp.ones(n, bool)
    b, s, c, m, idx = topk_nms_select(boxes, scores, cls, valid, 0.5,
                                      top_k=50, out_k=10)
    assert b.shape == (10, 4) and s.shape == (10,) and m.shape == (10,)
    s_np = np.asarray(s)[np.asarray(m)]
    assert (np.diff(s_np) <= 1e-6).all()  # sorted desc


def test_iou_loss_perfect_match():
    b = jnp.array([[5.0, 5.0, 4.0, 4.0]])
    loss = np.asarray(iou_loss_cxcywh(b, b))
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)
