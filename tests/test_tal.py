"""TaskAligned assigner (ops/tal.py) vs a loop-based numpy oracle, plus
YOLOv8 DFL-loss sanity (finite grads, fg coverage)."""

import jax
import jax.numpy as jnp
import numpy as np

from tscd_tpu.ops.tal import tal_assign
from tscd_tpu.train.v8_losses import yolov8_loss

EPS = 1e-9


def np_iou_xyxy(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * np.clip(
        x[:, 3] - x[:, 1], 0, None)
    union = area(a)[:, None] + area(b)[None] - inter
    return inter / (union + 1e-16)


def oracle_tal(scores, boxes, gts, gt_cls, gt_valid, axy, C,
               topk=10, alpha=0.5, beta=6.0):
    """Loop-based TAL following the semantics in ops/tal.py's header."""
    A, G = len(boxes), len(gts)
    ious = np.clip(np_iou_xyxy(gts, boxes), 0, None)
    align = np.zeros((G, A))
    in_gts = np.zeros((G, A), bool)
    for g in range(G):
        if not gt_valid[g]:
            continue
        x1, y1, x2, y2 = gts[g]
        m = ((axy[:, 0] - x1 > EPS) & (x2 - axy[:, 0] > EPS)
             & (axy[:, 1] - y1 > EPS) & (y2 - axy[:, 1] > EPS))
        in_gts[g] = m
        align[g] = np.where(
            m, scores[:, int(gt_cls[g])] ** alpha * ious[g] ** beta, 0.0)
    mask_pos = np.zeros((G, A), bool)
    for g in range(G):
        top = np.argsort(-align[g])[:topk]
        for a in top:
            if in_gts[g, a] and align[g, a] > 0:
                mask_pos[g, a] = True
    fg = mask_pos.sum(0) > 0
    matched = np.zeros(A, np.int64)
    for a in range(A):
        cl = np.where(mask_pos[:, a])[0]
        if len(cl) == 0:
            continue
        # multi-claimed anchors: highest IoU over ALL gts (ultralytics
        # select_highest_overlaps)
        matched[a] = np.argmax(ious[:, a]) if len(cl) > 1 else cl[0]
    # rebuild single-claim mask, then per-gt normalization
    mask_pos = np.zeros((G, A), bool)
    for a in range(A):
        if fg[a]:
            mask_pos[matched[a], a] = True
    tscores = np.zeros((A, C))
    for g in range(G):
        sel = mask_pos[g]
        if not sel.any():
            continue
        mx_a, mx_i = align[g, sel].max(), ious[g, sel].max()
        for a in np.where(sel)[0]:
            tscores[a, int(gt_cls[g])] = align[g, a] * mx_i / (mx_a + EPS)
    return fg, matched, tscores


def test_tal_matches_oracle():
    rng = np.random.RandomState(7)
    A, G, C = 120, 9, 6
    axy = rng.uniform(5, 95, (A, 2)).astype(np.float32)
    boxes_c = np.stack([rng.uniform(10, 90, A), rng.uniform(10, 90, A),
                        rng.uniform(5, 40, A), rng.uniform(5, 40, A)], -1)
    boxes = np.stack([boxes_c[:, 0] - boxes_c[:, 2] / 2,
                      boxes_c[:, 1] - boxes_c[:, 3] / 2,
                      boxes_c[:, 0] + boxes_c[:, 2] / 2,
                      boxes_c[:, 1] + boxes_c[:, 3] / 2],
                     -1).astype(np.float32)
    gts_c = np.stack([rng.uniform(20, 80, G), rng.uniform(20, 80, G),
                      rng.uniform(15, 50, G), rng.uniform(15, 50, G)], -1)
    gts = np.stack([gts_c[:, 0] - gts_c[:, 2] / 2,
                    gts_c[:, 1] - gts_c[:, 3] / 2,
                    gts_c[:, 0] + gts_c[:, 2] / 2,
                    gts_c[:, 1] + gts_c[:, 3] / 2], -1).astype(np.float32)
    gt_cls = rng.randint(0, C, G)
    gt_valid = np.ones(G, bool)
    gt_valid[-2:] = False
    gts[-2:] = 0.0
    scores = rng.uniform(0.01, 0.99, (A, C)).astype(np.float32)

    got = tal_assign(jnp.asarray(scores), jnp.asarray(boxes),
                     jnp.asarray(gts), jnp.asarray(gt_cls),
                     jnp.asarray(gt_valid), jnp.asarray(axy), C)
    want_fg, want_match, want_ts = oracle_tal(
        scores, boxes, gts, gt_cls, gt_valid, axy, C)

    np.testing.assert_array_equal(np.asarray(got.fg_mask), want_fg)
    np.testing.assert_array_equal(
        np.asarray(got.matched_gt)[want_fg], want_match[want_fg])
    np.testing.assert_allclose(np.asarray(got.target_scores), want_ts,
                               rtol=1e-5, atol=1e-6)
    assert int(got.num_fg) == int(want_fg.sum())


def test_yolov8_loss_grads_finite():
    from tscd_tpu.models.yolov8 import YOLOv8
    model = YOLOv8(num_classes=6, depth=0.33, width=0.25)
    x = jnp.asarray(np.random.RandomState(0).uniform(
        0, 255, (2, 64, 64, 3)).astype(np.float32))
    labels = np.zeros((2, 10, 5), np.float32)
    labels[0, 0] = [1, 32, 32, 30, 24]
    labels[0, 1] = [3, 12, 40, 14, 16]
    labels[1, 0] = [5, 50, 20, 20, 20]
    labels = jnp.asarray(labels)
    variables = model.init(jax.random.PRNGKey(0), x, True, decode=False)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply({"params": p, **rest}, x, True, decode=False,
                             mutable=["batch_stats"])
        return yolov8_loss(out, labels)["total_loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)
