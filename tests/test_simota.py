"""SimOTA fixed-shape implementation vs a loop-based numpy oracle that
follows the reference algorithm (yolox/models/yolo_head.py:442-659)."""

import numpy as np
import jax.numpy as jnp

from tscd_tpu.ops.simota import simota_assign
from tscd_tpu.train.losses import yolox_loss, labels_to_padded


def np_iou_cxcywh(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    tl = np.maximum(a[:, None, :2] - a[:, None, 2:] / 2,
                    b[None, :, :2] - b[None, :, 2:] / 2)
    br = np.minimum(a[:, None, :2] + a[:, None, 2:] / 2,
                    b[None, :, :2] + b[None, :, 2:] / 2)
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    return inter / (union + 1e-16)


def oracle_simota(bbox, obj_log, cls_log, gts, gt_cls, xs, ys, ss):
    """Loop-based SimOTA following the reference control flow."""
    G, A = len(gts), len(bbox)
    C = cls_log.shape[1]
    xc, yc = (xs + 0.5) * ss, (ys + 0.5) * ss
    in_box = np.zeros((G, A), bool)
    in_ctr = np.zeros((G, A), bool)
    for g in range(G):
        cx, cy, w, h = gts[g]
        in_box[g] = ((xc > cx - w / 2) & (xc < cx + w / 2)
                     & (yc > cy - h / 2) & (yc < cy + h / 2))
        r = 2.5 * ss
        in_ctr[g] = ((xc > cx - r) & (xc < cx + r)
                     & (yc > cy - r) & (yc < cy + r))
    cand = in_box.any(0) | in_ctr.any(0)
    cand_idx = np.where(cand)[0]
    both = in_box[:, cand_idx] & in_ctr[:, cand_idx]
    ious = np_iou_cxcywh(gts, bbox[cand_idx])
    iou_cost = -np.log(ious + 1e-8)
    p = (1 / (1 + np.exp(-cls_log[cand_idx].astype(np.float64)))
         * 1 / (1 + np.exp(-obj_log[cand_idx, None].astype(np.float64))))
    q = np.sqrt(p)
    cls_cost = np.zeros((G, len(cand_idx)))
    for g in range(G):
        t = np.eye(C)[gt_cls[g]]
        bce = -(t * np.maximum(np.log(np.maximum(q, 1e-300)), -100)
                + (1 - t) * np.maximum(np.log(np.maximum(1 - q, 1e-300)), -100))
        cls_cost[g] = bce.sum(-1)
    cost = cls_cost + 3 * iou_cost + 1e5 * (~both)
    # dynamic k
    n_k = min(10, ious.shape[1])
    matching = np.zeros_like(cost, dtype=np.int64)
    for g in range(G):
        topk = np.sort(ious[g])[::-1][:n_k]
        k = max(int(topk.sum()), 1)
        pos = np.argsort(cost[g], kind="stable")[:k]
        matching[g, pos] = 1
    col = matching.sum(0)
    over = col > 1
    if over.any():
        argmin = cost[:, over].argmin(0)
        matching[:, over] = 0
        matching[argmin, np.where(over)[0]] = 1
    fg_in_cand = matching.sum(0) > 0
    fg_mask = np.zeros(A, bool)
    fg_mask[cand_idx[fg_in_cand]] = True
    matched = matching[:, fg_in_cand].argmax(0)
    pred_ious = (matching * ious).sum(0)[fg_in_cand]
    return fg_mask, cand_idx[fg_in_cand], matched, pred_ious


def _random_case(seed, G=7, A=120, C=5):
    rng = np.random.default_rng(seed)
    # anchors on an 8x15 grid, stride 8
    ys_, xs_ = np.meshgrid(np.arange(8), np.arange(15), indexing="ij")
    xs = np.tile(xs_.ravel(), 1).astype(np.float32)
    ys = np.tile(ys_.ravel(), 1).astype(np.float32)
    ss = np.full(A, 8.0, np.float32)
    bbox = np.stack([
        rng.uniform(0, 120, A), rng.uniform(0, 64, A),
        rng.uniform(4, 40, A), rng.uniform(4, 40, A)], -1).astype(np.float32)
    gts = np.stack([
        rng.uniform(10, 110, G), rng.uniform(10, 54, G),
        rng.uniform(8, 50, G), rng.uniform(8, 40, G)], -1).astype(np.float32)
    gt_cls = rng.integers(0, C, G)
    obj = rng.normal(size=A).astype(np.float32)
    cls = rng.normal(size=(A, C)).astype(np.float32)
    return bbox, obj, cls, gts, gt_cls, xs, ys, ss


def test_simota_matches_oracle():
    for seed in range(5):
        bbox, obj, cls, gts, gt_cls, xs, ys, ss = _random_case(seed)
        fg_o, fg_idx_o, matched_o, ious_o = oracle_simota(
            bbox, obj, cls, gts, gt_cls, xs, ys, ss)
        G = len(gts)
        tgt = simota_assign(
            jnp.asarray(bbox), jnp.asarray(obj), jnp.asarray(cls),
            jnp.asarray(gts), jnp.asarray(gt_cls),
            jnp.ones(G, bool), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(ss))
        fg_j = np.asarray(tgt.fg_mask)
        assert (fg_j == fg_o).all(), f"seed {seed}: fg mask mismatch"
        matched_j = np.asarray(tgt.matched_gt)[fg_idx_o]
        assert (matched_j == matched_o).all(), f"seed {seed}: matched gt"
        ious_j = np.asarray(tgt.cls_target).sum(-1)[fg_idx_o]
        np.testing.assert_allclose(ious_j, ious_o, rtol=1e-4, atol=1e-5)


def test_simota_no_gt():
    bbox, obj, cls, gts, gt_cls, xs, ys, ss = _random_case(0, G=3)
    tgt = simota_assign(
        jnp.asarray(bbox), jnp.asarray(obj), jnp.asarray(cls),
        jnp.asarray(gts), jnp.asarray(gt_cls),
        jnp.zeros(3, bool), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))
    assert np.asarray(tgt.num_fg) == 0
    assert not np.asarray(tgt.fg_mask).any()


def test_yolox_loss_finite_and_structured():
    import jax
    rng = np.random.default_rng(0)
    B, C = 2, 5
    hw = [(8, 8), (4, 4), (2, 2)]
    A = 64 + 16 + 4
    raw = jnp.asarray(rng.normal(size=(B, A, 5 + C)), jnp.float32)
    labels = np.zeros((B, 10, 5), np.float32)
    labels[0, 0] = [1, 32, 32, 20, 20]
    labels[0, 1] = [3, 10, 50, 12, 16]
    labels[1, 0] = [0, 40, 20, 30, 24]
    losses = yolox_loss(raw, jnp.asarray(labels), hw, [8, 16, 32])
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k
    assert np.asarray(losses["num_fg"]) > 0
    # gradient flows
    def f(r):
        return yolox_loss(r, jnp.asarray(labels), hw, [8, 16, 32])["total_loss"]
    g = jax.grad(f)(raw)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
