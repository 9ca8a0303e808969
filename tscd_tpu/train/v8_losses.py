"""YOLOv8 (DFL head) training loss: TAL assignment + weighted BCE cls +
CIoU box + Distribution-Focal regression.

The reference trains its v8 blocks with the YOLOX SimOTA recipe
(yolox/models/yolov8_head.py:231-520); our v8 head is the modern DFL
design (tscd_tpu/models/yolov8.py), so it gets the matching loss. All
fixed-shape: labels are the standard zero-padded (B, G, 5)
[cls, cx, cy, w, h] pixel rows.
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import box_cxcywh_to_xyxy, ciou_xyxy
from ..ops.tal import tal_assign_batch
from .losses import labels_to_padded


def _anchors(hw, strides) -> Tuple[jax.Array, jax.Array]:
    """-> (anchor centers (A, 2) in pixels, stride per anchor (A,))."""
    xs, ys, ss = [], [], []
    for (h, w), s in zip(hw, strides):
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        xs.append((xx.reshape(-1) + 0.5) * s)
        ys.append((yy.reshape(-1) + 0.5) * s)
        ss.append(jnp.full(h * w, s, jnp.float32))
    return (jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], -1),
            jnp.concatenate(ss))


def _dfl_ce(pred_dist: jax.Array, target: jax.Array,
            reg_max: int) -> jax.Array:
    """Distribution focal cross-entropy. pred_dist (..., 4, reg_max)
    logits, target (..., 4) continuous in [0, reg_max-1] -> (...,)."""
    tl = jnp.floor(target)
    tr = tl + 1.0
    wl = tr - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, -1)
    take = lambda idx: jnp.take_along_axis(
        logp, jnp.clip(idx, 0, reg_max - 1).astype(jnp.int32)[..., None],
        -1)[..., 0]
    return -(take(tl) * wl + take(tr) * wr).mean(-1)


def yolov8_loss(head_out: Dict, labels: jax.Array,
                strides: Sequence[int] = (8, 16, 32), reg_max: int = 16,
                box_w: float = 7.5, cls_w: float = 0.5,
                dfl_w: float = 1.5) -> Dict[str, jax.Array]:
    """head_out: YOLOv8Head output {"outputs": (B, A, 4*reg_max+C), "hw"}.
    labels: (B, G, 5) [cls, cx, cy, w, h] pixels, zero-padded rows."""
    out = head_out["outputs"].astype(jnp.float32)
    B, A, _ = out.shape
    C = out.shape[-1] - 4 * reg_max
    pred_dist = out[..., :4 * reg_max].reshape(B, A, 4, reg_max)
    cls_logits = out[..., 4 * reg_max:]

    anchor_xy, stride = _anchors(head_out["hw"], strides)   # (A,2), (A,)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    ltrb = jnp.einsum("bafr,r->baf", jax.nn.softmax(pred_dist, -1), bins)
    # pred boxes in grid units (per-anchor stride normalised), then pixels
    axy_g = anchor_xy / stride[:, None]
    pb_x1y1 = axy_g[None] - ltrb[..., :2]
    pb_x2y2 = axy_g[None] + ltrb[..., 2:]
    pred_xyxy_g = jnp.concatenate([pb_x1y1, pb_x2y2], -1)    # (B, A, 4)
    pred_xyxy_px = pred_xyxy_g * stride[None, :, None]

    gt_boxes, gt_classes, gt_valid = labels_to_padded(labels)
    gt_xyxy = box_cxcywh_to_xyxy(gt_boxes)
    tgt = tal_assign_batch(jax.nn.sigmoid(cls_logits), pred_xyxy_px,
                           gt_xyxy, gt_classes, gt_valid, anchor_xy, C)

    tss = jnp.maximum(jnp.sum(tgt.target_scores), 1.0)
    loss_cls = jnp.sum(_bce_logits(cls_logits, tgt.target_scores)) / tss

    fg = tgt.fg_mask.astype(jnp.float32)                      # (B, A)
    weight = jnp.sum(tgt.target_scores, -1) * fg
    tgt_xyxy_g = tgt.target_boxes / stride[None, :, None]
    ciou = ciou_xyxy(pred_xyxy_g, tgt_xyxy_g)
    loss_iou = jnp.sum((1.0 - ciou) * weight) / tss

    # dfl target distances in grid units, clamped inside the bin range
    t_ltrb = jnp.concatenate([axy_g[None] - tgt_xyxy_g[..., :2],
                              tgt_xyxy_g[..., 2:] - axy_g[None]], -1)
    t_ltrb = jnp.clip(t_ltrb, 0.0, reg_max - 1 - 0.01)
    loss_dfl = jnp.sum(_dfl_ce(pred_dist, t_ltrb, reg_max) * weight) / tss

    total = box_w * loss_iou + cls_w * loss_cls + dfl_w * loss_dfl
    return {"total_loss": total, "iou_loss": loss_iou,
            "cls_loss": loss_cls, "dfl_loss": loss_dfl,
            "num_fg": jnp.sum(fg) / B}


def _bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
