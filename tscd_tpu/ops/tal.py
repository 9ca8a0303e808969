"""TaskAligned label assignment (TAL) for the YOLOv8 DFL head,
fixed-shape and fully on-device.

The reference's yolov8_head.py (:18) reuses the YOLOX SimOTA losses on
its v8 blocks; our v8 head is the modern DFL design
(tscd_tpu/models/yolov8.py), so training uses the matching TAL recipe
(the assigner the DFL head was designed for):

  - candidates: anchors whose center lies inside the gt box
  - alignment metric t = score[class]^alpha * IoU^beta  (alpha=0.5, beta=6)
  - per gt keep the top-k (10) candidates by t
  - anchors claimed by >1 gt keep the gt with the highest IoU
  - cls target = one-hot * t normalized per gt so that
    max_t(gt) -> max_iou(gt)

TPU-first: everything is a dense (G, A) masked computation — no ragged
candidate lists, no host syncs; vmap over the batch.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou_xyxy

_EPS = 1e-9


class TALTargets(NamedTuple):
    fg_mask: jax.Array        # (A,) bool
    target_boxes: jax.Array   # (A, 4) xyxy pixels, garbage for bg
    target_scores: jax.Array  # (A, C) aligned-weighted one-hot, 0 for bg
    matched_gt: jax.Array     # (A,) int gt-slot index
    num_fg: jax.Array         # () float


def tal_assign(pd_scores: jax.Array, pd_boxes: jax.Array,
               gt_boxes: jax.Array, gt_classes: jax.Array,
               gt_valid: jax.Array, anchor_xy: jax.Array,
               num_classes: int, topk: int = 10, alpha: float = 0.5,
               beta: float = 6.0) -> TALTargets:
    """Single image. pd_scores (A, C) sigmoided, pd_boxes (A, 4) xyxy
    pixels, gt_boxes (G, 4) xyxy pixels (zero-padded rows), gt_classes
    (G,), gt_valid (G,) bool, anchor_xy (A, 2) anchor centers in pixels.
    """
    A = pd_scores.shape[0]
    G = gt_boxes.shape[0]

    # anchors inside gt boxes (G, A)
    lt = anchor_xy[None, :, :] - gt_boxes[:, None, :2]   # (G, A, 2)
    rb = gt_boxes[:, None, 2:] - anchor_xy[None, :, :]
    in_gts = jnp.min(jnp.concatenate([lt, rb], -1), -1) > _EPS
    in_gts = in_gts & gt_valid[:, None]

    overlaps = jnp.clip(pairwise_iou_xyxy(gt_boxes, pd_boxes), 0.0)  # (G, A)
    cls_score = jnp.take_along_axis(
        pd_scores.T, gt_classes[:, None].astype(jnp.int32), 0)       # (G, A)
    align = (jnp.power(jnp.maximum(cls_score, 0.0), alpha)
             * jnp.power(overlaps, beta))
    align = jnp.where(in_gts, align, 0.0)

    # top-k candidates per gt by alignment metric
    k = min(topk, A)
    _, top_idx = jax.lax.top_k(align, k)                              # (G, k)
    mask_topk = jnp.zeros((G, A), bool).at[
        jnp.arange(G)[:, None], top_idx].set(True)
    mask_pos = mask_topk & in_gts & (align > 0)

    # conflict resolution: an anchor claimed by several gts keeps the gt
    # with the highest IoU over ALL gts — not just the claimants —
    # matching ultralytics select_highest_overlaps exactly
    claims = jnp.sum(mask_pos, 0)                                     # (A,)
    best_gt = jnp.argmax(jnp.where(gt_valid[:, None], overlaps, -1.0),
                         0)                                           # (A,)
    only_gt = jnp.argmax(mask_pos, 0)
    matched_gt = jnp.where(claims > 1, best_gt, only_gt)
    fg_mask = claims > 0
    mask_pos = (jax.nn.one_hot(matched_gt, G, dtype=jnp.bool_).T
                & fg_mask[None, :])

    # per-gt normalization: scale alignment so its max equals the gt's
    # best IoU (ultralytics norm_align_metric)
    pos_align = jnp.where(mask_pos, align, 0.0)
    pos_iou = jnp.where(mask_pos, overlaps, 0.0)
    gt_max_align = jnp.max(pos_align, 1)                              # (G,)
    gt_max_iou = jnp.max(pos_iou, 1)
    norm = pos_align * (gt_max_iou / (gt_max_align + _EPS))[:, None]  # (G, A)
    anchor_score = jnp.max(norm, 0)                                   # (A,)

    cls_of_anchor = gt_classes[matched_gt].astype(jnp.int32)
    target_scores = (jax.nn.one_hot(cls_of_anchor, num_classes)
                     * jnp.where(fg_mask, anchor_score, 0.0)[:, None])
    target_boxes = gt_boxes[matched_gt]
    return TALTargets(fg_mask, target_boxes, target_scores,
                      matched_gt.astype(jnp.int32),
                      jnp.sum(fg_mask.astype(jnp.float32)))


def tal_assign_batch(pd_scores, pd_boxes, gt_boxes, gt_classes, gt_valid,
                     anchor_xy, num_classes: int, topk: int = 10,
                     alpha: float = 0.5, beta: float = 6.0) -> TALTargets:
    """Batched wrapper: leading B axis on preds and gts."""
    return jax.vmap(
        lambda s, b, gb, gc, gv: tal_assign(
            s, b, gb, gc, gv, anchor_xy, num_classes, topk, alpha, beta)
    )(pd_scores, pd_boxes, gt_boxes, gt_classes, gt_valid)
