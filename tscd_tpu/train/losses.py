"""YOLOX training losses (reference: yolox/models/yolo_head.py:267-433).

loss = 5 * iou_loss + obj_bce + cls_bce (+ l1 in the no-aug tail),
each summed over foreground anchors and divided by the GLOBAL number of
foreground anchors across the batch (num_fg clamped at 1).

Pure function of (raw head outputs, padded labels) — one jitted train
step; SimOTA runs inside under stop_gradient semantics (targets carry no
gradient by construction since they come from lax.top_k/argmin outputs).
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import iou_loss_cxcywh
from ..ops.decode import anchor_centers, decode_outputs
from ..ops.simota import simota_assign_batch


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable elementwise BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def labels_to_padded(labels: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(B, G, 5) [cls, cx, cy, w, h] zero-padded -> (boxes, classes, valid).

    A row is a real gt iff its sum > 0 (reference yolo_head.py:283).
    """
    valid = jnp.sum(labels, axis=-1) > 0
    return labels[..., 1:5], labels[..., 0].astype(jnp.int32), valid


def smooth_l1(x: jax.Array, beta: float = 1.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def iou_based_refined_targets(prop_boxes: jax.Array, prop_valid: jax.Array,
                              ota_reg_target: jax.Array,
                              ota_cls_target: jax.Array,
                              ota_fg_mask: jax.Array,
                              fg_iou: float = 0.6, bg_iou: float = 0.3):
    """IoU-based refined labels (reference get_iou_based_label,
    tscd_head.py:1853-1916 — the ota_mode=False alternative), matching
    the reference's exact semantics (parity: tests/
    test_torch_parity_train.py::test_iou_based_label_parity):

    The candidate boxes are NOT the raw gt list — they are the frame's
    SimOTA fg anchors' matched gt boxes (`reg_targets[batch_idx]`,
    duplicated per anchor; tscd_head.py:1873). Consequences the rewrite
    preserves:
      - a gt that received zero fg anchors is invisible to this labeling;
      - a proposal is fg iff its best IoU against some fg anchor's
        matched box >= fg_iou, bg if < bg_iou, IGNORED in between (no
        obj supervision — the refine_obj_masks exclusion);
      - the class label comes from the FIRST (anchor-order) maximal
        anchor's iou-weighted one-hot thresholded >0 (:1889-1893) — so
        it is all-zero when that anchor's SimOTA pred-iou is 0 (matched
        through the center criterion with no overlap), even though the
        row stays fg with obj target 1.
    A frame with zero fg anchors crashes the reference (max over an
    empty dim); here every proposal of such a frame is background.

    prop_boxes (P, 4) xyxy; ota_* are the per-ANCHOR SimOTA outputs of
    the same frame ((A, 4) cxcywh, (A, C), (A,) bool). Returns
    (fg (P,), ignore (P,), cls_target (P, C),
    reg_target (P, 4) cxcywh of the best-matching anchor's gt)."""
    from ..ops.boxes import box_cxcywh_to_xyxy, pairwise_iou_xyxy
    iou = pairwise_iou_xyxy(prop_boxes,
                            box_cxcywh_to_xyxy(ota_reg_target))  # (P, A)
    iou = jnp.where(ota_fg_mask[None, :], iou, 0.0)
    best_iou = jnp.max(iou, axis=1)
    best_a = jnp.argmax(iou, axis=1)  # first max = reference tie-break
    fg = (best_iou >= fg_iou) & prop_valid
    ignore = (best_iou >= bg_iou) & ~fg
    cls_target = ((ota_cls_target[best_a] > 0).astype(jnp.float32)
                  * best_iou[:, None] * fg[:, None])
    reg_target = ota_reg_target[best_a]
    return fg, ignore, cls_target, reg_target


def tscd_loss(head_out, labels: jax.Array, strides: Sequence[int],
              lframe: int, ota_mode: bool = True) -> Dict[str, jax.Array]:
    """TSCD refined losses (reference tscd_head.py:1008
    get_matcher_refined_losses, ota_mode/reconf path of vid_tscd_large):

      total = 3*iou + obj + cls            (base detector, all frames)
            + refined_cls_bce              (MCA cls refinement, local)
            + matched_obj_bce (clip 15)    (matcher obj, local)
            + 6 * smooth_l1(reg offsets)   (matcher reg vs encoded gt)
      all normalized by num_fg (base) / num_fg_local (refined terms).

    Refined targets come straight from the per-anchor SimOTA output
    gathered at the proposal anchor indices (the fixed-shape equivalent of
    the reference's ota_idx reorder bookkeeping, tscd_head.py:540-609).
    """
    from ..models.tscd_head import encode_reg_targets

    raw = head_out["raw_outputs"].astype(jnp.float32)      # (F, A, 5+C)
    hw = head_out["hw"]
    props = head_out["proposals"]
    num_classes = raw.shape[-1] - 5

    decoded = decode_outputs(raw, hw, strides)
    bbox_preds = decoded[..., :4]
    obj_logits = raw[..., 4]
    cls_logits = raw[..., 5:]

    gt_boxes, gt_classes, gt_valid = labels_to_padded(labels)
    if "simota" in head_out:
        # cat_ota_fg heads already ran SimOTA inside forward
        # (tscd_head.py get_fg_idx equivalent) — reuse the assignment
        tgt = head_out["simota"]
    else:
        xs, ys, ss = anchor_centers(hw, strides)
        xs, ys, ss = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))
        tgt = jax.lax.stop_gradient(simota_assign_batch(
            bbox_preds, obj_logits, cls_logits,
            gt_boxes, gt_classes, gt_valid, xs, ys, ss))

    num_fg = jnp.maximum(jnp.sum(tgt.num_fg), 1.0)
    fg = tgt.fg_mask.astype(jnp.float32)

    loss_iou = jnp.sum(
        iou_loss_cxcywh(bbox_preds, tgt.reg_target) * fg) / num_fg
    loss_obj = jnp.sum(bce_with_logits(obj_logits, tgt.obj_target)) / num_fg
    loss_cls = jnp.sum(
        jnp.sum(bce_with_logits(cls_logits, tgt.cls_target), -1) * fg) / num_fg

    # refined targets at local-frame proposal anchors
    take = jax.vmap(lambda a, i: a[i])
    l_idx = props.idx[:lframe]                              # (L, P)
    slot_valid = props.valid[:lframe].astype(jnp.float32)
    if ota_mode:
        # OTA-based: gather the per-anchor SimOTA output at the proposal
        # anchors (tscd_head.py:540-609); normalize by the SimOTA fg count
        refined_fg = take(tgt.fg_mask[:lframe], l_idx) & props.valid[:lframe]
        refined_cls_t = take(tgt.cls_target[:lframe], l_idx)   # (L, P, C)
        refined_reg_t = take(tgt.reg_target[:lframe], l_idx)   # (L, P, 4)
        obj_weight = slot_valid
        num_fg_local = jnp.maximum(jnp.sum(tgt.num_fg[:lframe]), 1.0)
    else:
        # IoU-based refined labels (get_iou_based_label, :1853): reg
        # target = the best-IoU gt; ignore band gets NO obj supervision;
        # normalize by the IoU-fg count (reference refine_*_masks sums)
        refined_fg, ignore, refined_cls_t, refined_reg_t = jax.vmap(
            iou_based_refined_targets)(
            props.boxes[:lframe], props.valid[:lframe],
            tgt.reg_target[:lframe], tgt.cls_target[:lframe],
            tgt.fg_mask[:lframe])
        obj_weight = slot_valid * (1.0 - ignore.astype(jnp.float32))
        num_fg_local = jnp.maximum(
            jnp.sum(refined_fg.astype(jnp.float32)), 1.0)
    refined_fg_f = refined_fg.astype(jnp.float32)

    loss_refined_cls = jnp.sum(
        jnp.sum(bce_with_logits(
            head_out["refined_cls_logits"][:lframe].astype(jnp.float32),
            refined_cls_t), -1) * refined_fg_f) / num_fg_local

    if "matcher_obj_logits" in head_out:
        loss_matched_obj = jnp.sum(
            bce_with_logits(head_out["matcher_obj_logits"].astype(jnp.float32),
                            refined_fg_f) * obj_weight) / num_fg_local
        # clip at 15 exactly like the reference (tscd_head.py:1185-1186):
        # `loss / float(loss) * 15` — float() detaches, so the reference
        # rescales the VALUE to 15 while the gradient keeps its direction
        # scaled by 15/loss. stop_gradient reproduces that semantics
        # bit-for-bit (tests/test_loss_clip.py proves grad equality).
        loss_matched_obj = jnp.where(
            loss_matched_obj > 15.0,
            loss_matched_obj * jax.lax.stop_gradient(
                15.0 / loss_matched_obj),
            loss_matched_obj)
        enc_t = jax.lax.stop_gradient(encode_reg_targets(
            refined_reg_t, props.boxes[:lframe]))
        loss_matched_iou = jnp.sum(
            jnp.sum(smooth_l1(
                head_out["matcher_reg_offsets"].astype(jnp.float32) - enc_t),
                -1) * refined_fg_f) / num_fg_local
    else:
        loss_matched_obj = jnp.float32(0.0)
        loss_matched_iou = jnp.float32(0.0)

    reg_weight = 3.0
    iou_match_weight = 6.0
    total = (reg_weight * loss_iou + loss_obj + loss_cls
             + loss_refined_cls + loss_matched_obj
             + iou_match_weight * loss_matched_iou)
    return {
        "total_loss": total,
        "iou_loss": reg_weight * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "loss_refined_cls": loss_refined_cls,
        "loss_matched_obj": loss_matched_obj,
        "loss_matched_iou": iou_match_weight * loss_matched_iou,
        "num_fg": jnp.sum(tgt.num_fg) / jnp.maximum(jnp.sum(tgt.num_gt), 1.0),
    }


def yolov_loss(head_out, labels: jax.Array, strides: Sequence[int],
               num_refined_frames: int) -> Dict[str, jax.Array]:
    """YOLOV/YOLOV++ losses (reference yolovp_msa.py get_losses /
    v_plus_head.py ota_mode path): base YOLOX losses over all frames +
    refined-cls BCE (and reconf obj BCE) at the proposal anchors of the
    refined frames, targets from the same SimOTA assignment."""
    raw = head_out["raw_outputs"].astype(jnp.float32)
    hw = head_out["hw"]
    props = head_out["proposals"]

    decoded = decode_outputs(raw, hw, strides)
    bbox_preds = decoded[..., :4]
    obj_logits = raw[..., 4]
    cls_logits = raw[..., 5:]

    gt_boxes, gt_classes, gt_valid = labels_to_padded(labels)
    xs, ys, ss = anchor_centers(hw, strides)
    xs, ys, ss = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))
    tgt = jax.lax.stop_gradient(simota_assign_batch(
        bbox_preds, obj_logits, cls_logits,
        gt_boxes, gt_classes, gt_valid, xs, ys, ss))

    num_fg = jnp.maximum(jnp.sum(tgt.num_fg), 1.0)
    fg = tgt.fg_mask.astype(jnp.float32)
    loss_iou = jnp.sum(
        iou_loss_cxcywh(bbox_preds, tgt.reg_target) * fg) / num_fg
    loss_obj = jnp.sum(bce_with_logits(obj_logits, tgt.obj_target)) / num_fg
    loss_cls = jnp.sum(
        jnp.sum(bce_with_logits(cls_logits, tgt.cls_target), -1) * fg) / num_fg

    R = num_refined_frames
    num_fg_r = jnp.maximum(jnp.sum(tgt.num_fg[:R]), 1.0)
    take = jax.vmap(lambda a, i: a[i])
    r_idx = props.idx[:R]
    refined_fg = take(tgt.fg_mask[:R], r_idx) & props.valid[:R]
    refined_fg_f = refined_fg.astype(jnp.float32)
    refined_cls_t = take(tgt.cls_target[:R], r_idx)
    loss_refined_cls = jnp.sum(
        jnp.sum(bce_with_logits(
            head_out["refined_cls_logits"][:R].astype(jnp.float32),
            refined_cls_t), -1) * refined_fg_f) / num_fg_r

    slot_valid = props.valid[:R].astype(jnp.float32)
    if "refined_obj_logits" in head_out:
        loss_refined_obj = jnp.sum(
            bce_with_logits(
                head_out["refined_obj_logits"][:R].astype(jnp.float32),
                refined_fg_f) * slot_valid) / num_fg_r
    else:
        loss_refined_obj = jnp.float32(0.0)

    reg_weight = 3.0
    total = (reg_weight * loss_iou + loss_obj + loss_cls
             + loss_refined_cls + loss_refined_obj)
    return {
        "total_loss": total,
        "iou_loss": reg_weight * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "loss_refined_cls": loss_refined_cls,
        "loss_refined_obj": loss_refined_obj,
        "num_fg": jnp.sum(tgt.num_fg) / jnp.maximum(jnp.sum(tgt.num_gt), 1.0),
    }


def yolox_loss(raw_outputs: jax.Array, labels: jax.Array,
               hw: Sequence[Tuple[int, int]], strides: Sequence[int],
               use_l1: bool = False) -> Dict[str, jax.Array]:
    """raw_outputs: (B, A, 5+C) raw head output (reg raw, obj/cls logits).

    labels: (B, G, 5) padded [cls, cx, cy, w, h] in input pixels.
    """
    raw_outputs = raw_outputs.astype(jnp.float32)
    decoded = decode_outputs(raw_outputs, hw, strides)
    bbox_preds = decoded[..., :4]                     # (B, A, 4) cxcywh px
    obj_logits = raw_outputs[..., 4]                  # (B, A)
    cls_logits = raw_outputs[..., 5:]                 # (B, A, C)

    gt_boxes, gt_classes, gt_valid = labels_to_padded(labels)
    xs, ys, ss = anchor_centers(hw, strides)
    xs, ys, ss = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))

    tgt = jax.lax.stop_gradient(simota_assign_batch(
        bbox_preds, obj_logits, cls_logits,
        gt_boxes, gt_classes, gt_valid, xs, ys, ss))

    num_fg = jnp.maximum(jnp.sum(tgt.num_fg), 1.0)
    fg = tgt.fg_mask.astype(jnp.float32)              # (B, A)

    loss_iou = jnp.sum(
        iou_loss_cxcywh(bbox_preds, tgt.reg_target) * fg) / num_fg
    loss_obj = jnp.sum(bce_with_logits(obj_logits, tgt.obj_target)) / num_fg
    loss_cls = jnp.sum(
        jnp.sum(bce_with_logits(cls_logits, tgt.cls_target), -1) * fg) / num_fg

    if use_l1:
        # l1 on RAW reg outputs in grid units (yolo_head.py:416-419)
        loss_l1 = jnp.sum(
            jnp.sum(jnp.abs(raw_outputs[..., :4] - tgt.l1_target), -1) * fg
        ) / num_fg
    else:
        loss_l1 = jnp.float32(0.0)

    reg_weight = 5.0
    total = reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    return {
        "total_loss": total,
        "iou_loss": reg_weight * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "l1_loss": loss_l1,
        "num_fg": jnp.sum(tgt.num_fg) / jnp.maximum(jnp.sum(tgt.num_gt), 1.0),
    }
