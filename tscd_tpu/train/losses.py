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
