"""DETR-style transformer decoder + Hungarian set criterion (reference:
yolox/models/decoder.py — TransformerDecoder:20, SetCriterion:394 — and
matcher.py HungarianMatcher:12; experimental in the reference, not wired
into the TSCD exps, provided for capability parity).

TPU-first: fixed Q query slots, fixed padded GT with validity masks, the
Hungarian match runs on-device (tscd_tpu.ops.hungarian) inside the jitted
loss — no scipy host sync.
"""

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import box_cxcywh_to_xyxy, pairwise_iou_xyxy
from ..ops.hungarian import masked_linear_sum_assignment


class DecoderLayer(nn.Module):
    dim: int
    heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: jax.Array, memory: jax.Array,
                 query_pos: jax.Array,
                 memory_valid: Optional[jax.Array] = None) -> jax.Array:
        dt = self.dtype
        q = tgt + query_pos
        sa = nn.MultiHeadDotProductAttention(
            self.heads, dtype=dt, name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(dtype=dt, name="norm1")(tgt + sa)
        mask = (memory_valid[None, None, None, :]
                if memory_valid is not None else None)
        ca = nn.MultiHeadDotProductAttention(
            self.heads, dtype=dt, name="cross_attn")(
            tgt + query_pos, memory, memory, mask=mask)
        tgt = nn.LayerNorm(dtype=dt, name="norm2")(tgt + ca)
        f = nn.Dense(self.ffn_dim, dtype=dt, name="ffn1")(tgt)
        f = nn.Dense(self.dim, dtype=dt, name="ffn2")(nn.relu(f))
        return nn.LayerNorm(dtype=dt, name="norm3")(tgt + f)


class TransformerDecoder(nn.Module):
    """(decoder.py:20): learned object queries decode against flattened
    feature memory; per-layer cls + box heads (aux outputs stacked)."""

    num_classes: int
    dim: int = 256
    heads: int = 8
    num_layers: int = 6
    num_queries: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, memory: jax.Array,
                 memory_valid: Optional[jax.Array] = None
                 ) -> Dict[str, jax.Array]:
        """memory: (N, C) flattened features. Returns dict with
        pred_logits (L, Q, C+1) and pred_boxes (L, Q, 4) cxcywh in
        [0, 1] (all decoder layers for aux loss)."""
        Q = self.num_queries
        query_pos = self.param("query_embed",
                               nn.initializers.normal(1.0),
                               (Q, self.dim))
        memory = nn.Dense(self.dim, dtype=self.dtype,
                          name="input_proj")(memory)
        tgt = jnp.zeros((Q, self.dim), self.dtype)
        logits_all, boxes_all = [], []
        for l in range(self.num_layers):
            tgt = DecoderLayer(self.dim, self.heads, dtype=self.dtype,
                               name=f"layer{l}")(
                tgt, memory, query_pos.astype(self.dtype), memory_valid)
            logits_all.append(nn.Dense(self.num_classes + 1,
                                       dtype=self.dtype,
                                       name=f"cls_{l}")(tgt))
            b = nn.Dense(4, dtype=self.dtype, name=f"box_{l}")(tgt)
            boxes_all.append(jax.nn.sigmoid(b.astype(jnp.float32)))
        return {"pred_logits": jnp.stack(logits_all),
                "pred_boxes": jnp.stack(boxes_all)}


def hungarian_match(pred_logits: jax.Array, pred_boxes: jax.Array,
                    gt_classes: jax.Array, gt_boxes: jax.Array,
                    gt_valid: jax.Array,
                    cost_class: float = 1.0, cost_bbox: float = 5.0,
                    cost_giou: float = 2.0) -> jax.Array:
    """(matcher.py:12) on-device: returns col4row (Q,) mapping each query
    slot to a (padded) gt slot; pad queries/gts to the same size first.
    Q must equal padded gt count G."""
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), -1)
    cls_cost = -prob[:, gt_classes]                       # (Q, G)
    l1 = jnp.sum(jnp.abs(pred_boxes[:, None] - gt_boxes[None]), -1)
    iou = pairwise_iou_xyxy(box_cxcywh_to_xyxy(pred_boxes),
                            box_cxcywh_to_xyxy(gt_boxes))
    cost = cost_class * cls_cost + cost_bbox * l1 + cost_giou * (-iou)
    return masked_linear_sum_assignment(
        cost, jnp.ones(cost.shape[0], bool), gt_valid)


def set_criterion(outputs: Dict[str, jax.Array], gt_classes: jax.Array,
                  gt_boxes: jax.Array, gt_valid: jax.Array,
                  num_classes: int, eos_coef: float = 0.1
                  ) -> Dict[str, jax.Array]:
    """(decoder.py SetCriterion:394): Hungarian-matched CE + L1 + GIoU
    over all decoder layers (aux losses included). gt padded to Q slots."""
    L, Q, _ = outputs["pred_logits"].shape
    num_gt = jnp.maximum(jnp.sum(gt_valid), 1)
    losses = {"loss_ce": 0.0, "loss_bbox": 0.0, "loss_giou": 0.0}
    for l in range(L):
        logits = outputs["pred_logits"][l].astype(jnp.float32)
        boxes = outputs["pred_boxes"][l]
        col4row = jax.lax.stop_gradient(hungarian_match(
            logits, boxes, gt_classes, gt_boxes, gt_valid))
        matched_valid = gt_valid[col4row]
        tgt_cls = jnp.where(matched_valid, gt_classes[col4row],
                            num_classes)          # no-object class
        w = jnp.where(matched_valid, 1.0, eos_coef)
        ce = -jax.nn.log_softmax(logits, -1)[jnp.arange(Q), tgt_cls]
        losses["loss_ce"] += jnp.sum(ce * w) / jnp.sum(w)
        tgt_box = gt_boxes[col4row]
        l1 = jnp.sum(jnp.abs(boxes - tgt_box), -1)
        losses["loss_bbox"] += jnp.sum(
            l1 * matched_valid) / num_gt
        iou = pairwise_iou_xyxy(box_cxcywh_to_xyxy(boxes),
                                box_cxcywh_to_xyxy(tgt_box))
        giou_l = 1.0 - jnp.diag(iou)
        losses["loss_giou"] += jnp.sum(
            giou_l * matched_valid) / num_gt
    losses = {k: v / L for k, v in losses.items()}
    losses["total_loss"] = (losses["loss_ce"] + 5.0 * losses["loss_bbox"]
                            + 2.0 * losses["loss_giou"])
    return losses
