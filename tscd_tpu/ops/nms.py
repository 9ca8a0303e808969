"""Fixed-shape NMS for TPU.

The reference relies on torchvision's dynamic-shape `batched_nms`
(yolox/models/post_process.py:9,464; yolox/utils/boxes.py:33). Dynamic
shapes break XLA, so we use the framework-wide convention: every stage
returns a FIXED number of slots plus a validity mask.

Algorithm: greedy score-ordered suppression expressed as a sequential scan
over the pre-sorted top-K candidates. keep[i] = valid[i] and no
higher-scoring kept box overlaps it above `iou_threshold` — identical
survivor set to torchvision NMS (score-sorted, stable).

The O(K^2) IoU matrix is one big vectorized op (MXU/VPU friendly); the
scan is K lightweight vector steps. For proposal selection K<=750.
Class-aware NMS uses the coordinate-offset trick (same as torchvision
batched_nms): shift each class's boxes to disjoint regions.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou_xyxy


def nms_fixed(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
              iou_threshold: float) -> jax.Array:
    """Greedy NMS over fixed K slots.

    Args:
      boxes: (K, 4) xyxy.
      scores: (K,) — used for ordering.
      valid: (K,) bool — invalid slots can neither keep nor suppress.
      iou_threshold: suppression threshold.

    Returns:
      keep: (K,) bool mask of surviving boxes.
    """
    k = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    boxes_s = boxes[order]
    valid_s = valid[order]
    iou = pairwise_iou_xyxy(boxes_s, boxes_s)
    overlap = iou > iou_threshold  # (K, K) in score order

    def body(keep, i):
        # suppressed if any earlier kept box overlaps it
        earlier = jnp.arange(k) < i
        suppressed = jnp.any(overlap[i] & keep & earlier)
        keep = keep.at[i].set(valid_s[i] & ~suppressed)
        return keep, None

    keep_s, _ = jax.lax.scan(body, jnp.zeros((k,), bool), jnp.arange(k))
    # unsort
    keep = jnp.zeros((k,), bool).at[order].set(keep_s)
    return keep


def batched_class_aware_nms(boxes: jax.Array, scores: jax.Array,
                            class_ids: jax.Array, valid: jax.Array,
                            iou_threshold: float) -> jax.Array:
    """Class-aware NMS via per-class coordinate offsets (one pass)."""
    span = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offset = class_ids.astype(boxes.dtype)[:, None] * span
    shifted = boxes + offset
    return nms_fixed(shifted, scores, valid, iou_threshold)


@functools.partial(jax.jit, static_argnames=("top_k", "out_k"))
def topk_nms_select(boxes: jax.Array, scores: jax.Array, class_ids: jax.Array,
                    valid: jax.Array, iou_threshold: float,
                    top_k: int, out_k: int
                    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Select top_k candidates by score, NMS, return out_k survivors.

    Public utility for custom pipelines; the framework's own proposal
    path is ops/postprocess.select_proposals (obj-ranked pre-NMS per
    postpro_woclass) — keep their NMS semantics in sync.

    Returns (boxes (out_k,4), scores (out_k,), class_ids (out_k,),
    keep_mask (out_k,), src_idx (out_k,)) where src_idx indexes the input
    slots; dead slots have keep_mask False.
    """
    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, top_k)
    top_valid = top_scores > -jnp.inf
    keep = batched_class_aware_nms(boxes[top_idx], top_scores,
                                   class_ids[top_idx], top_valid, iou_threshold)
    # rank survivors first (stable by score order since top_k is sorted)
    surv_scores = jnp.where(keep, top_scores, -jnp.inf)
    out_scores, pick = jax.lax.top_k(surv_scores, out_k)
    out_idx = top_idx[pick]
    out_keep = out_scores > -jnp.inf
    return boxes[out_idx], out_scores, class_ids[out_idx], out_keep, out_idx
