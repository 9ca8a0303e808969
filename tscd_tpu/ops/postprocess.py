"""Fixed-shape detection post-processing.

Counterparts of the reference's dynamic-shape stages:
- `select_proposals`  <-> postpro_woclass (yolox/models/post_process.py:464):
  top-750 by obj conf -> class-aware NMS(0.75) scored by obj*cls_conf ->
  first P survivors (score order). Fixed P slots + validity mask.
- `postprocess_refined` <-> postprocess (post_process.py:9): per-proposal
  per-class expansion of refined cls scores above conf_thre, scored
  obj*cls, class-aware NMS, fixed out_k slots.

Detection row convention: (x1, y1, x2, y2, obj, score, cls) like the
reference's 7-column layout.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .boxes import box_cxcywh_to_xyxy
from .nms import batched_class_aware_nms


class Proposals(NamedTuple):
    boxes: jax.Array      # (P, 4) xyxy pixels
    obj: jax.Array        # (P,) objectness (sigmoided)
    cls_conf: jax.Array   # (P,) best class prob
    cls_id: jax.Array     # (P,) int
    cls_scores: jax.Array  # (P, C) all class probs
    idx: jax.Array        # (P,) source anchor index
    mask: jax.Array       # (P,) bool validity


def select_proposals(decoded: jax.Array, num_classes: int,
                     nms_thre: float = 0.75, top_k: int = 30,
                     pre_topk: int = 750) -> Proposals:
    """Single-image proposal selection from (A, 5+C) decoded predictions
    (cxcywh pixels, sigmoided obj/cls). vmap over frames."""
    boxes = box_cxcywh_to_xyxy(decoded[:, :4])
    obj = decoded[:, 4]
    cls_scores = decoded[:, 5:5 + num_classes]
    cls_conf = jnp.max(cls_scores, axis=-1)
    cls_id = jnp.argmax(cls_scores, axis=-1)

    # pre-rank by obj conf alone (reference :506-508)
    top_obj, sort_idx = jax.lax.top_k(obj, pre_topk)
    nms_scores = top_obj * cls_conf[sort_idx]
    keep = batched_class_aware_nms(boxes[sort_idx], nms_scores,
                                   cls_id[sort_idx], jnp.ones(pre_topk, bool),
                                   nms_thre)
    # first top_k survivors in descending obj*cls order (NMS output order)
    surv = jnp.where(keep, nms_scores, -jnp.inf)
    pick_scores, pick = jax.lax.top_k(surv, top_k)
    mask = pick_scores > -jnp.inf
    src = sort_idx[pick]
    return Proposals(boxes[src], obj[src], cls_conf[src], cls_id[src],
                     cls_scores[src], src, mask)


select_proposals_batch = jax.vmap(select_proposals,
                                  in_axes=(0,) + (None,) * 4)


class Detections(NamedTuple):
    boxes: jax.Array   # (K, 4) xyxy
    obj: jax.Array     # (K,)
    score: jax.Array   # (K,) class prob (NMS key = obj*score)
    cls_id: jax.Array  # (K,) int
    mask: jax.Array    # (K,) bool


def postprocess_refined(boxes: jax.Array, obj: jax.Array,
                        cls_scores: jax.Array, valid: jax.Array,
                        conf_thre: float = 0.001, nms_thre: float = 0.5,
                        out_k: int = 100) -> Detections:
    """Final per-frame postprocess over P proposals with (P, C) refined
    class probabilities (reference post_process.py:9 cls_loc expansion):
    every (proposal, class) pair with cls prob >= conf_thre and
    obj*cls >= conf_thre enters class-aware NMS with score obj*cls.
    """
    P, C = cls_scores.shape
    pair_boxes = jnp.repeat(boxes, C, axis=0)              # (P*C, 4)
    pair_obj = jnp.repeat(obj, C)
    pair_cls = jnp.tile(jnp.arange(C), P)
    pair_score = cls_scores.reshape(-1)
    pair_valid = (jnp.repeat(valid, C)
                  & (pair_score >= conf_thre)
                  & (pair_obj * pair_score >= conf_thre))
    nms_key = pair_obj * pair_score
    keep = batched_class_aware_nms(pair_boxes, nms_key, pair_cls,
                                   pair_valid, nms_thre)
    surv = jnp.where(keep, nms_key, -jnp.inf)
    out_scores, pick = jax.lax.top_k(surv, min(out_k, P * C))
    mask = out_scores > -jnp.inf
    return Detections(pair_boxes[pick], pair_obj[pick], pair_score[pick],
                      pair_cls[pick], mask)


def postprocess_best_class(boxes: jax.Array, obj: jax.Array,
                           cls_conf: jax.Array, cls_id: jax.Array,
                           valid: jax.Array, conf_thre: float = 0.001,
                           nms_thre: float = 0.5,
                           out_k: int = 100) -> Detections:
    """Per-frame postprocess keeping only each proposal's best class —
    the reference's `result_ori` branch (post_process.py:69-81): no
    per-class expansion, conf gate on obj*cls, class-aware NMS."""
    P = boxes.shape[0]
    key = obj * cls_conf
    ok = valid & (key >= conf_thre)
    keep = batched_class_aware_nms(boxes, key, cls_id, ok, nms_thre)
    surv = jnp.where(keep, key, -jnp.inf)
    out_scores, pick = jax.lax.top_k(surv, min(out_k, P))
    mask = out_scores > -jnp.inf
    return Detections(boxes[pick], obj[pick], cls_conf[pick],
                      cls_id[pick], mask)


def postprocess_dense(decoded: jax.Array, num_classes: int,
                      conf_thre: float = 0.7, nms_thre: float = 0.45,
                      out_k: int = 100) -> Detections:
    """Still-image postprocess on dense (A, 5+C) decoded predictions
    (yolox/utils/boxes.py:33 semantics: best class only)."""
    boxes = box_cxcywh_to_xyxy(decoded[:, :4])
    obj = decoded[:, 4]
    cls_scores = decoded[:, 5:5 + num_classes]
    cls_conf = jnp.max(cls_scores, axis=-1)
    cls_id = jnp.argmax(cls_scores, axis=-1)
    score = obj * cls_conf
    valid = score >= conf_thre
    # cap candidates to keep NMS cheap; 2k >> typical survivor count
    cand_scores, cand = jax.lax.top_k(jnp.where(valid, score, -jnp.inf),
                                      min(2048, boxes.shape[0]))
    cand_valid = cand_scores > -jnp.inf
    keep = batched_class_aware_nms(boxes[cand], cand_scores, cls_id[cand],
                                   cand_valid, nms_thre)
    surv = jnp.where(keep, cand_scores, -jnp.inf)
    out_scores, pick = jax.lax.top_k(surv, min(out_k, surv.shape[0]))
    src = cand[pick]
    mask = out_scores > -jnp.inf
    return Detections(boxes[src], obj[src], cls_conf[src], cls_id[src], mask)


postprocess_dense_batch = jax.vmap(postprocess_dense,
                                   in_axes=(0,) + (None,) * 4)
