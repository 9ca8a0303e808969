"""Box geometry ops (reference: yolox/utils/boxes.py, box_op.py).

All functions are pure jnp, fixed-shape, safe under jit/vmap.
Boxes are either cxcywh (center x/y, width, height) or xyxy.
"""

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def box_xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def _pairwise_iou_union(a: jax.Array, b: jax.Array):
    """Shared IoU/union core: a (N,4), b (M,4) xyxy -> ((N,M), (N,M))."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0.0) * jnp.clip(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter, union


def pairwise_iou_xyxy(a: jax.Array, b: jax.Array, eps: float = 1e-16) -> jax.Array:
    """IoU between every pair: a (N,4), b (M,4) xyxy -> (N,M)."""
    inter, union = _pairwise_iou_union(a, b)
    return inter / (union + eps)


def bboxes_iou(a: jax.Array, b: jax.Array, xyxy: bool = True,
               eps: float = 1e-16) -> jax.Array:
    """Pairwise IoU matching yolox/utils/boxes.py:131 semantics.

    a (N,4), b (M,4); xyxy=False means cxcywh input.
    """
    if not xyxy:
        a = box_cxcywh_to_xyxy(a)
        b = box_cxcywh_to_xyxy(b)
    return pairwise_iou_xyxy(a, b, eps)


def generalized_box_iou(a: jax.Array, b: jax.Array, eps: float = 1e-16) -> jax.Array:
    """Pairwise GIoU, xyxy input (yolox/utils/box_op.py:124)."""
    inter, union = _pairwise_iou_union(a, b)
    iou = inter / (union + eps)
    tl = jnp.minimum(a[:, None, :2], b[None, :, :2])
    br = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    area_c = wh[..., 0] * wh[..., 1]
    return iou - (area_c - union) / (area_c + eps)


def ciou_xyxy(pred: jax.Array, target: jax.Array,
              eps: float = 1e-7) -> jax.Array:
    """Elementwise Complete-IoU on aligned xyxy boxes (..., 4) -> (...,).

    IoU - center-distance/enclosing-diagonal - aspect-ratio consistency
    (the box loss the DFL head is trained with; see ops/tal.py header)."""
    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target[..., i] for i in range(4))
    pw, ph = px2 - px1, py2 - py1
    tw, th = tx2 - tx1, ty2 - ty1
    inter = (jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0.0)
             * jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0.0))
    union = pw * ph + tw * th - inter + eps
    iou = inter / union
    cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    ch = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    c2 = cw * cw + ch * ch + eps
    rho2 = (((px1 + px2 - tx1 - tx2) ** 2
             + (py1 + py2 - ty1 - ty2) ** 2) / 4.0)
    v = (4.0 / (jnp.pi ** 2)) * jnp.square(
        jnp.arctan(tw / jnp.maximum(th, eps))
        - jnp.arctan(pw / jnp.maximum(ph, eps)))
    alpha = v / (v - iou + (1.0 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def iou_loss_cxcywh(pred: jax.Array, target: jax.Array,
                    loss_type: str = "iou", eps: float = 1e-16) -> jax.Array:
    """Elementwise IoU loss on aligned cxcywh boxes
    (reference yolox/models/losses.py:9 — 'iou' variant is 1 - iou^2)."""
    tl = jnp.maximum(pred[..., :2] - pred[..., 2:] / 2,
                     target[..., :2] - target[..., 2:] / 2)
    br = jnp.minimum(pred[..., :2] + pred[..., 2:] / 2,
                     target[..., :2] + target[..., 2:] / 2)
    area_p = pred[..., 2] * pred[..., 3]
    area_g = target[..., 2] * target[..., 3]
    en = jnp.all(tl < br, axis=-1).astype(pred.dtype)
    wh = br - tl
    area_i = wh[..., 0] * wh[..., 1] * en
    area_u = area_p + area_g - area_i
    iou = area_i / (area_u + eps)
    if loss_type == "iou":
        return 1.0 - iou ** 2
    if loss_type == "giou":
        c_tl = jnp.minimum(pred[..., :2] - pred[..., 2:] / 2,
                           target[..., :2] - target[..., 2:] / 2)
        c_br = jnp.maximum(pred[..., :2] + pred[..., 2:] / 2,
                           target[..., :2] + target[..., 2:] / 2)
        c_wh = c_br - c_tl
        area_c = jnp.clip(c_wh[..., 0] * c_wh[..., 1], eps)
        giou = iou - (area_c - area_u) / area_c
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(loss_type)
