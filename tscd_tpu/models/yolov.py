"""YOLOV family top models (reference: yolox/models/myolox.py:8,
yolov_plus.py:8, yolov_online.py:8 — thin backbone+head wrappers)."""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.postprocess import postprocess_refined
from .yolov_heads import OnlineBank, YOLOVHead, YOLOVOnlineHead, YOLOVPlusHead


class YOLOV(nn.Module):
    """YOLOV (gframe-only MSA aggregation)."""

    num_classes: int = 30
    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    num_proposals: int = 30
    heads: int = 4
    reconf: bool = False
    sim_thresh: float = 0.75
    backbone_name: str = "MCSP"
    dtype: Any = jnp.float32

    def setup(self):
        from .pafpn_variants import build_pafpn_backbone
        self.backbone = build_pafpn_backbone(
            self.backbone_name, self.depth, self.width, act=self.act,
            depthwise=self.depthwise, dtype=self.dtype)
        self.head = YOLOVHead(
            num_classes=self.num_classes, width=self.width, act=self.act,
            depthwise=self.depthwise, heads=self.heads,
            num_proposals=self.num_proposals, reconf=self.reconf,
            sim_thresh=self.sim_thresh, dtype=self.dtype)

    def __call__(self, x: jax.Array, lframe: int = 0, gframe: int = 16,
                 train: bool = False):
        fpn_outs = self.backbone(x, train)
        return self.head(fpn_outs, lframe, gframe, train)


class YOLOVPlus(nn.Module):
    """YOLOV++ (agg_type switch + decoupled reg/obj aggregation)."""

    num_classes: int = 30
    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    num_proposals: int = 30
    heads: int = 4
    reconf: bool = True
    decouple_reg: bool = True
    agg_type: str = "mca"
    sim_thresh: float = 0.75
    conf_sim_thresh: float = 0.99
    backbone_name: str = "MCSP"
    dtype: Any = jnp.float32

    def setup(self):
        from .pafpn_variants import build_pafpn_backbone
        self.backbone = build_pafpn_backbone(
            self.backbone_name, self.depth, self.width, act=self.act,
            depthwise=self.depthwise, dtype=self.dtype)
        self.head = YOLOVPlusHead(
            num_classes=self.num_classes, width=self.width, act=self.act,
            depthwise=self.depthwise, heads=self.heads,
            num_proposals=self.num_proposals, reconf=self.reconf,
            decouple_reg=self.decouple_reg, agg_type=self.agg_type,
            sim_thresh=self.sim_thresh,
            conf_sim_thresh=self.conf_sim_thresh, dtype=self.dtype)

    def __call__(self, x: jax.Array, lframe: int, gframe: int,
                 time_embedding: Optional[jax.Array] = None,
                 train: bool = False):
        fpn_outs = self.backbone(x, train)
        return self.head(fpn_outs, lframe, gframe, time_embedding, train)


class YOLOVOnline(nn.Module):
    """Streaming YOLOV with a device-resident ring-buffer feature bank."""

    num_classes: int = 30
    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    num_proposals: int = 30
    heads: int = 4
    sim_thresh: float = 0.75
    backbone_name: str = "MCSP"
    dtype: Any = jnp.float32

    def setup(self):
        from .pafpn_variants import build_pafpn_backbone
        self.backbone = build_pafpn_backbone(
            self.backbone_name, self.depth, self.width, act=self.act,
            depthwise=self.depthwise, dtype=self.dtype)
        self.head = YOLOVOnlineHead(
            num_classes=self.num_classes, width=self.width, act=self.act,
            depthwise=self.depthwise, heads=self.heads,
            num_proposals=self.num_proposals, sim_thresh=self.sim_thresh,
            dtype=self.dtype)

    def __call__(self, x: jax.Array, bank: OnlineBank,
                 train: bool = False):
        fpn_outs = self.backbone(x, train)
        return self.head(fpn_outs, bank, train)

    def window(self, xs: jax.Array, bank: OnlineBank,
               train: bool = False):
        """K frames in ONE compiled program: batched backbone (the
        MXU-heavy part runs at batch K), head unrolled per frame with
        the bank threaded in-graph. Semantically identical to K
        single-frame calls (pinned by tests/test_online_batch.py), but
        it amortizes the per-dispatch overhead that caps batch-1
        streaming at ~64 fps on this rig (PROFILE.md §latency:
        F=2/4/8 -> 164/267/418 fps). Returns (stacked outputs with
        leading dim K, final bank)."""
        fpn_outs = self.backbone(xs, train)
        outs = []
        for f in range(xs.shape[0]):
            o = self.head([lvl[f:f + 1] for lvl in fpn_outs], bank,
                          train)
            bank = o["bank"]
            outs.append({k: v for k, v in o.items() if k != "bank"})
        stacked = jax.tree_util.tree_map(
            lambda *ls: (jnp.concatenate(ls, 0)
                         if getattr(ls[0], "ndim", 0) > 0
                         else jnp.stack(ls)), *outs)
        # hw is per-level static metadata, not per-frame — keep one copy
        stacked["hw"] = outs[0]["hw"]
        return stacked, bank


def yolov_eval_postprocess(head_out, num_frames: int, num_classes: int,
                           nms_thresh: float = 0.5,
                           conf_thre: float = 0.001, out_k: int = 100):
    """Replace cls (and obj with reconf) scores with the refined ones,
    keep still-detector boxes, class-aware NMS (yolovp_msa eval path)."""
    props = head_out["proposals"]
    cls_ref = jax.nn.sigmoid(
        head_out["refined_cls_logits"].astype(jnp.float32))
    if "refined_obj_logits" in head_out:
        obj = jax.nn.sigmoid(
            head_out["refined_obj_logits"].astype(jnp.float32))
    else:
        obj = props.obj[:num_frames]

    def one(boxes, o, cs, valid):
        return postprocess_refined(boxes, o, cs, valid, conf_thre,
                                   nms_thresh, out_k)

    refined = jax.vmap(one)(props.boxes[:num_frames], obj,
                            cls_ref[:num_frames], props.valid[:num_frames])
    original = jax.vmap(one)(props.boxes[:num_frames],
                             props.obj[:num_frames],
                             props.cls_scores[:num_frames],
                             props.valid[:num_frames])
    return refined, original
