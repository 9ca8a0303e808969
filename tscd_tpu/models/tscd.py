"""TSCD top model (reference: yolox/models/tscd.py:11).

Backbone (YOLOPAFPN) + TSCDHead over a frame window. The eval-time final
postprocess (replace scores/boxes with refined predictions, NMS) lives in
`tscd_eval_postprocess` so the jitted forward stays a pure function.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.postprocess import (Detections, postprocess_best_class,
                               postprocess_refined)
from .matching import MatcherState
from .pafpn import YOLOPAFPN
from .tscd_head import TSCDHead


class TSCD(nn.Module):
    num_classes: int = 30
    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    num_proposals: int = 50
    minimal_limit: Optional[int] = None
    cat_ota_fg: bool = False
    heads: int = 4
    agg_type: str = "mca"            # 'mca' | 'mca_aware' | 'localagg'
    local_blocks: int = 1
    decoder_layer_num: int = 1
    reconf: bool = True
    decouple_reg: bool = True
    use_pre_nms: bool = False
    sim_thresh: float = 0.75
    conf_sim_thresh: float = 0.99
    test_conf: float = 0.001
    sparse_vid_towers: bool = False
    # rematerialize backbone activations in the backward pass
    # (jax.checkpoint): trades ~1 extra backbone forward for the
    # activation memory of the full frame window — enables longer
    # training windows (e.g. F=16 at 576px) on one chip
    remat_backbone: bool = False
    # stage-2 recipe: the backbone is fully frozen
    # (vid_tscd_large.py:111-143 sets requires_grad=False, which makes
    # torch SKIP the backbone backward). The repo's optimizer-mask
    # freeze still computes those grads; this flag stop_gradients the
    # FPN outputs instead — identical updates (tests/test_remat.py::
    # test_stop_backbone_grad_same_updates), backbone backward removed
    stop_backbone_grad: bool = False
    # "MCSP" (CSPDarknet) | "Swin_Tiny" | "Swin_Base" | "Focal" — the
    # reference exp wiring (exps/TSCD_OVIS/ovis_tscd_base.py:55-99)
    backbone_name: str = "MCSP"
    dtype: Any = jnp.float32

    def setup(self):
        from .pafpn_variants import build_pafpn_backbone
        # remat static_argnums: (module, x, train) — `train` must stay
        # a Python bool through the checkpoint wrapper
        self.backbone = build_pafpn_backbone(
            self.backbone_name, self.depth, self.width, act=self.act,
            depthwise=self.depthwise, dtype=self.dtype,
            remat=self.remat_backbone)
        self.head = TSCDHead(
            num_classes=self.num_classes, width=self.width, act=self.act,
            depthwise=self.depthwise, heads=self.heads,
            agg_type=self.agg_type, local_blocks=self.local_blocks,
            decoder_layer_num=self.decoder_layer_num,
            num_proposals=self.num_proposals,
            minimal_limit=self.minimal_limit, cat_ota_fg=self.cat_ota_fg,
            reconf=self.reconf,
            decouple_reg=self.decouple_reg, use_pre_nms=self.use_pre_nms,
            sim_thresh=self.sim_thresh,
            conf_sim_thresh=self.conf_sim_thresh,
            test_conf=self.test_conf,
            sparse_vid_towers=self.sparse_vid_towers,
            dtype=self.dtype)

    def __call__(self, x: jax.Array, time_embedding: jax.Array,
                 lframe: int, gframe: int, train: bool = False,
                 matcher_state: Optional[MatcherState] = None,
                 labels: Optional[jax.Array] = None,
                 stage: str = "full"):
        """x: (F, H, W, 3) frame window [local..., global...];
        time_embedding: (F, 256); labels (F, G, 5) at train time for the
        cat_ota_fg proposal injection. `stage` is a static profiling cut
        ('backbone' | 'dense' | 'full')."""
        fpn_outs = self.backbone(x, train)
        if self.stop_backbone_grad:
            fpn_outs = jax.lax.stop_gradient(fpn_outs)
        if stage == "backbone":
            return fpn_outs
        return self.head(fpn_outs, time_embedding, lframe, gframe,
                         train=train, matcher_state=matcher_state,
                         labels=labels, stage=stage)


def tscd_eval_postprocess(head_out, lframe: int, num_classes: int,
                          nms_thresh: float = 0.5, conf_thre: float = 0.001,
                          out_k: int = 100):
    """Final eval postprocess for the refined predictions
    (reference tscd_head.py:726 -> post_process.py:9): per local frame,
    replace obj with sigmoid(matcher_obj), class scores with
    sigmoid(refined cls), boxes with the matcher-decoded boxes, then
    class-aware NMS. Returns (refined Detections, original Detections)
    batched over local frames."""
    props = head_out["proposals"]
    cls_scores_ref = jax.nn.sigmoid(
        head_out["refined_cls_logits"].astype(jnp.float32))    # (L, P, C)
    if "matcher_obj_logits" in head_out:
        obj_ref = jax.nn.sigmoid(
            head_out["matcher_obj_logits"].astype(jnp.float32))  # (L, P)
    else:
        obj_ref = props.obj[:lframe]
    boxes_ref = head_out.get("refined_boxes", props.boxes[:lframe])

    def one(boxes, obj, cls_scores, valid):
        return postprocess_refined(boxes, obj, cls_scores, valid,
                                   conf_thre, nms_thresh, out_k)

    refined = jax.vmap(one)(boxes_ref, obj_ref, cls_scores_ref,
                            props.valid[:lframe])

    # the original (still-detector) branch keeps each proposal's best
    # class only — no per-class expansion (post_process.py:69-81)
    def one_ori(boxes, obj, cls_conf, cls_id, valid):
        return postprocess_best_class(boxes, obj, cls_conf, cls_id, valid,
                                      conf_thre, nms_thresh, out_k)

    original = jax.vmap(one_ori)(
        props.boxes[:lframe], props.obj[:lframe], props.cls_conf[:lframe],
        props.cls_id[:lframe], props.valid[:lframe])
    return refined, original
