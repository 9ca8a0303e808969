"""TSCD head (reference: yolox/models/tscd_head.py:26 — 1916 LoC there).

TPU-first redesign of the centerpiece. Differences from the reference that
are architectural (not behavioral):

- Fixed P proposal slots per frame with validity masks replace the ragged
  `preds_per_frame` bookkeeping (the reference's `minimal_limit` top-up,
  tscd_head.py:1592-1607, already pins the count in practice).
- Proposal selection, feature gather, MCA aggregation, Hungarian matching
  and refined decoding are all fixed-shape jit-compatible ops — the whole
  eval step is ONE compiled XLA program with zero host syncs.
- The matcher's temporal bank is an explicit `MatcherState` carry
  (see tscd_tpu.models.matching), so streaming eval threads it between
  steps and `resume=False` just means "pass a fresh state".
- Losses live in `tscd_tpu.train.losses.tscd_loss` as a pure function of
  the head outputs (the reference interleaves loss code in forward).

Structure mirrored: stems + cls/reg towers + extra video towers
(`cls_convs2`/`reg_convs2`, :240-281 — gated by vid_cls/vid_reg), per-level
WaveletsHFBlock edge extractor on the reg branch (:206-212), MCA cls
aggregator (`agg`, :104), decoupled reg aggregator (`agg_iou`, :113),
`RegMatcher` (:120), `fc_reg_matcher` (:123), `TaskAligned` (:128),
refined heads `cls_pred`/`matcher_obj_pred`/`matcher_reg_pred` (:130-133).
"""

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import box_cxcywh_to_xyxy
from ..ops.decode import decode_outputs
from ..ops.nms import batched_class_aware_nms
from ..ops.wavelets import WaveletsHFBlock
from .aggregation import MCAg2l
from .blocks import BaseConv, DWConv
from .matching import MatcherState, RegMatcher, TaskAligned, init_matcher_state
from .yolo_head import flatten_levels


class FrameProposals(NamedTuple):
    boxes: jax.Array       # (F, P, 4) xyxy pixels (still-detector boxes)
    obj: jax.Array         # (F, P) sigmoided objectness
    cls_conf: jax.Array    # (F, P) best class prob
    cls_id: jax.Array      # (F, P)
    cls_scores: jax.Array  # (F, P, C)
    idx: jax.Array         # (F, P) anchor index of each proposal
    valid: jax.Array       # (F, P) bool


def select_frame_proposals(decoded: jax.Array, num_classes: int, p: int,
                           conf_thresh: float, nms_thre: float,
                           use_pre_nms: bool, minimal_limit: int,
                           ota_fg: Optional[jax.Array] = None
                           ) -> FrameProposals:
    """Fixed-P proposal selection per frame (postprocess_widx,
    tscd_head.py:1546): score = obj * best-class prob. `p` is the
    physical slot count — the fixed-shape analog of the reference's
    `maximal_limit` top-k clamp (:1600-1607); `minimal_limit` is the
    validity floor (:1594-1599, proposals below conf_thresh are kept up
    to this rank). Optional class-aware pre-NMS. vmapped over F.

    `ota_fg` (F, A) bool injects SimOTA foreground anchors at train time
    (cat_ota_fg=True, :1583-1589): fg anchors are ranked first (always
    selected and valid, up to P), remaining slots fill by score."""

    def one(dec, fg):
        boxes = box_cxcywh_to_xyxy(dec[:, :4])
        obj = dec[:, 4]
        cls_scores = dec[:, 5:5 + num_classes]
        cls_conf = jnp.max(cls_scores, -1)
        cls_id = jnp.argmax(cls_scores, -1)
        score = obj * cls_conf
        if use_pre_nms:
            # postpro_woclass (post_process.py:464): rank top-750 by OBJ
            # conf alone, class-aware NMS scored by obj*cls, keep top-P
            # survivors — no conf gate (the reference keeps topK
            # regardless of threshold)
            pre = min(750, boxes.shape[0])
            top_o, top_i = jax.lax.top_k(obj, pre)
            nms_scores = top_o * cls_conf[top_i]
            keep = batched_class_aware_nms(
                boxes[top_i], nms_scores, cls_id[top_i],
                jnp.ones(pre, bool), nms_thre)
            surv = jnp.where(keep, nms_scores, -jnp.inf)
            out_s, pick = jax.lax.top_k(surv, p)
            idx = top_i[pick]
            valid = out_s > -jnp.inf
        elif fg is not None:
            # scores are sigmoid products in [0, 1]; +2 ranks every fg
            # anchor above every non-fg anchor
            key = score + 2.0 * fg.astype(score.dtype)
            _, idx = jax.lax.top_k(key, p)
            raw = score[idx]
            valid = (fg[idx] | (raw >= conf_thresh)
                     | (jnp.arange(p) < minimal_limit))
        else:
            out_s, idx = jax.lax.top_k(score, p)
            valid = (out_s >= conf_thresh) | (jnp.arange(p) < minimal_limit)
        return FrameProposals(boxes[idx], obj[idx], cls_conf[idx],
                              cls_id[idx], cls_scores[idx], idx, valid)

    if ota_fg is None:
        return jax.vmap(lambda d: one(d, None))(decoded)
    return jax.vmap(one)(decoded, ota_fg)


def decode_reg_offsets(offsets: jax.Array, still_boxes: jax.Array,
                       clip: float = math.log(736.0 / 32)) -> jax.Array:
    """dx/dy/dw/dh offsets + still-detector xyxy boxes -> refined xyxy
    (decode_reg_preds5, tscd_head.py:914)."""
    w = still_boxes[..., 2] - still_boxes[..., 0]
    h = still_boxes[..., 3] - still_boxes[..., 1]
    cx = still_boxes[..., 0] + 0.5 * w
    cy = still_boxes[..., 1] + 0.5 * h
    dx, dy = offsets[..., 0], offsets[..., 1]
    dw = jnp.minimum(offsets[..., 2], clip)
    dh = jnp.minimum(offsets[..., 3], clip)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


def encode_reg_targets(gt_cxcywh: jax.Array, still_boxes: jax.Array,
                       eps: float = 1e-8) -> jax.Array:
    """Inverse of decode_reg_offsets (encode_reg_preds, tscd_head.py:951)."""
    w = still_boxes[..., 2] - still_boxes[..., 0]
    h = still_boxes[..., 3] - still_boxes[..., 1]
    cx = still_boxes[..., 0] + 0.5 * w
    cy = still_boxes[..., 1] + 0.5 * h
    dx = (gt_cxcywh[..., 0] - cx) / w
    dy = (gt_cxcywh[..., 1] - cy) / h
    dw = jnp.log(gt_cxcywh[..., 2] / w + eps)
    dh = jnp.log(gt_cxcywh[..., 3] / h + eps)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


class TSCDHead(nn.Module):
    num_classes: int
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    in_channels: Sequence[int] = (256, 512, 1024)
    act: str = "silu"
    depthwise: bool = False
    heads: int = 4
    agg_type: str = "mca"            # 'mca' | 'mca_aware' | 'localagg'
    local_blocks: int = 1            # localagg transformer blocks
    decoder_layer_num: int = 1       # referring cross-attn layers (CAFM)
    num_proposals: int = 50          # physical slots P (= maximal_limit)
    minimal_limit: Optional[int] = None  # validity floor (None -> P)
    cat_ota_fg: bool = False         # inject SimOTA fg anchors at train
    pre_nms: float = 0.75
    sim_thresh: float = 0.75
    ave: bool = True
    test_conf: float = 0.001
    use_mask: bool = False
    conf_sim_thresh: float = 0.99    # obj-branch round-2 sim threshold
    use_pre_nms: bool = False        # TSCD-Large: False (vid_tscd_large.py)
    reconf: bool = True
    decouple_reg: bool = True
    vid_cls: bool = True
    vid_reg: bool = True
    sparse_vid_towers: bool = False  # eval-time proposal-patch towers
    prior_prob: float = 1e-2
    dtype: Any = jnp.float32

    def _bias_init(self):
        b = -math.log((1 - self.prior_prob) / self.prior_prob)
        return nn.initializers.constant(b)

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], time_embedding: jax.Array,
                 lframe: int, gframe: int, train: bool = False,
                 matcher_state: Optional[MatcherState] = None,
                 labels: Optional[jax.Array] = None,
                 stage: str = "full") -> Dict[str, Any]:
        """xin: 3 FPN levels, each (F, h, w, c), frames [local..., global...].
        time_embedding: (F, 256). `labels` (F, G, 5) enables the
        cat_ota_fg train-time proposal injection. Returns a dict of raw +
        refined outputs plus the new matcher state."""
        Conv = DWConv if self.depthwise else BaseConv
        hidden = int(256 * self.width)
        dt = self.dtype
        C = self.num_classes
        P = self.num_proposals

        # eval-only fast path: the vid towers + edge block are computed on
        # proposal patches (models/sparse_towers.py) instead of full maps
        # (>99% of dense tower outputs are never gathered). Exact-equal by
        # construction; BN must be in running-average mode.
        use_sparse = (self.sparse_vid_towers and not train
                      and self.vid_cls and self.vid_reg)
        # the edge features are consumed for ALL frames only by the
        # edge-aware aggregator; the default 'mca' path reads them for
        # the local frames alone (RegMatcher) — skip the global frames
        edge_all_frames = self.agg_type == "mca_aware"

        level_outputs, hw = [], []
        stem_feats = []
        cls_vid_feats, reg_vid_feats, edge_feats = [], [], []
        cls_tower_mods, reg_tower_mods, edge_mods = [], [], []
        F_all = xin[0].shape[0]
        for k, x in enumerate(xin):
            hw.append((x.shape[1], x.shape[2]))
            x = BaseConv(hidden, 1, 1, act=self.act, dtype=dt,
                         name=f"stem_{k}")(x, train)
            stem_feats.append(x)
            cls_f = x
            reg_f = x
            for i in range(2):
                cls_f = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                             name=f"cls_conv_{k}_{i}")(cls_f, train)
                reg_f = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                             name=f"reg_conv_{k}_{i}")(reg_f, train)
            cls_out = nn.Conv(C, (1, 1), dtype=dt, bias_init=self._bias_init(),
                              name=f"cls_pred_{k}")(cls_f)
            reg_out = nn.Conv(4, (1, 1), dtype=dt, name=f"reg_pred_{k}")(reg_f)
            obj_out = nn.Conv(1, (1, 1), dtype=dt, bias_init=self._bias_init(),
                              name=f"obj_pred_{k}")(reg_f)
            level_outputs.append(
                jnp.concatenate([reg_out, obj_out, cls_out], -1))

            # extra video towers (tscd_head.py:240-281)
            cls_tower_mods.append(
                [Conv(hidden, 3, 1, act=self.act, dtype=dt,
                      name=f"cls_conv2_{k}_{i}") for i in range(2)]
                if self.vid_cls else None)
            reg_tower_mods.append(
                [Conv(hidden, 3, 1, act=self.act, dtype=dt,
                      name=f"reg_conv2_{k}_{i}") for i in range(2)]
                if self.vid_reg else None)
            edge_mods.append(WaveletsHFBlock(dtype=dt, name=f"edge_{k}"))
            if not use_sparse:
                if self.vid_cls:
                    v = x
                    for m in cls_tower_mods[-1]:
                        v = m(v, train)
                    cls_vid_feats.append(v)
                else:
                    cls_vid_feats.append(cls_f)
                if self.vid_reg:
                    vr = x
                    for m in reg_tower_mods[-1]:
                        vr = m(vr, train)
                    reg_vid_feats.append(vr)
                else:
                    reg_vid_feats.append(reg_f)
                esrc = (reg_vid_feats[-1] if edge_all_frames
                        else reg_vid_feats[-1][:lframe])
                edge_feats.append(edge_mods[-1](esrc))

        raw_outputs = flatten_levels(level_outputs)       # (F, A, 5+C)
        if not use_sparse:
            cls_feat = flatten_levels(cls_vid_feats)      # (F, A, hid)
            reg_feat = flatten_levels(reg_vid_feats)
            edge_feat = flatten_levels(edge_feats)        # (F|L, A, hid)

        raw32 = raw_outputs.astype(jnp.float32)
        dec = decode_outputs(raw32, hw, self.strides)
        decoded = jnp.concatenate(
            [dec[..., :4], jax.nn.sigmoid(dec[..., 4:])], -1)

        out: Dict[str, Any] = {
            "raw_outputs": raw_outputs, "hw": hw, "decoded": decoded,
            "matcher_state": matcher_state,
        }

        # cat_ota_fg (tscd_head.py:1583-1589): run SimOTA here (the
        # reference's get_fg_idx-inside-forward, :1712) and rank its fg
        # anchors into the proposal slots; the loss reuses out["simota"]
        # gate on labels presence, not `train`: fix_bn training runs the
        # modules with train=False but still injects (labels are only
        # ever passed by the train steps)
        ota_fg = None
        if self.cat_ota_fg and labels is not None:
            from ..ops.decode import anchor_centers
            from ..ops.simota import simota_assign_batch
            from ..train.losses import labels_to_padded
            gt_boxes, gt_classes, gt_valid = labels_to_padded(labels)
            xs, ys, ss = anchor_centers(hw, self.strides)
            tgt = jax.lax.stop_gradient(simota_assign_batch(
                dec[..., :4], raw32[..., 4], raw32[..., 5:],
                gt_boxes, gt_classes, gt_valid,
                jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss)))
            out["simota"] = tgt
            ota_fg = tgt.fg_mask

        props = select_frame_proposals(
            jax.lax.stop_gradient(decoded), C, P, self.test_conf,
            self.pre_nms, self.use_pre_nms,
            P if self.minimal_limit is None else self.minimal_limit,
            ota_fg=ota_fg)
        out["proposals"] = props
        if stage == "dense":
            # profiling cut: towers + decode + proposal selection only
            # (tools/profile_eval.py measures aggregation/matcher time as
            # full - dense)
            return out

        # gather per-proposal features (find_feature_score, :976)
        if use_sparse:
            from .sparse_towers import sparse_vid_tower_features
            f_cls, f_reg, f_edge = sparse_vid_tower_features(
                stem_feats, hw, props.idx, cls_tower_mods, reg_tower_mods,
                edge_mods, lframe, edge_all_frames, train)
        else:
            take = jax.vmap(lambda feats, idx: feats[idx])
            f_cls = take(cls_feat, props.idx)             # (F, P, hid)
            f_reg = take(reg_feat, props.idx)
            f_edge = take(edge_feat,                      # (F|L, P, hid)
                          props.idx if edge_all_frames
                          else props.idx[:lframe])

        # cross-frame aggregation: cls branch (:480) and reg branch (:491)
        if self.agg_type == "localagg":
            # The reference TSCDHead constructs this branch
            # (LocalAggregation + Linear(width) cls/obj/reg preds,
            # tscd_head.py:91-96) but its FORWARD is dead code upstream:
            # the localagg call site passes MCA-style args so every
            # reconf x ota combination raises (probed in
            # tests/test_torch_parity_train.py notes). This composition
            # follows the WORKING YOLOV++ localagg path
            # (v_plus_head.py:330-360) and keeps the TSCD output
            # contract: refined cls + matcher obj + reg offsets (no CAFM
            # matcher — the reference branch has none either).
            from .yolov_heads import LocalAggregation
            F = props.boxes.shape[0]
            Wpx = xin[0].shape[2] * self.strides[0]
            Hpx = xin[0].shape[1] * self.strides[0]
            agg_c, agg_r = LocalAggregation(
                self.heads, blocks=self.local_blocks, reconf=self.reconf,
                dtype=dt, name="agg")(
                f_cls.reshape(-1, hidden), f_reg.reshape(-1, hidden),
                props.boxes.reshape(-1, 4), props.cls_conf.reshape(-1),
                props.obj.reshape(-1), props.valid.reshape(-1),
                F, P, Wpx, Hpx)
            agg_c = agg_c.reshape(F, P, -1)[:lframe]
            agg_r = agg_r.reshape(F, P, -1)[:lframe]
            out["refined_cls_logits"] = nn.Dense(
                C, dtype=dt, name="cls_pred")(agg_c)
            if self.reconf:
                out["matcher_obj_logits"] = nn.Dense(
                    1, dtype=dt, name="obj_pred")(agg_r)[..., 0]
                out["matcher_reg_offsets"] = nn.Dense(
                    4, dtype=dt, name="reg_pred")(agg_r)
                out["refined_boxes"] = decode_reg_offsets(
                    out["matcher_reg_offsets"].astype(jnp.float32),
                    props.boxes[:lframe])
            return out
        if self.agg_type == "mca_aware":
            from .aggregation import MCAg2lAware
            agg_cls, _ = MCAg2lAware(4 * hidden, self.heads, reconf=False,
                                     dtype=dt, name="agg")(
                f_cls, f_reg, f_edge, props.cls_conf, props.obj,
                props.valid, lframe, sim_thresh=self.sim_thresh,
                ave=self.ave, use_mask=self.use_mask,
                conf_sim_thresh=self.conf_sim_thresh)
        else:
            agg_cls, _ = MCAg2l(4 * hidden, self.heads, reconf=False,
                                dtype=dt, name="agg")(
                f_cls, f_reg, props.cls_conf, props.obj, props.valid,
                lframe, sim_thresh=self.sim_thresh, ave=self.ave,
                use_mask=self.use_mask,
                conf_sim_thresh=self.conf_sim_thresh)

        if self.decouple_reg:
            if self.agg_type == "mca_aware":
                from .aggregation import MCAg2lAware
                agg_iou_cls, agg_obj = MCAg2lAware(
                    4 * hidden, self.heads, reconf=True, dtype=dt,
                    name="agg_iou")(
                    f_cls, f_reg, f_edge, props.cls_conf, props.obj,
                    props.valid, lframe, sim_thresh=self.sim_thresh,
                    ave=self.ave, use_mask=self.use_mask,
                    conf_sim_thresh=self.conf_sim_thresh)
            else:
                agg_iou_cls, agg_obj = MCAg2l(
                    4 * hidden, self.heads, reconf=True, dtype=dt,
                    name="agg_iou")(
                    f_cls, f_reg, props.cls_conf, props.obj, props.valid,
                    lframe, sim_thresh=self.sim_thresh, ave=self.ave,
                    use_mask=self.use_mask,
                    conf_sim_thresh=self.conf_sim_thresh)

            if matcher_state is None:
                matcher_state = init_matcher_state(P, hidden, 4 * hidden,
                                                   dtype=dt)
            matched, new_state = RegMatcher(
                num_heads=8, num_layers=self.decoder_layer_num, dtype=dt,
                name="local_reg_matcher")(
                f_reg[:lframe], agg_obj, agg_iou_cls, f_edge[:lframe],
                time_embedding[:lframe].astype(dt), props.valid[:lframe],
                matcher_state)
            out["matcher_state"] = new_state

            matched4 = nn.Dense(4 * hidden, dtype=dt,
                                name="fc_reg_matcher")(matched)  # (L, P, 4h)
            obj_refined = TaskAligned(num_heads=8, num_layers=1, dtype=dt,
                                      name="task_aligned")(
                matched4, agg_obj, props.valid[:lframe])

            if self.reconf:
                out["matcher_obj_logits"] = nn.Dense(
                    1, dtype=dt, name="matcher_obj_pred")(obj_refined)[..., 0]
                out["matcher_reg_offsets"] = nn.Dense(
                    4, dtype=dt, name="matcher_reg_pred")(matched4)

        out["refined_cls_logits"] = nn.Dense(C, dtype=dt,
                                             name="cls_pred")(agg_cls)

        if "matcher_reg_offsets" in out:
            out["refined_boxes"] = decode_reg_offsets(
                out["matcher_reg_offsets"].astype(jnp.float32),
                props.boxes[:lframe])
        return out
