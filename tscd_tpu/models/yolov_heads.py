"""YOLOV family heads (reference: yolox/models/yolovp_msa.py:22 YOLOV,
v_plus_head.py:24 YOLOV++, yolov_msa_online.py:27 online YOLOV) and the
LocalAggregation location-relation attention (post_trans.py:972).

TPU-first structure shared with TSCDHead: fixed P proposal slots with
validity masks; proposal selection, feature gather and aggregation are
one jitted fixed-shape program (the reference loops frames in Python and
calls dynamic-shape NMS).

Differences among family members (mirroring the reference):
- YOLOV: global MSA self-attention over ALL frames' proposals jointly
  (gframe-only windows); refined cls (+ optional reconf obj).
- YOLOV++: adds agg_type 'localagg'|'msa' switch and decouple_reg (a
  second aggregator produces obj from the reg branch); refined labels in
  ota_mode come from SimOTA at the proposal anchors (handled by
  tscd_tpu.train.losses).
- Online YOLOV: one local frame + explicit rolling feature banks (main +
  local msa memory) carried between calls as a device-resident
  OnlineBank — no host-side list juggling like the reference demo.
"""

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import decode_outputs
from ..ops.wavelets import WaveletsHFBlock
from .aggregation import MCAg2l, MSAYolov, _l2norm, _merge_heads, _split_heads
from .blocks import BaseConv, DWConv
from .matching import extract_position_embedding, extract_position_matrix
from .tscd_head import FrameProposals, select_frame_proposals
from .yolo_head import flatten_levels

NEG = -1e9


def pure_position_embedding(boxes: jax.Array, width: int,
                            height: int) -> jax.Array:
    """(N, 4) xyxy -> (N, 4) log absolute geometry
    (yolox/utils/box_op.py:84)."""
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    cx = 0.5 * (boxes[:, 0] + boxes[:, 2])
    cy = 0.5 * (boxes[:, 1] + boxes[:, 3])
    return jnp.stack([jnp.log(jnp.abs(cx / width) + 1e-3),
                      jnp.log(jnp.abs(cy / height) + 1e-3),
                      jnp.log(w / width), jnp.log(h / height)], axis=-1)


def iou_window_mask(N: int, lframe: int, p: int, window: int) -> jax.Array:
    """(N, N) frame-window visibility for iou_base aggregation
    (SelfAttentionLocal:128-136): query row q in frame fq may attend key
    k in frame fk iff fk-window <= fq <= fk+window-1 (clamped to
    [0, lframe)). Rows beyond lframe*p (global frames, if any) are
    unmasked like the reference's untouched zeros... the reference only
    runs iou_base with local-only windows (lframe*p == N)."""
    frame = jnp.arange(N) // p
    fq, fk = frame[:, None], frame[None, :]
    lower = jnp.maximum(fk - window, 0)
    upper = jnp.minimum(fk + window, lframe)
    return (fq >= lower) & (fq < upper)


class SelfAttentionLocal(nn.Module):
    """SelfAttentionLocal (post_trans.py:47): plain scaled-dot-product
    attention (scale = head_dim**-0.5, no QK normalization) with a
    location-relation branch. Options mirrored 1:1:
      use_loc_emb: relation-network bias — log(relu(1x1(pos_emb)))
        added ('add') or multiplied ('dot') onto the logits (:163-168)
      use_time_emd: per-frame sinusoidal added to the relation grid
      pure_pos_emb: absolute log-geometry embedding added to the INPUT
        features, fuse becomes 'identity' (:118-127)
      loc_conf: logits scaled by cls_score; relation bias gated by
        fg_score > 0.001 (:110-114, :155-158)
      iou_base/iou_window: post-softmax mask by (IoU>0) x frame window,
        renormalized (:128-136, :173-176); disables the embeddings
      reconf: shared q/k from cat[x, x_reg] (first half of a 2C->4C
        projection — the reference leaves chunks 2-3 unused), separate
        v_cls/v_reg (:71-75)."""

    num_heads: int = 4
    reconf: bool = False
    use_time_emd: bool = False
    use_loc_emb: bool = True
    loc_fuse_type: str = "add"
    pure_pos_emb: bool = False
    loc_conf: bool = False
    iou_base: bool = False
    iou_window: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls: jax.Array, x_reg: jax.Array,
                 boxes: jax.Array, cls_score: jax.Array,
                 fg_score: jax.Array, valid: jax.Array, lframe: int,
                 p: int, width: int = 576, height: int = 576):
        N, C = x_cls.shape
        h = self.num_heads
        f32 = jnp.float32
        use_loc = self.use_loc_emb and not self.iou_base
        use_pure = self.pure_pos_emb and not self.iou_base
        use_time = self.use_time_emd and not self.iou_base
        fuse = "identity" if (use_pure or self.iou_base) else \
            self.loc_fuse_type

        attn_lt = None
        if use_loc and not use_pure:
            pos_mat = extract_position_matrix(boxes, boxes)     # (N, N, 4)
            loc_emd = extract_position_embedding(pos_mat, 64)   # (N, N, 64)
            if use_time:
                from ..ops.position import get_timing_signal_1d
                import numpy as np
                te = jnp.asarray(get_timing_signal_1d(
                    np.arange(N // p), 64))                     # (F, 64)
                # the reference tiles (LF,1,64).repeat(P,N,1): query row
                # q gets frame q % LF, not q // P (post_trans.py:105-107
                # quirk, reproduced for checkpoint parity)
                loc_emd = loc_emd + te[jnp.arange(N) % (N // p)][:, None, :]
            attn_lt = nn.Dense(h, dtype=self.dtype, name="loc2feature")(
                loc_emd.astype(self.dtype))
            attn_lt = jax.nn.relu(attn_lt.astype(f32)).transpose(2, 0, 1)
            if self.loc_conf:
                attn_lt = attn_lt * (fg_score > 0.001).astype(
                    f32)[None, None, :]
        elif use_pure:
            plf = pure_position_embedding(boxes.astype(f32), width, height)
            add = nn.Dense(C, use_bias=False, dtype=self.dtype,
                           name="loc2feature")(plf.astype(self.dtype))
            if use_time:
                from ..ops.position import get_timing_signal_1d
                import numpy as np
                te = jnp.asarray(get_timing_signal_1d(
                    np.arange(N // p), C))
                add = add + te[jnp.arange(N) // p]
            x_cls = x_cls + add

        if self.reconf:
            qk = nn.Dense(4 * C, use_bias=False, dtype=self.dtype,
                          name="qk")(jnp.concatenate([x_cls, x_reg], -1))
            q, k = jnp.split(qk, 4, -1)[:2]
            v_cls = nn.Dense(C, use_bias=False, dtype=self.dtype,
                             name="v_cls")(x_cls)
            v_reg = nn.Dense(C, use_bias=False, dtype=self.dtype,
                             name="v_reg")(x_reg)
        else:
            qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype,
                           name="qkv")(x_cls)
            q, k, v_cls = jnp.split(qkv, 3, -1)
            v_reg = None

        qh, kh = _split_heads(q, h), _split_heads(k, h)
        logits = jnp.einsum("hqd,hkd->hqk", qh, kh,
                            preferred_element_type=f32) * (C // h) ** -0.5
        if self.loc_conf and cls_score is not None:
            logits = logits * cls_score.astype(f32)[None, None, :]
        if fuse == "add":
            logits = logits + jnp.log(attn_lt + 1e-6)
        elif fuse == "dot":
            logits = logits * jnp.log(attn_lt + 1e-6)

        kmask = jnp.where(valid[None, None, :], 0.0, NEG)
        attn = jax.nn.softmax(logits + kmask, -1)               # (h, N, N)

        if self.iou_base:
            from ..ops.boxes import pairwise_iou_xyxy
            win = (iou_window_mask(N, lframe, p, self.iou_window)
                   if self.iou_window != 0 else jnp.ones((N, N), bool))
            iou_mat = ((pairwise_iou_xyxy(boxes, boxes) > 0.0) & win
                       & valid[None, :]).astype(f32)
            attn = attn * iou_mat[None]
            attn = attn / jnp.maximum(
                jnp.sum(attn, -1, keepdims=True), 1e-12)

        if self.reconf:
            # The reference's reconf branch carries a leading singleton
            # dim on v (reshape(B,N,1,h,d).permute -> (1,B,h,N,d)), so
            # its `.transpose(1,2).reshape(B,N,C)` flattens the
            # attention output in (head, token, dim) order — a layout
            # scramble (post_trans.py:141-146 vs the correct :178-179
            # non-reconf path). Reference checkpoints are trained
            # against it, so reproduce it exactly.
            def scrambled(v):
                o = jnp.einsum("hqk,hkd->hqd", attn,
                               _split_heads(v, h).astype(f32))
                return o.reshape(N, C).astype(self.dtype)

            return scrambled(v_cls), scrambled(v_reg)
        out_cls = _merge_heads(jnp.einsum(
            "hqk,hkd->hqd", attn, _split_heads(v_cls, h).astype(f32))
        ).astype(self.dtype)
        return out_cls, None


class LocalFFN(nn.Module):
    """FFN (post_trans.py:184): Linear -> GELU -> Linear."""

    hidden_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = nn.Dense(int(C * self.hidden_ratio), dtype=self.dtype,
                     name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(C, dtype=self.dtype, name="fc2")(x)


class TransformerBlockLocal(nn.Module):
    """TransformerBlock (post_trans.py:199): pre-norm attention with
    residuals; reconf keeps separate cls/reg residual+FFN streams."""

    num_heads: int = 4
    reconf: bool = False
    use_ffn: bool = True
    use_time_emd: bool = False
    use_loc_emb: bool = True
    loc_fuse_type: str = "add"
    pure_pos_emb: bool = False
    loc_conf: bool = False
    iou_base: bool = False
    iou_window: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls, x_reg, boxes, cls_score, fg_score, valid,
                 lframe, p, width=576, height=576):
        attn = SelfAttentionLocal(
            self.num_heads, self.reconf, self.use_time_emd,
            self.use_loc_emb, self.loc_fuse_type, self.pure_pos_emb,
            self.loc_conf, self.iou_base, self.iou_window,
            dtype=self.dtype, name="attn")
        n1 = nn.LayerNorm(dtype=jnp.float32, name="norm1")
        n3 = nn.LayerNorm(dtype=jnp.float32, name="norm3")
        a_cls, a_reg = attn(n1(x_cls).astype(self.dtype),
                            n3(x_reg).astype(self.dtype), boxes,
                            cls_score, fg_score, valid, lframe, p,
                            width, height)
        if self.reconf:
            x_reg = x_reg + a_reg
            x_cls = x_cls + a_cls
            if self.use_ffn:
                x_cls = x_cls + LocalFFN(dtype=self.dtype, name="mlp")(
                    nn.LayerNorm(dtype=jnp.float32, name="norm2")(
                        x_cls).astype(self.dtype))
                x_reg = x_reg + LocalFFN(dtype=self.dtype, name="mlp_conf")(
                    nn.LayerNorm(dtype=jnp.float32, name="norm4")(
                        x_reg).astype(self.dtype))
            return x_cls, x_reg
        x_cls = x_cls + a_cls
        if self.use_ffn:
            x_cls = x_cls + LocalFFN(dtype=self.dtype, name="mlp")(
                nn.LayerNorm(dtype=jnp.float32, name="norm2")(
                    x_cls).astype(self.dtype))
        return x_cls, x_reg


class LocalAggregation(nn.Module):
    """LocalAggregation (post_trans.py:972): a stack of `blocks`
    TransformerBlockLocal layers over all proposals (features stay at C
    dims; the reference's cls_pred for this path is Linear(C, classes)).
    """

    num_heads: int = 4
    blocks: int = 1
    reconf: bool = False
    use_ffn: bool = True
    use_time_emd: bool = False
    use_loc_emb: bool = True
    loc_fuse_type: str = "add"
    pure_pos_emb: bool = False
    loc_conf: bool = False
    iou_base: bool = False
    iou_window: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_cls: jax.Array, feat_reg: jax.Array,
                 boxes: jax.Array, cls_score: jax.Array,
                 fg_score: jax.Array, valid: jax.Array, lframe: int,
                 p: int, width: int = 576, height: int = 576):
        """feat_*: (N, C) proposals flattened across frames (N = F*p);
        boxes (N, 4) xyxy. Returns (cls (N, C), reg (N, C))."""
        x_cls, x_reg = feat_cls, feat_reg
        for i in range(self.blocks):
            x_cls, x_reg = TransformerBlockLocal(
                self.num_heads, self.reconf, self.use_ffn,
                self.use_time_emd, self.use_loc_emb, self.loc_fuse_type,
                self.pure_pos_emb, self.loc_conf, self.iou_base,
                self.iou_window, dtype=self.dtype, name=f"block_{i}")(
                x_cls, x_reg, boxes, cls_score, fg_score, valid,
                lframe, p, width, height)
        return x_cls, x_reg


class _VideoTowers(nn.Module):
    """Shared per-level stems + still towers + preds + video towers
    (yolovp_msa.py:49-125, v_plus_head towers; same layout as TSCDHead)."""

    num_classes: int
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    vid_cls: bool = True
    vid_reg: bool = False
    edge_on_reg: bool = False
    prior_prob: float = 1e-2
    dtype: Any = jnp.float32

    def _bias_init(self):
        b = -math.log((1 - self.prior_prob) / self.prior_prob)
        return nn.initializers.constant(b)

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], train: bool = False):
        Conv = DWConv if self.depthwise else BaseConv
        hidden = int(256 * self.width)
        dt = self.dtype
        level_outputs, hw = [], []
        cls_vid_feats, reg_vid_feats, edge_feats = [], [], []
        for k, x in enumerate(xin):
            hw.append((x.shape[1], x.shape[2]))
            x = BaseConv(hidden, 1, 1, act=self.act, dtype=dt,
                         name=f"stem_{k}")(x, train)
            cls_f = x
            reg_f = x
            for i in range(2):
                cls_f = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                             name=f"cls_conv_{k}_{i}")(cls_f, train)
                reg_f = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                             name=f"reg_conv_{k}_{i}")(reg_f, train)
            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                              bias_init=self._bias_init(),
                              name=f"cls_pred_{k}")(cls_f)
            reg_out = nn.Conv(4, (1, 1), dtype=dt,
                              name=f"reg_pred_{k}")(reg_f)
            obj_out = nn.Conv(1, (1, 1), dtype=dt,
                              bias_init=self._bias_init(),
                              name=f"obj_pred_{k}")(reg_f)
            level_outputs.append(
                jnp.concatenate([reg_out, obj_out, cls_out], -1))
            if self.vid_cls:
                v = x
                for i in range(2):
                    v = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                             name=f"cls_conv2_{k}_{i}")(v, train)
                cls_vid_feats.append(v)
            else:
                cls_vid_feats.append(cls_f)
            if self.vid_reg:
                vr = x
                for i in range(2):
                    vr = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                              name=f"reg_conv2_{k}_{i}")(vr, train)
                reg_vid_feats.append(vr)
            else:
                reg_vid_feats.append(reg_f)
            if self.edge_on_reg:
                edge_feats.append(WaveletsHFBlock(
                    dtype=dt, name=f"edge_{k}")(reg_vid_feats[-1]))
        return (flatten_levels(level_outputs), hw,
                flatten_levels(cls_vid_feats),
                flatten_levels(reg_vid_feats),
                flatten_levels(edge_feats) if self.edge_on_reg else None)


class YOLOVHead(nn.Module):
    """YOLOV head (yolovp_msa.py:22): dense YOLOX preds per frame ->
    fixed-P proposal selection -> MSA self-attention over ALL frames'
    proposals jointly -> refined cls logits (+ reconf obj logits)."""

    num_classes: int
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    act: str = "silu"
    depthwise: bool = False
    heads: int = 4
    num_proposals: int = 30           # defualt_p (yolov_base.py)
    pre_nms: float = 0.75
    sim_thresh: float = 0.75
    ave: bool = True
    use_mask: bool = False
    use_pre_nms: bool = True
    reconf: bool = False
    use_score: bool = True           # yolovp_msa.py:322
    conf_sim_thresh: float = 0.99    # obj-branch round-2 sim threshold
    test_conf: float = 0.001
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], lframe: int = 0,
                 gframe: int = 16, train: bool = False) -> Dict[str, Any]:
        hidden = int(256 * self.width)
        P = self.num_proposals
        C = self.num_classes
        raw_outputs, hw, cls_feat, reg_feat, _ = _VideoTowers(
            C, self.width, self.act, self.depthwise, vid_cls=True,
            vid_reg=False, edge_on_reg=False, dtype=self.dtype,
            name="towers")(xin, train)

        raw32 = raw_outputs.astype(jnp.float32)
        dec = decode_outputs(raw32, hw, self.strides)
        decoded = jnp.concatenate(
            [dec[..., :4], jax.nn.sigmoid(dec[..., 4:])], -1)
        props = select_frame_proposals(
            jax.lax.stop_gradient(decoded), C, P, self.test_conf,
            self.pre_nms, self.use_pre_nms, P)

        take = jax.vmap(lambda feats, idx: feats[idx])
        f_cls = take(cls_feat, props.idx).reshape(-1, hidden)   # (F*P, h)
        f_reg = take(reg_feat, props.idx).reshape(-1, hidden)
        # use_score=False -> constant-1 guidance (yolovp_msa.py:322)
        flat_cs = (props.cls_conf.reshape(-1) if self.use_score
                   else jnp.ones(props.cls_conf.size, jnp.float32))
        flat_fs = (props.obj.reshape(-1) if self.use_score
                   else jnp.ones(props.obj.size, jnp.float32))
        flat_valid = props.valid.reshape(-1)

        agg_cls, agg_obj = MSAYolov(
            4 * hidden, self.heads, reconf=self.reconf, dtype=self.dtype,
            name="agg")(f_cls, f_reg, flat_cs, flat_fs, flat_valid,
                        sim_thresh=self.sim_thresh, ave=self.ave,
                        use_mask=self.use_mask,
                        conf_sim_thresh=self.conf_sim_thresh)

        F = props.boxes.shape[0]
        out: Dict[str, Any] = {
            "raw_outputs": raw_outputs, "hw": hw, "decoded": decoded,
            "proposals": props,
            "refined_cls_logits": nn.Dense(
                C, dtype=self.dtype, name="cls_pred")(
                agg_cls).reshape(F, P, C),
        }
        if self.reconf and agg_obj is not None:
            out["refined_obj_logits"] = nn.Dense(
                1, dtype=self.dtype, name="obj_pred")(
                agg_obj).reshape(F, P)
        return out


class YOLOVPlusHead(nn.Module):
    """YOLOV++ head (v_plus_head.py:24): agg_type 'msa'|'localagg' switch
    (:84-107), decouple_reg second aggregator for the obj branch —
    structurally TSCDHead minus wavelets/matcher/TaskAligned."""

    num_classes: int
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    act: str = "silu"
    depthwise: bool = False
    heads: int = 4
    num_proposals: int = 30
    pre_nms: float = 0.75
    sim_thresh: float = 0.75
    ave: bool = True
    use_mask: bool = False
    use_pre_nms: bool = False
    reconf: bool = True
    decouple_reg: bool = True
    agg_type: str = "mca"            # 'mca' | 'msa' | 'localagg'
    use_score: bool = True           # score-guide the aggregation
    conf_sim_thresh: float = 0.99    # obj-branch round-2 sim threshold
    test_conf: float = 0.001
    # localagg options (v_plus_base.py:76-110)
    local_blocks: int = 1
    use_ffn: bool = True
    use_time_emd: bool = False
    use_loc_emb: bool = True
    loc_fuse_type: str = "add"
    pure_pos_emb: bool = False
    loc_conf: bool = False
    iou_base: bool = False
    iou_window: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], lframe: int, gframe: int,
                 time_embedding: Optional[jax.Array] = None,
                 train: bool = False) -> Dict[str, Any]:
        hidden = int(256 * self.width)
        P = self.num_proposals
        C = self.num_classes
        raw_outputs, hw, cls_feat, reg_feat, _ = _VideoTowers(
            C, self.width, self.act, self.depthwise, vid_cls=True,
            vid_reg=True, edge_on_reg=False, dtype=self.dtype,
            name="towers")(xin, train)

        raw32 = raw_outputs.astype(jnp.float32)
        dec = decode_outputs(raw32, hw, self.strides)
        decoded = jnp.concatenate(
            [dec[..., :4], jax.nn.sigmoid(dec[..., 4:])], -1)
        props = select_frame_proposals(
            jax.lax.stop_gradient(decoded), C, P, self.test_conf,
            self.pre_nms, self.use_pre_nms, P)

        take = jax.vmap(lambda feats, idx: feats[idx])
        f_cls = take(cls_feat, props.idx)                     # (F, P, h)
        f_reg = take(reg_feat, props.idx)
        L = max(lframe, 1) if lframe > 0 else props.boxes.shape[0]

        out: Dict[str, Any] = {"raw_outputs": raw_outputs, "hw": hw,
                               "decoded": decoded, "proposals": props}

        # use_score=False drops the score guidance (yolovp_msa.py:322
        # passes None; a constant 1 is arithmetically identical and keeps
        # the call signature static)
        cs = props.cls_conf if self.use_score else jnp.ones_like(
            props.cls_conf)
        fs = props.obj if self.use_score else jnp.ones_like(props.obj)

        if self.agg_type == "localagg":
            F = props.boxes.shape[0]
            W = xin[0].shape[2] * self.strides[0]
            H = xin[0].shape[1] * self.strides[0]
            agg_cls, agg_obj = LocalAggregation(
                self.heads, blocks=self.local_blocks, reconf=self.reconf,
                use_ffn=self.use_ffn, use_time_emd=self.use_time_emd,
                use_loc_emb=self.use_loc_emb,
                loc_fuse_type=self.loc_fuse_type,
                pure_pos_emb=self.pure_pos_emb, loc_conf=self.loc_conf,
                iou_base=self.iou_base, iou_window=self.iou_window,
                dtype=self.dtype, name="agg")(
                f_cls.reshape(-1, hidden), f_reg.reshape(-1, hidden),
                props.boxes.reshape(-1, 4), cs.reshape(-1),
                fs.reshape(-1), props.valid.reshape(-1), F, P, W, H)
            # features stay C-dim; non-reconf passes reg through
            # untouched (TransformerBlock:226-230) so obj_pred sees the
            # raw gathered reg features like the reference
            agg_cls = agg_cls.reshape(F, P, -1)[:L]
            agg_obj = agg_obj.reshape(F, P, -1)[:L]
        elif self.agg_type == "msa":
            agg_cls, agg_obj = MSAYolov(
                4 * hidden, self.heads, reconf=self.reconf, dtype=self.dtype,
                name="agg")(
                f_cls.reshape(-1, hidden), f_reg.reshape(-1, hidden),
                cs.reshape(-1), fs.reshape(-1),
                props.valid.reshape(-1), sim_thresh=self.sim_thresh,
                ave=self.ave, use_mask=self.use_mask,
                conf_sim_thresh=self.conf_sim_thresh)
            if self.decouple_reg:
                # decoupled obj branch: a SECOND reconf aggregator over
                # the raw gathered features supplies the obj features
                # (v_plus_head.py:418-421 overrides features_reg with
                # agg_iou's output)
                _, agg_obj = MSAYolov(
                    4 * hidden, self.heads, reconf=True, dtype=self.dtype,
                    name="agg_iou")(
                    f_cls.reshape(-1, hidden), f_reg.reshape(-1, hidden),
                    cs.reshape(-1), fs.reshape(-1),
                    props.valid.reshape(-1), sim_thresh=self.sim_thresh,
                    ave=self.ave, use_mask=self.use_mask,
                    conf_sim_thresh=self.conf_sim_thresh)
            F = props.boxes.shape[0]
            agg_cls = agg_cls.reshape(F, P, -1)[:L]
            agg_obj = (agg_obj.reshape(F, P, -1)[:L]
                       if agg_obj is not None else None)
        else:  # 'mca': local frames query (local + global) keys
            agg_cls, _ = MCAg2l(4 * hidden, self.heads, reconf=False,
                                dtype=self.dtype, name="agg")(
                f_cls, f_reg, cs, fs, props.valid, L,
                sim_thresh=self.sim_thresh, ave=self.ave,
                use_mask=self.use_mask,
                conf_sim_thresh=self.conf_sim_thresh)
            agg_obj = None
            if self.decouple_reg:
                _, agg_obj = MCAg2l(4 * hidden, self.heads, reconf=True,
                                    dtype=self.dtype, name="agg_iou")(
                    f_cls, f_reg, cs, fs, props.valid,
                    L, sim_thresh=self.sim_thresh, ave=self.ave,
                    use_mask=self.use_mask,
                    conf_sim_thresh=self.conf_sim_thresh)

        out["refined_cls_logits"] = nn.Dense(
            C, dtype=self.dtype, name="cls_pred")(agg_cls)
        if self.reconf and agg_obj is not None:
            out["refined_obj_logits"] = nn.Dense(
                1, dtype=self.dtype, name="obj_pred")(agg_obj)[..., 0]
        return out


class OnlineBank(NamedTuple):
    """Rolling proposal-feature banks for streaming YOLOV
    (yolov_msa_online.py:282-294 `other_result` + the demo's
    tmp_bank/local_bank, tools/yolov_demo_online.py:214-240):
    fixed-capacity device-resident FIFOs over past frames' proposals.

    The reference's MAIN bank keeps the last 600 frames and selects 31
    by a fixed-seed shuffle each step (online_previous_selection,
    post_process.py:186-216); attention is permutation-invariant over
    bank rows, so for streams up to `capacity // P` frames this FIFO is
    EXACTLY equivalent (same row set) — beyond that the reference reads
    a seeded-random subset of the last 600 frames where this keeps the
    most recent ones (divergence quantified in
    tests/test_torch_parity_online.py). The LOCAL msa bank is last-20
    frames in the reference (:209) — a FIFO by definition, exact at any
    length."""
    cls_feat: jax.Array     # (B, h)
    reg_feat: jax.Array     # (B, h)
    cls_score: jax.Array    # (B,)
    fg_score: jax.Array     # (B,)
    valid: jax.Array        # (B,) bool
    ptr: jax.Array          # () int32 — next write slot (ring buffer)
    msa_feat: jax.Array     # (Bl, 4h) trans outputs of past frames
    boxes: jax.Array        # (Bl, 4) xyxy
    l_cls_score: jax.Array  # (Bl,)
    l_fg_score: jax.Array   # (Bl,)
    l_valid: jax.Array      # (Bl,) bool
    l_ptr: jax.Array        # () int32
    frames: jax.Array       # () int32 — frames pushed so far


def init_online_bank(capacity: int, hidden: int,
                     local_capacity: Optional[int] = None,
                     out_dim: Optional[int] = None,
                     dtype=jnp.float32) -> OnlineBank:
    lc = capacity if local_capacity is None else local_capacity
    od = 4 * hidden if out_dim is None else out_dim
    z = jnp.zeros
    return OnlineBank(
        z((capacity, hidden), dtype), z((capacity, hidden), dtype),
        z((capacity,), dtype), z((capacity,), dtype),
        z((capacity,), bool), z((), jnp.int32),
        z((lc, od), dtype), z((lc, 4), dtype),
        z((lc,), dtype), z((lc,), dtype), z((lc,), bool),
        z((), jnp.int32), z((), jnp.int32))


def bank_push(bank: OnlineBank, cls_feat, reg_feat, cls_score, fg_score,
              valid) -> OnlineBank:
    """Ring-buffer insert of one frame's P proposals into the MAIN bank
    (the reference appends every frame's features,
    yolov_demo_online.py:218-221)."""
    P = cls_feat.shape[0]
    B = bank.cls_feat.shape[0]
    idx = (bank.ptr + jnp.arange(P)) % B

    def put(buf, new):
        return buf.at[idx].set(new.astype(buf.dtype))

    return bank._replace(
        cls_feat=put(bank.cls_feat, cls_feat),
        reg_feat=put(bank.reg_feat, reg_feat),
        cls_score=put(bank.cls_score, cls_score),
        fg_score=put(bank.fg_score, fg_score),
        valid=put(bank.valid, valid),
        ptr=(bank.ptr + P) % B,
        frames=bank.frames + 1)


def bank_push_local(bank: OnlineBank, msa, boxes, cls_score, fg_score,
                    valid, ran) -> OnlineBank:
    """Conditionally insert into the LOCAL msa bank — the reference only
    appends when the trans actually ran this step (res_dict['msa'] stays
    None on the early single-image path, yolov_msa_online.py:281-283)."""
    P = msa.shape[0]
    B = bank.msa_feat.shape[0]
    idx = (bank.l_ptr + jnp.arange(P)) % B

    def put(buf, new):
        return jnp.where(ran, buf.at[idx].set(new.astype(buf.dtype)), buf)

    return bank._replace(
        msa_feat=put(bank.msa_feat, msa),
        boxes=put(bank.boxes, boxes),
        l_cls_score=put(bank.l_cls_score, cls_score),
        l_fg_score=put(bank.l_fg_score, fg_score),
        l_valid=put(bank.l_valid, valid),
        l_ptr=jnp.where(ran, (bank.l_ptr + P) % B, bank.l_ptr))


def local_agg_merge(features: jax.Array, boxes: jax.Array,
                    cls_score: jax.Array, fg_score: jax.Array,
                    local_feat: jax.Array, local_boxes: jax.Array,
                    l_cls_score: jax.Array, l_fg_score: jax.Array,
                    l_valid: jax.Array) -> jax.Array:
    """MSA_yolov_online.local_agg (post_trans.py:1324-1345): merge the
    current frame's aggregated features with the local msa memory by
    softmax(25 * cos-sim * score-thresh-map) * geometry-IoU, row-
    normalized, then average with the input features. The thresh map
    ZEROES logits (not -inf) exactly like the reference; invalid bank
    slots are excluded from the softmax. The reference divides by the
    row sum unguarded (NaN when no bank box overlaps a query — the det
    is effectively dropped upstream); here a zero-overlap row falls
    back to its own unmerged features, so newly-appearing objects keep
    their features instead of being attenuated to features/2."""
    from ..ops.boxes import pairwise_iou_xyxy
    f32 = jnp.float32
    fn = _l2norm(features.astype(f32))
    ln = _l2norm(local_feat.astype(f32))
    cos = fn @ ln.T                                    # (P, M)
    iou = pairwise_iou_xyxy(boxes.astype(f32), local_boxes.astype(f32))
    pre = (cls_score * fg_score).astype(f32)[:, None]
    other = (l_cls_score * l_fg_score).astype(f32)[None, :]
    thresh = ((other - pre) > -0.3).astype(f32)
    logits = 25.0 * cos * thresh
    logits = jnp.where(l_valid[None, :], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1) * iou * l_valid[None, :].astype(f32)
    row_sum = jnp.sum(w, axis=-1, keepdims=True)
    w = w / jnp.maximum(row_sum, 1e-12)
    merged = w @ local_feat.astype(f32)
    merged = jnp.where(row_sum > 1e-8, merged, features.astype(f32))
    return ((merged + features.astype(f32)) * 0.5).astype(features.dtype)


class YOLOVOnlineHead(nn.Module):
    """Online streaming YOLOV head (yolov_msa_online.py:27), structured
    exactly like the reference: ONE frame per call; square MSA over
    [current proposals ++ main bank] (Attention_msa_online with fg-score
    guidance on the reg branch, post_trans.py:902-968) -> linear1 ->
    round-2 ave pooling -> linear2 -> local_agg merge against the msa
    memory -> linear_pred. Composed parity:
    tests/test_torch_parity_online.py.

    The reference takes the plain single-image result until TWO frames
    are banked (online_previous_selection bails below 2 frames,
    post_process.py:194, and the head early-returns,
    yolov_msa_online.py:283) — mirrored here by `use_refined` in the
    output (the refined logits are computed unconditionally to keep the
    step a single compiled program)."""

    num_classes: int
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    act: str = "silu"
    depthwise: bool = False
    heads: int = 4
    num_proposals: int = 30           # Afternum = simN = 30 upstream
    pre_nms: float = 0.75
    sim_thresh: float = 0.75
    ave: bool = True
    use_pre_nms: bool = True
    reconf: bool = False
    test_conf: float = 0.001
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], bank: OnlineBank,
                 train: bool = False):
        hidden = int(256 * self.width)
        P = self.num_proposals
        C = self.num_classes
        raw_outputs, hw, cls_feat, reg_feat, _ = _VideoTowers(
            C, self.width, self.act, self.depthwise, vid_cls=True,
            vid_reg=False, edge_on_reg=False, dtype=self.dtype,
            name="towers")(xin, train)

        raw32 = raw_outputs.astype(jnp.float32)
        dec = decode_outputs(raw32, hw, self.strides)
        decoded = jnp.concatenate(
            [dec[..., :4], jax.nn.sigmoid(dec[..., 4:])], -1)
        props = select_frame_proposals(
            jax.lax.stop_gradient(decoded), C, P, self.test_conf,
            self.pre_nms, self.use_pre_nms, P)

        take = jax.vmap(lambda feats, idx: feats[idx])
        f_cls = take(cls_feat, props.idx)[0]                 # (P, h)
        f_reg = take(reg_feat, props.idx)[0]
        cs, fs, vl = props.cls_conf[0], props.obj[0], props.valid[0]
        boxes = props.boxes[0]

        # reference gate: bank participates only from the 3rd frame on
        ran = bank.frames >= 2
        all_cls = jnp.concatenate([f_cls, bank.cls_feat.astype(f_cls.dtype)],
                                  0)
        all_reg = jnp.concatenate([f_reg, bank.reg_feat.astype(f_reg.dtype)],
                                  0)
        all_cs = jnp.concatenate([cs, bank.cls_score.astype(cs.dtype)], 0)
        all_fs = jnp.concatenate([fs, bank.fg_score.astype(fs.dtype)], 0)
        all_vl = jnp.concatenate([vl, bank.valid & ran], 0)

        out, _ = MSAYolov(4 * hidden, self.heads, reconf=False,
                          reg_score_guidance=True, dtype=self.dtype,
                          name="trans")(
            all_cls, all_reg, all_cs, all_fs, all_vl,
            sim_thresh=self.sim_thresh, ave=self.ave)
        cur = out[:P]                                        # (P, 4h)

        has_local = jnp.any(bank.l_valid)
        merged = local_agg_merge(cur, boxes, cs, fs, bank.msa_feat,
                                 bank.boxes, bank.l_cls_score,
                                 bank.l_fg_score, bank.l_valid)
        lout = jnp.where(has_local, merged, cur)

        refined = nn.Dense(C, dtype=self.dtype, name="cls_pred")(lout)

        new_bank = bank_push(bank, f_cls, f_reg, cs, fs, vl)
        new_bank = bank_push_local(new_bank, cur, boxes, cs, fs,
                                   vl & ran, ran)
        return {"raw_outputs": raw_outputs, "hw": hw, "decoded": decoded,
                "proposals": props,
                "refined_cls_logits": refined[None],
                "use_refined": ran,
                "bank": new_bank}
