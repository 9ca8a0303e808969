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
- Online YOLOV: one local frame + an explicit rolling feature bank
  carried between calls (the host maintains the bank with
  tscd_tpu.postprocess.online_previous_selection).
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


class LocalAggregation(nn.Module):
    """Location-relation self-attention (post_trans.py:972
    LocalAggregation + SelfAttentionLocal:47): QK cosine attention over
    all proposals with a geometric relation bias
    (log-relative-position sinusoidal embedding -> per-head scalar via a
    small MLP, the Relation-Network pattern) and absolute time embedding
    added to the inputs. Options mirrored: pure_pos_emb (bias only),
    loc_conf (scale by fg score), iou-window masking via `iou_mask`."""

    num_heads: int = 4
    scale: float = 25.0
    use_time_emb: bool = True
    loc_conf: bool = False
    pure_pos_emb: bool = False
    reconf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_cls: jax.Array, feat_reg: jax.Array,
                 boxes: jax.Array, cls_score: jax.Array,
                 fg_score: jax.Array, valid: jax.Array,
                 time_emb: Optional[jax.Array] = None,
                 iou_mask: Optional[jax.Array] = None):
        """feat_*: (N, C) all frames' proposals flattened; boxes (N, 4)
        xyxy; time_emb (N, 256) per-proposal absolute frame embedding.
        Returns (cls (N, 2C), obj (N, 2C) or None)."""
        N, C = feat_cls.shape
        h = self.num_heads
        f32 = jnp.float32

        x_cls, x_reg = feat_cls, feat_reg
        if self.use_time_emb and time_emb is not None:
            te = nn.Dense(C, dtype=self.dtype, name="time_proj")(
                time_emb.astype(self.dtype))
            x_cls = x_cls + te
            x_reg = x_reg + te

        # geometric relation bias (SelfAttentionLocal:54-171)
        pos_mat = extract_position_matrix(boxes, boxes)        # (N, N, 4)
        pos_emb = extract_position_embedding(pos_mat, 64)      # (N, N, 64)
        rel_bias = nn.Dense(h, dtype=self.dtype, name="pos_fc")(
            pos_emb.astype(self.dtype))                        # (N, N, h)
        rel_bias = jnp.maximum(rel_bias.astype(f32), 1e-6)
        rel_bias = jnp.log(rel_bias).transpose(2, 0, 1)        # (h, N, N)

        if self.pure_pos_emb:
            logits = rel_bias
        else:
            qkv_c = nn.Dense(3 * C, use_bias=False, dtype=self.dtype,
                             name="qkv_cls")(x_cls)
            q_c, k_c, v_c = jnp.split(qkv_c, 3, -1)
            qkv_r = nn.Dense(3 * C, use_bias=False, dtype=self.dtype,
                             name="qkv_reg")(x_reg)
            q_r, k_r, v_r = jnp.split(qkv_r, 3, -1)
            qc, kc = map(lambda z: _l2norm(_split_heads(z, h)), (q_c, k_c))
            qr, kr = map(lambda z: _l2norm(_split_heads(z, h)), (q_r, k_r))
            att_c = jnp.einsum("hqd,hkd->hqk", qc, kc,
                               preferred_element_type=f32) * self.scale
            att_r = jnp.einsum("hqd,hkd->hqk", qr, kr,
                               preferred_element_type=f32) * self.scale
            if self.loc_conf:
                att_c = att_c * fg_score.astype(f32)[None, None, :]
            logits = 0.5 * (att_c + att_r) + rel_bias
        kmask = jnp.where(valid[None, None, :], 0.0, NEG)
        if iou_mask is not None:
            kmask = kmask + jnp.where(iou_mask[None], 0.0, NEG)
        attn = jax.nn.softmax(logits + kmask, -1)              # (h, N, N)

        v_c = nn.Dense(C, use_bias=False, dtype=self.dtype,
                       name="v_cls")(x_cls) if self.pure_pos_emb else v_c
        vc = _split_heads(v_c, h)
        out = _merge_heads(jnp.einsum("hqk,hkd->hqd", attn,
                                      vc.astype(f32)))
        out_cls = jnp.concatenate([out, feat_cls.astype(f32)],
                                  -1).astype(self.dtype)
        if self.reconf:
            v_r2 = (nn.Dense(C, use_bias=False, dtype=self.dtype,
                             name="v_reg")(x_reg) if self.pure_pos_emb
                    else v_r)
            vr = _split_heads(v_r2, h)
            out_r = _merge_heads(jnp.einsum("hqk,hkd->hqd", attn,
                                            vr.astype(f32)))
            out_obj = jnp.concatenate([out_r, feat_reg.astype(f32)],
                                      -1).astype(self.dtype)
        else:
            out_obj = None
        return out_cls, out_obj


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
        flat_cs = props.cls_conf.reshape(-1)
        flat_fs = props.obj.reshape(-1)
        flat_valid = props.valid.reshape(-1)

        agg_cls, agg_obj = MSAYolov(
            4 * hidden, self.heads, reconf=self.reconf, dtype=self.dtype,
            name="agg")(f_cls, f_reg, flat_cs, flat_fs, flat_valid,
                        sim_thresh=self.sim_thresh, ave=self.ave,
                        use_mask=self.use_mask)

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
    test_conf: float = 0.001
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

        if self.agg_type == "localagg":
            F = props.boxes.shape[0]
            te = None
            if time_embedding is not None:
                te = jnp.repeat(time_embedding, P, axis=0)    # (F*P, 256)
            agg_cls, agg_obj = LocalAggregation(
                self.heads, reconf=self.reconf or self.decouple_reg,
                dtype=self.dtype, name="agg")(
                f_cls.reshape(-1, hidden), f_reg.reshape(-1, hidden),
                props.boxes.reshape(-1, 4), props.cls_conf.reshape(-1),
                props.obj.reshape(-1), props.valid.reshape(-1), te)
            agg_cls = nn.Dense(4 * hidden, dtype=self.dtype,
                               name="cls_proj")(agg_cls)
            agg_cls = agg_cls.reshape(F, P, -1)[:L]
            if agg_obj is not None:
                agg_obj = nn.Dense(4 * hidden, dtype=self.dtype,
                                   name="obj_proj")(agg_obj)
                agg_obj = agg_obj.reshape(F, P, -1)[:L]
        elif self.agg_type == "msa":
            agg_cls, agg_obj = MSAYolov(
                4 * hidden, self.heads, reconf=self.reconf, dtype=self.dtype,
                name="agg")(
                f_cls.reshape(-1, hidden), f_reg.reshape(-1, hidden),
                props.cls_conf.reshape(-1), props.obj.reshape(-1),
                props.valid.reshape(-1), sim_thresh=self.sim_thresh,
                ave=self.ave, use_mask=self.use_mask)
            F = props.boxes.shape[0]
            agg_cls = agg_cls.reshape(F, P, -1)[:L]
            agg_obj = (agg_obj.reshape(F, P, -1)[:L]
                       if agg_obj is not None else None)
        else:  # 'mca': local frames query (local + global) keys
            agg_cls, _ = MCAg2l(4 * hidden, self.heads, reconf=False,
                                dtype=self.dtype, name="agg")(
                f_cls, f_reg, props.cls_conf, props.obj, props.valid, L,
                sim_thresh=self.sim_thresh, ave=self.ave,
                use_mask=self.use_mask)
            agg_obj = None
            if self.decouple_reg:
                _, agg_obj = MCAg2l(4 * hidden, self.heads, reconf=True,
                                    dtype=self.dtype, name="agg_iou")(
                    f_cls, f_reg, props.cls_conf, props.obj, props.valid,
                    L, sim_thresh=self.sim_thresh, ave=self.ave,
                    use_mask=self.use_mask)

        out["refined_cls_logits"] = nn.Dense(
            C, dtype=self.dtype, name="cls_pred")(agg_cls)
        if self.reconf and agg_obj is not None:
            out["refined_obj_logits"] = nn.Dense(
                1, dtype=self.dtype, name="obj_pred")(agg_obj)[..., 0]
        return out


class OnlineBank(NamedTuple):
    """Rolling proposal-feature bank for streaming YOLOV
    (yolov_msa_online.py:282-294 `other_result`): fixed-capacity
    device-resident FIFO over past frames' proposals."""
    cls_feat: jax.Array   # (B, h)
    reg_feat: jax.Array   # (B, h)
    cls_score: jax.Array  # (B,)
    fg_score: jax.Array   # (B,)
    valid: jax.Array      # (B,) bool
    ptr: jax.Array        # () int32 — next write slot (ring buffer)


def init_online_bank(capacity: int, hidden: int,
                     dtype=jnp.float32) -> OnlineBank:
    return OnlineBank(
        jnp.zeros((capacity, hidden), dtype),
        jnp.zeros((capacity, hidden), dtype),
        jnp.zeros((capacity,), dtype), jnp.zeros((capacity,), dtype),
        jnp.zeros((capacity,), bool), jnp.zeros((), jnp.int32))


def bank_push(bank: OnlineBank, cls_feat, reg_feat, cls_score, fg_score,
              valid) -> OnlineBank:
    """Ring-buffer insert of one frame's P proposals (the fixed-shape
    equivalent of the reference's random-eviction list bank)."""
    P = cls_feat.shape[0]
    B = bank.cls_feat.shape[0]
    idx = (bank.ptr + jnp.arange(P)) % B

    def put(buf, new):
        return buf.at[idx].set(new.astype(buf.dtype))

    return OnlineBank(put(bank.cls_feat, cls_feat),
                      put(bank.reg_feat, reg_feat),
                      put(bank.cls_score, cls_score),
                      put(bank.fg_score, fg_score),
                      put(bank.valid, valid),
                      (bank.ptr + P) % B)


class YOLOVOnlineHead(nn.Module):
    """Online streaming YOLOV head (yolov_msa_online.py:27): ONE frame per
    call; queries = current proposals, keys/values = current + bank;
    returns refined logits and the updated bank as explicit carry."""

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

        all_cls = jnp.concatenate([f_cls, bank.cls_feat], 0)
        all_reg = jnp.concatenate([f_reg, bank.reg_feat], 0)
        all_cs = jnp.concatenate([cs, bank.cls_score], 0)
        all_fs = jnp.concatenate([fs, bank.fg_score], 0)
        all_vl = jnp.concatenate([vl, bank.valid], 0)

        # cross-attention: current frame queries the merged set
        from .aggregation import MCACore
        agg, _ = MCACore(self.heads, reconf=False, dtype=self.dtype,
                         name="agg")(
            all_cls, all_reg, all_cs, all_fs, all_vl, P,
            sim_thresh=self.sim_thresh, ave=self.ave)
        agg = nn.Dense(4 * hidden, dtype=self.dtype, name="agg_proj")(agg)
        refined = nn.Dense(C, dtype=self.dtype, name="cls_pred")(agg)

        new_bank = bank_push(bank, f_cls, f_reg, cs, fs, vl)
        return {"raw_outputs": raw_outputs, "hw": hw, "decoded": decoded,
                "proposals": props,
                "refined_cls_logits": refined[None],
                "bank": new_bank}
