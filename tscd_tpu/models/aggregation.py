"""Cross-frame attention aggregation (reference: yolox/models/post_trans.py).

TPU-first rebuild of the TSCD/YOLOV feature-aggregation zoo:

- `DualBranchAttention` — the shared core of Attention_msa
  (post_trans.py:717) and Attention_mca_g2l (:550): cosine-normalized QK
  attention x scale x score-guidance on the cls branch, dual cls/reg
  softmaxes averaged, output [attn V | V], plus the similarity masks for
  the "ave" round-2 pooling. Returns raw pieces; wrappers below compose
  them the way each reference wrapper does.
- `MCAg2l` <-> MCA_tscd_g2l_reg (:1109) + Attention_mca_g2l internals:
  each local frame's proposals attend to (own frame + all global frames);
  round-2 pools raw V (C) -> concat to 3C -> linear to out_dim. The
  reference loops local frames in Python on ragged shapes; here they are
  a vmapped batch axis over fixed P-slot proposals with validity masks.
- `MSAYolov` <-> MSA_yolov (:1227): full self-attention over all frames'
  proposals; linear1(2C->2C), round-2 pools the PROJECTED features
  (2C) -> 4C -> linear2 to out_dim.

All proposal tensors are fixed-shape with bool validity masks; invalid
keys are excluded from both softmaxes and the round-2 pooling.
"""

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG = -1e9


def _split_heads(x: jax.Array, h: int) -> jax.Array:
    n, c = x.shape
    return x.reshape(n, h, c // h).swapaxes(0, 1)  # (h, n, d)


def _merge_heads(x: jax.Array) -> jax.Array:
    return x.swapaxes(0, 1).reshape(x.shape[1], -1)


def _l2norm(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class AttnPieces(NamedTuple):
    out_cls: jax.Array        # (q, 2C) [attn V_cls | V_cls[:q]]
    out_reg: jax.Array        # (q, 2C)
    sim_round2: jax.Array     # (q, k) normalized cls similarity weights
    obj_round2: jax.Array     # (q, k) normalized reg similarity weights
    v_cls: jax.Array          # (k, C) merged value features
    v_reg: jax.Array          # (k, C)


class DualBranchAttention(nn.Module):
    """Shared attention core. `cross=True`: q from first n_query tokens via
    dedicated q projections, kv over all tokens (Attention_mca_g2l).
    `cross=False`: joint qkv projections, queries = all tokens
    (Attention_msa)."""

    num_heads: int = 4
    scale: float = 25.0
    cross: bool = True
    qkv_bias: bool = False
    use_pallas: Optional[bool] = None   # None = auto (TPU backend only)
    # Attention_msa_online (post_trans.py:950) KEEPS fg-score guidance on
    # the reg-branch logits; the offline heads dropped it upstream
    reg_score_guidance: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls: jax.Array, x_reg: jax.Array,
                 cls_score: Optional[jax.Array], fg_score: Optional[jax.Array],
                 key_valid: jax.Array, n_query: int,
                 sim_thresh: float = 0.75,
                 use_mask: bool = False, conf_sim_thresh: float = 0.99
                 ) -> AttnPieces:
        C = x_cls.shape[-1]
        h = self.num_heads
        dense = lambda n, f: nn.Dense(f, use_bias=self.qkv_bias,
                                      dtype=self.dtype, name=n)

        if self.cross:
            q_cls = dense("q_cls_local", C)(x_cls[:n_query])
            k_cls, v_cls = jnp.split(dense("kv_cls", 2 * C)(x_cls), 2, -1)
            q_reg = dense("q_reg_local", C)(x_reg[:n_query])
            k_reg, v_reg = jnp.split(dense("kv_reg", 2 * C)(x_reg), 2, -1)
        else:
            q_cls, k_cls, v_cls = jnp.split(
                dense("qkv_cls", 3 * C)(x_cls), 3, -1)
            q_reg, k_reg, v_reg = jnp.split(
                dense("qkv_reg", 3 * C)(x_reg), 3, -1)
            q_cls, q_reg = q_cls[:n_query], q_reg[:n_query]

        qc0, kc0, vc = (_split_heads(z, h) for z in (q_cls, k_cls, v_cls))
        qr0, kr0, vr = (_split_heads(z, h) for z in (q_reg, k_reg, v_reg))
        vcn, vrn = _l2norm(vc), _l2norm(vr)

        f32 = jnp.float32
        fused_ok = ((not use_mask) and (not self.reg_score_guidance)
                    and (self.use_pallas if self.use_pallas is not None
                         else jax.default_backend() == "tpu"))
        cls_mask = None
        if fused_ok:
            # one-kernel path: cosine QK x scale x score-guide, dual
            # masked softmax average, attn@V both branches, all in VMEM
            from ..ops.pallas.fused_attention import fused_dual_attention
            score = (cls_score.astype(f32) if cls_score is not None
                     else jnp.ones(x_cls.shape[0], f32))
            x, xr, attn = fused_dual_attention(
                qc0, kc0, vc, qr0, kr0, vr, score, key_valid,
                scale=self.scale)
            x, xr = _merge_heads(x), _merge_heads(xr)
        else:
            qc, kc, qr, kr = map(_l2norm, (qc0, kc0, qr0, kr0))
            logits_cls = jnp.einsum("hqd,hkd->hqk", qc, kc,
                                    preferred_element_type=f32) * self.scale
            logits_reg = jnp.einsum("hqd,hkd->hqk", qr, kr,
                                    preferred_element_type=f32) * self.scale

            # score guidance on the cls branch only (post_trans.py:658,776;
            # reg-branch guidance removed upstream 2023.12.5)
            if cls_score is not None:
                logits_cls = logits_cls * cls_score.astype(f32)[None, None, :]
            if self.reg_score_guidance and fg_score is not None:
                logits_reg = logits_reg * fg_score.astype(f32)[None, None, :]
            if use_mask and cls_score is not None and fg_score is not None:
                # score-window mask multiplies the CLS logits only; the
                # reg branch carries no score guidance at all (removed
                # upstream 2023.12.5, post_trans.py:778). fg_mask still
                # participates in the round-2 sim_mask (:818).
                cs, fs = cls_score.astype(f32), fg_score.astype(f32)
                cls_mask = (cs[None, :] > cs[:n_query, None] - 0.1).astype(f32)
                fg_mask = (fs[None, :] > fs[:n_query, None] - 0.1).astype(f32)
                logits_cls = logits_cls * cls_mask[None]
                cls_mask = cls_mask * fg_mask

            kmask = jnp.where(key_valid[None, None, :], 0.0, NEG)
            attn_cls = jax.nn.softmax(logits_cls + kmask, axis=-1)
            attn_reg = jax.nn.softmax(logits_reg + kmask, axis=-1)
            attn = (attn_cls + attn_reg) * 0.5  # (h, q, k)
            x = _merge_heads(jnp.einsum("hqk,hkd->hqd", attn,
                                        vc.astype(f32)))
            xr = _merge_heads(jnp.einsum("hqk,hkd->hqd", attn,
                                         vr.astype(f32)))

        x_ori = _merge_heads(vc[:, :n_query].astype(f32))
        out_cls = jnp.concatenate([x, x_ori], -1).astype(self.dtype)
        xr_ori = _merge_heads(vr[:, :n_query].astype(f32))
        out_reg = jnp.concatenate([xr, xr_ori], -1).astype(self.dtype)

        # round-2 similarity masks (post_trans.py:803-824)
        raw_cls = jnp.einsum("hqd,hkd->qk", vcn[:, :n_query].astype(f32),
                             vcn.astype(f32)) / h
        raw_reg = jnp.einsum("hqd,hkd->qk", vrn[:, :n_query].astype(f32),
                             vrn.astype(f32)) / h
        sim_mask = ((raw_cls > sim_thresh) & key_valid[None, :]).astype(f32)
        if cls_mask is not None:
            sim_mask = sim_mask * cls_mask
        obj_mask = ((raw_reg > conf_sim_thresh) & key_valid[None, :]).astype(f32)

        sim_attn = jnp.sum(attn, 0) / h
        sim_round2 = jax.nn.softmax(
            jnp.where(key_valid[None, :], sim_attn, NEG), -1)
        denom = jnp.maximum(jnp.sum(sim_mask * sim_round2, -1, keepdims=True),
                            1e-12)
        sim_round2 = sim_mask * sim_round2 / denom
        denom_o = jnp.maximum(jnp.sum(obj_mask * sim_round2, -1, keepdims=True),
                              1e-12)
        obj_round2 = obj_mask * sim_round2 / denom_o

        return AttnPieces(out_cls, out_reg,
                          sim_round2.astype(self.dtype),
                          obj_round2.astype(self.dtype),
                          _merge_heads(vc), _merge_heads(vr))


class MCACore(nn.Module):
    """Attention_mca_g2l (post_trans.py:550): core + internal 2C->2C
    linear(s) + round-2 pooling of raw V -> (q, 3C)."""

    num_heads: int = 4
    scale: float = 25.0
    reconf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls, x_reg, cls_score, fg_score, key_valid,
                 n_query, sim_thresh=0.75, ave=True, use_mask=False,
                 conf_sim_thresh=0.99):
        p = DualBranchAttention(self.num_heads, self.scale, cross=True,
                                dtype=self.dtype, name="attn")(
            x_cls, x_reg, cls_score, fg_score, key_valid, n_query,
            sim_thresh=sim_thresh, use_mask=use_mask,
            conf_sim_thresh=conf_sim_thresh)
        out_cls = nn.Dense(2 * x_cls.shape[-1], dtype=self.dtype,
                           name="linear")(p.out_cls)
        if self.reconf:
            out_reg = nn.Dense(2 * x_cls.shape[-1], dtype=self.dtype,
                               name="linear_reg")(p.out_reg)
        else:
            out_reg = p.out_reg
        if not ave:
            return out_cls, (out_reg if self.reconf else None)
        soft_sim = p.sim_round2 @ p.v_cls
        cls_feature = jnp.concatenate([soft_sim, out_cls], -1)  # (q, 3C)
        if self.reconf:
            soft_sim_reg = p.obj_round2 @ p.v_reg
            reg_feature = jnp.concatenate([soft_sim_reg, out_reg], -1)
        else:
            reg_feature = None
        return cls_feature, reg_feature


class MCAg2l(nn.Module):
    """MCA_tscd_g2l_reg (post_trans.py:1109): frame-by-frame g2l
    enhancement over fixed P-slot proposals, local frames vmapped."""

    out_dim: int
    num_heads: int = 4
    scale: float = 25.0
    reconf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_cls: jax.Array, feat_reg: jax.Array,
                 cls_score: jax.Array, fg_score: jax.Array,
                 valid: jax.Array, lframe: int,
                 sim_thresh: float = 0.75, ave: bool = True,
                 use_mask: bool = False, conf_sim_thresh: float = 0.99):
        """feat_*: (F, P, C); scores/valid: (F, P); first lframe frames are
        local. Returns (cls (lframe, P, out_dim), reg same or None)."""
        F, P, C = feat_cls.shape
        g_cls = feat_cls[lframe:].reshape(-1, C)
        g_reg = feat_reg[lframe:].reshape(-1, C)
        g_cs = cls_score[lframe:].reshape(-1)
        g_fs = fg_score[lframe:].reshape(-1)
        g_val = valid[lframe:].reshape(-1)

        core = MCACore(self.num_heads, self.scale, self.reconf,
                       dtype=self.dtype, name="mca")

        def per_frame(mdl, fc, fr, cs, fs, vl):
            return mdl(jnp.concatenate([fc, g_cls], 0),
                       jnp.concatenate([fr, g_reg], 0),
                       jnp.concatenate([cs, g_cs], 0),
                       jnp.concatenate([fs, g_fs], 0),
                       jnp.concatenate([vl, g_val], 0), P,
                       sim_thresh=sim_thresh, ave=ave, use_mask=use_mask,
                       conf_sim_thresh=conf_sim_thresh)

        out_cls, out_reg = nn.vmap(
            per_frame, variable_axes={"params": None},
            split_rngs={"params": False}, in_axes=(0, 0, 0, 0, 0))(
            core, feat_cls[:lframe], feat_reg[:lframe],
            cls_score[:lframe], fg_score[:lframe], valid[:lframe])

        out_cls = nn.Dense(self.out_dim, dtype=self.dtype,
                           name="linear")(out_cls)
        if self.reconf and out_reg is not None:
            out_reg = nn.Dense(self.out_dim, dtype=self.dtype,
                               name="linear_obj")(out_reg)
        else:
            out_reg = None
        return out_cls, out_reg


class MCAg2lAware(nn.Module):
    """Edge-aware MCA (Attention_mca_aware_g2l, post_trans.py:366 +
    MCA_tscd_aware_g2l_{cls,reg}:1071,1165): key/value features are
    SE-gated with the wavelet edge features before the cross-frame
    attention; otherwise identical to MCAg2l."""

    out_dim: int
    num_heads: int = 4
    scale: float = 25.0
    reconf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_cls: jax.Array, feat_reg: jax.Array,
                 edge: jax.Array, cls_score: jax.Array,
                 fg_score: jax.Array, valid: jax.Array, lframe: int,
                 sim_thresh: float = 0.75, ave: bool = True,
                 use_mask: bool = False, conf_sim_thresh: float = 0.99):
        from .matching import SEGate
        fused_reg = SEGate(dtype=self.dtype, name="se")(feat_reg, edge)
        return MCAg2l(self.out_dim, self.num_heads, self.scale,
                      self.reconf, dtype=self.dtype, name="mca")(
            feat_cls, fused_reg, cls_score, fg_score, valid, lframe,
            sim_thresh=sim_thresh, ave=ave, use_mask=use_mask,
            conf_sim_thresh=conf_sim_thresh)


class MSAYolov(nn.Module):
    """MSA_yolov (post_trans.py:1227): full self-attention over all
    proposals; round-2 pools the linear1-projected 2C features -> 4C ->
    linear2."""

    out_dim: int
    num_heads: int = 4
    scale: float = 25.0
    reconf: bool = False
    reg_score_guidance: bool = False   # True for the ONLINE msa variant
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_cls: jax.Array, feat_reg: jax.Array,
                 cls_score: jax.Array, fg_score: jax.Array,
                 valid: jax.Array, sim_thresh: float = 0.75,
                 ave: bool = True, use_mask: bool = False,
                 conf_sim_thresh: float = 0.99):
        """feat_*: (N, C) flattened across frames. Returns
        (cls (N, out_dim), obj (N, out_dim) or None)."""
        N, C = feat_cls.shape
        p = DualBranchAttention(self.num_heads, self.scale, cross=False,
                                reg_score_guidance=self.reg_score_guidance,
                                dtype=self.dtype, name="msa")(
            feat_cls, feat_reg, cls_score, fg_score, valid, N,
            sim_thresh=sim_thresh, use_mask=use_mask,
            conf_sim_thresh=conf_sim_thresh)
        lin1 = nn.Dense(2 * C, dtype=self.dtype, name="linear1")(p.out_cls)
        soft_sim = p.sim_round2 @ lin1                     # (N, 2C)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="linear2")(
            jnp.concatenate([soft_sim, lin1], -1))
        if self.reconf:
            lin1_obj = nn.Dense(2 * C, dtype=self.dtype,
                                name="linear1_obj")(p.out_reg)
            soft_obj = p.obj_round2 @ lin1_obj
            out_obj = nn.Dense(self.out_dim, dtype=self.dtype,
                               name="linear2_obj")(
                jnp.concatenate([soft_obj, lin1_obj], -1))
        else:
            out_obj = None
        return out, out_obj
