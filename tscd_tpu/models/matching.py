"""CAFM matcher stack (reference: yolox/models/tscd_matching.py).

TPU-first redesign of the stateful frame-recurrent matcher:

- The reference keeps previous-frame features as Python-side module state
  (`last_outputs` etc., tscd_matching.py:708-715) and calls scipy's
  Hungarian on CPU per frame (:903-935). Here the temporal bank is an
  explicit `MatcherState` pytree threaded through `lax.scan` over local
  frames (training) and across eval steps (streaming), and the assignment
  runs on device (`tscd_tpu.ops.hungarian`). `resume` becomes "pass the
  previous state in"; a fresh state (has_state=False) reproduces the
  reference's sequence-start reset (:779).
- Fixed P proposals per frame with validity masks replace the reference's
  ragged pad/truncate branches (:816-851): the masked assignment maps
  valid<->valid and invalid<->invalid, which subsumes both branches.

Components mirrored 1:1:
  SEModule (:264)                    -> SEGate
  PositionMHAttention (:11)          -> CosineMHAttention (+ position bias)
  ReferringCrossAttentionLayer(:535) -> referring_cross_attention
  CrossAttentionLayer (:394)         -> used by TaskAligned
  AwarePositionRegMatcher (:639)     -> RegMatcher (scan-based)
  TaskAligned (:1076)                -> TaskAligned
"""

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.hungarian import masked_linear_sum_assignment

NEG = -1e9


def _l2norm(x, eps=1e-6):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


class SEGate(nn.Module):
    """SEModule (tscd_matching.py:264): per-(token, channel) 2-way gate
    fusing a content feature with its edge counterpart."""

    hidden: int = 32  # channels(=2) * 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, edge: jax.Array) -> jax.Array:
        # feat/edge: (..., C). Stack to (..., C, 2), gate per pair.
        pair = jnp.stack([feat, edge], axis=-1)
        w = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="fc1")(pair)
        w = jax.nn.relu(w)
        w = nn.Dense(2, use_bias=False, dtype=self.dtype, name="fc2")(w)
        w = jax.nn.sigmoid(w)
        return feat * w[..., 0] + edge * w[..., 1]


def extract_position_matrix(bbox: jax.Array, ref_bbox: jax.Array) -> jax.Array:
    """(N,4),(M,4) xyxy -> (N, M, 4) log-relative geometry
    (tscd_matching.py:1022)."""
    def parts(b):
        w = b[:, 2] - b[:, 0] + 1
        h = b[:, 3] - b[:, 1] + 1
        cx = 0.5 * (b[:, 0] + b[:, 2])
        cy = 0.5 * (b[:, 1] + b[:, 3])
        return w, h, cx, cy

    w_r, h_r, cx_r, cy_r = parts(ref_bbox)
    w, h, cx, cy = parts(bbox)
    dx = jnp.log(jnp.abs((cx[:, None] - cx_r[None, :]) / w[:, None]) + 1e-3)
    dy = jnp.log(jnp.abs((cy[:, None] - cy_r[None, :]) / h[:, None]) + 1e-3)
    dw = jnp.log(w[:, None] / w_r[None, :])
    dh = jnp.log(h[:, None] / h_r[None, :])
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def extract_position_embedding(pos_mat: jax.Array, feat_dim: int = 64,
                               wave_length: float = 1000.0) -> jax.Array:
    """(N, M, 4) -> (N, M, feat_dim) sinusoidal (tscd_matching.py:998)."""
    rng = jnp.arange(feat_dim // 8, dtype=jnp.float32)
    dim_mat = jnp.power(wave_length, (8.0 / feat_dim) * rng)
    div = (pos_mat[..., None] * 100.0) / dim_mat
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=-1)
    return emb.reshape(*pos_mat.shape[:2], -1)


class CosineMHAttention(nn.Module):
    """PositionMHAttention (tscd_matching.py:11): cosine-normalized QK,
    softmax, optional log-position bias ADDED TO THE SOFTMAXED attention
    (reference quirk, :56) before the value matmul."""

    num_heads: int = 8
    qkv_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_valid=None,
                 q_boxes=None, k_boxes=None):
        N, C = query.shape
        h = self.num_heads
        d = lambda n: nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                               name=n)
        q = d("q_reg")(query).reshape(-1, h, C // h).swapaxes(0, 1)
        k = d("k_reg")(key).reshape(-1, h, C // h).swapaxes(0, 1)
        v = d("v_reg")(value).reshape(-1, h, C // h).swapaxes(0, 1)
        q, k = _l2norm(q), _l2norm(k)
        logits = jnp.einsum("hqd,hkd->hqk", q, k,
                            preferred_element_type=jnp.float32)
        if key_valid is not None:
            logits = logits + jnp.where(key_valid[None, None, :], 0.0, NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        if q_boxes is not None and k_boxes is not None:
            pe = extract_position_embedding(
                extract_position_matrix(q_boxes, k_boxes))  # (q, k, 64)
            bias = nn.Dense(h, dtype=self.dtype, name="position_embedding")(pe)
            bias = jax.nn.relu(bias).transpose(2, 0, 1)      # (h, q, k)
            attn = jnp.log(bias.astype(jnp.float32) + 1e-6) + attn
        out = jnp.einsum("hqk,hkd->hqd", attn, v.astype(jnp.float32))
        return out.swapaxes(0, 1).reshape(N, C).astype(self.dtype)


class ReferringCrossAttention(nn.Module):
    """ReferringCrossAttentionLayer (tscd_matching.py:535), post-norm:
    out = LayerNorm(identify + attn(q=SE(tgt,q_edge)+q_pos,
                                    k=SE(mem,edge)+pos, v=mem))."""

    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, identify, tgt, memory, pos, query_pos,
                 edge, query_edge, key_valid=None):
        gate = SEGate(dtype=self.dtype, name="CA")
        q = gate(tgt, query_edge) + query_pos
        k = gate(memory, edge) + pos
        out = CosineMHAttention(self.num_heads, dtype=self.dtype,
                                name="attn")(q, k, memory, key_valid)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(
            identify + out).astype(self.dtype)


class MatcherState(NamedTuple):
    """Device-resident temporal bank (reference last_* attrs, :708-715)."""
    out: jax.Array         # (P, C) last layer output, matched order
    reg_embeds: jax.Array  # (P, Cr) agg-enhanced reg embeds for matching
    cls_embeds: jax.Array  # (P, Cr)
    edge: jax.Array        # (P, C)
    time: jax.Array        # (C,) projected time embedding
    valid: jax.Array       # (P,)
    has_state: jax.Array   # () bool


def init_matcher_state(p: int, c: int, cr: int,
                       dtype=jnp.float32) -> MatcherState:
    z = jnp.zeros
    return MatcherState(z((p, c), dtype), z((p, cr), dtype), z((p, cr), dtype),
                        z((p, c), dtype), z((c,), dtype),
                        jnp.zeros((p,), bool), jnp.array(False))


def dual_match_cost(prev_cls, cur_cls, prev_reg, cur_reg):
    """1 - mean cosine similarity over both branches
    (double_match_embds, tscd_matching.py:912). fp32 accumulate — on TPU
    the default matmul precision is bf16, too coarse for a cost whose
    optimum is decided by ~1e-3 margins."""
    f32 = jnp.float32
    sim_cls = jnp.einsum("nc,mc->nm", _l2norm(prev_cls), _l2norm(cur_cls),
                         preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)
    sim_reg = jnp.einsum("nc,mc->nm", _l2norm(prev_reg), _l2norm(cur_reg),
                         preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)
    c = 1.0 - (sim_cls + sim_reg) / 2.0
    return jnp.nan_to_num(c, nan=0.0)


class RegMatcher(nn.Module):
    """AwarePositionRegMatcher (tscd_matching.py:639) with explicit state.

    Per local frame: Hungarian-match previous<->current proposals on dual
    cosine cost, permute current to matched order, run the referring
    cross-attention conditioned on time + edge features, unsort, update
    the bank. decoder_layer_num is 1 in the TSCD config (tscd_head.py:122).
    """

    num_heads: int = 8
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, reg_embeds, cls_embeds, edges, time_emb,
                 valid, state: MatcherState
                 ) -> Tuple[jax.Array, MatcherState]:
        """feats/edges: (L, P, C); reg/cls_embeds: (L, P, Cr);
        time_emb: (L, 256) raw sinusoidal; valid: (L, P).
        Returns (outputs (L, P, C) in original order, new state)."""
        L, P, C = feats.shape
        time_proj = nn.Dense(C, dtype=self.dtype,
                             name="absolute_position_embedding")(time_emb)
        layers = [ReferringCrossAttention(self.num_heads, dtype=self.dtype,
                                          name=f"layer_{j}")
                  for j in range(self.num_layers)]
        norm = nn.LayerNorm(dtype=jnp.float32, name="decoder_norm")

        def step(st: MatcherState, xs):
            feat, reg_e, cls_e, edge, t, vl = xs
            first = ~st.has_state
            cost = dual_match_cost(st.cls_embeds, cls_e, st.reg_embeds, reg_e)
            perm = masked_linear_sum_assignment(cost, st.valid, vl)
            # first frame of a sequence: identity assignment (reference
            # matches the frame against itself, :788)
            perm = jnp.where(first, jnp.arange(P), perm)

            m_feat = feat[perm]       # current tokens in matched order
            m_edge = edge[perm]
            # per-row freshness: the first frame self-references every
            # token (:790-796); on streaming frames a current proposal
            # assigned to an EMPTY bank slot (more proposals than the
            # bank holds) is self-referenced too — the reference appends
            # unmatched current features to the memory (:816-837) —
            # while live rows query the bank (:856-862)
            fresh = first | ~st.valid                       # (P,)
            tgt0 = jnp.where(fresh[:, None], m_feat, st.out)
            prev_edge = jnp.where(fresh[:, None], m_edge, st.edge)
            prev_time = jnp.where(first, t, st.time)

            out = m_feat
            for li, layer in enumerate(layers):
                identify = out
                # layers >0: the first-frame branch chains the previous
                # layer's output (:799-806); the streaming branch keeps
                # querying the bank (:865-871)
                layer_tgt = tgt0 if li == 0 else jnp.where(first, out, tgt0)
                out = layer(identify, layer_tgt, feat,
                            pos=t[None, :], query_pos=prev_time[None, :],
                            edge=edge, query_edge=prev_edge, key_valid=vl)

            inv = jnp.argsort(perm)
            frame_out = out[inv]

            new_state = MatcherState(
                out=out, reg_embeds=reg_e[perm], cls_embeds=cls_e[perm],
                edge=m_edge, time=t, valid=vl[perm],
                has_state=jnp.array(True))
            return new_state, frame_out

        xs = (feats, reg_embeds, cls_embeds, edges, time_proj, valid)
        # python loop over local frames: L is small (1-4) and static, and
        # flax params must be created eagerly; XLA unrolls this fine
        outs = []
        for i in range(L):
            state, frame_out = step(
                state, jax.tree_util.tree_map(lambda a: a[i], xs))
            outs.append(frame_out)
        outputs = jnp.stack(outs, 0)
        outputs = norm(outputs).astype(self.dtype)
        return outputs, state


class TaskAligned(nn.Module):
    """TaskAligned (tscd_matching.py:1076): per-frame cross-attention
    aligning obj features to the matched reg features; post-norm
    CrossAttentionLayer stack + final LayerNorm."""

    num_heads: int = 8
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_reg, feat_obj, valid):
        """feat_reg/feat_obj: (L, P, C); valid (L, P).
        Returns (L, P, C)."""

        out = feat_obj
        for j in range(self.num_layers):
            attn = CosineMHAttention(self.num_heads, dtype=self.dtype,
                                     name=f"attn_{j}")
            ln = nn.LayerNorm(dtype=jnp.float32, name=f"norm_{j}")

            def per_frame(mdl, o, r, vl):
                a = mdl(o, r, r, key_valid=vl)
                return a

            a = nn.vmap(per_frame, variable_axes={"params": None},
                        split_rngs={"params": False},
                        in_axes=(0, 0, 0))(attn, out, feat_reg, valid)
            out = ln(out + a).astype(self.dtype)
        return nn.LayerNorm(dtype=jnp.float32,
                            name="decoder_norm")(out).astype(self.dtype)
