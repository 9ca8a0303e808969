"""Pallas TPU kernel: fused dual-branch (cls/reg) proposal attention.

The hot op of the YOLOV/TSCD aggregation stack (reference
post_trans.py:550,717 — Attention_mca_g2l / Attention_msa): both branches
share one attention map built from cosine-normalized QK logits, score
guidance on the cls branch, validity masking, two softmaxes averaged,
then attn @ V for both branches plus the head-mean attention used by the
round-2 similarity pooling.

Unfused, XLA materializes the (h, q, k) logits/softmax intermediates in
HBM several times (two logit tensors, two softmaxes, the average, two
weighted sums). This kernel keeps everything for one head in VMEM: one
grid step = one head, one HBM read per operand, one write per output.

Proposal-attention sizes (q<=128 local slots, k = F*P <= 2048, d = C/h
<= 128) fit VMEM comfortably, so no k-blocking/flash recurrence is
needed — the win is fusion, not streaming. Padding to lane multiples is
the caller's job (`fused_dual_attention` pads + unpads).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def _kernel(qc_ref, kc_ref, vc_ref, qr_ref, kr_ref, vr_ref,
            score_ref, kmask_ref,
            out_cls_ref, out_reg_ref, attn_ref, *, scale: float):
    f32 = jnp.float32
    qc = qc_ref[0].astype(f32)
    kc = kc_ref[0].astype(f32)
    qr = qr_ref[0].astype(f32)
    kr = kr_ref[0].astype(f32)

    def l2n(x):
        return x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-24))

    lc = jnp.dot(l2n(qc), l2n(kc).T, preferred_element_type=f32) * scale
    lr = jnp.dot(l2n(qr), l2n(kr).T, preferred_element_type=f32) * scale
    lc = lc * score_ref[:]                 # (1, k) score guidance, cls only
    neg = kmask_ref[:]                     # (1, k): 0 valid, NEG invalid

    def softmax(lg):
        lg = lg + neg
        m = jnp.max(lg, -1, keepdims=True)
        e = jnp.exp(lg - m)
        return e / jnp.maximum(jnp.sum(e, -1, keepdims=True), 1e-24)

    attn = 0.5 * (softmax(lc) + softmax(lr))           # (q, k)
    out_cls_ref[0] = jnp.dot(attn, vc_ref[0].astype(f32),
                             preferred_element_type=f32)
    out_reg_ref[0] = jnp.dot(attn, vr_ref[0].astype(f32),
                             preferred_element_type=f32)
    attn_ref[0] = attn


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_dual_attention(qc, kc, vc, qr, kr, vr, cls_score, key_valid,
                         scale: float = 25.0, interpret: bool = False
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """All inputs per-head: q* (h, q, d); k*/v* (h, k, d);
    cls_score (k,); key_valid (k,) bool.

    Returns (out_cls (h, q, d) f32, out_reg (h, q, d) f32,
    attn (h, q, k) f32 — per-head averaged dual softmax).

    Differentiable: the forward runs the Pallas kernel; the backward is
    the VJP of the mathematically-identical jnp reference (the standard
    fused-kernel custom_vjp pattern — same recompute cost as remat)."""
    return _fused_forward(qc, kc, vc, qr, kr, vr, cls_score, key_valid,
                          scale, interpret)


def _fused_fwd_rule(qc, kc, vc, qr, kr, vr, cls_score, key_valid,
                    scale, interpret):
    out = _fused_forward(qc, kc, vc, qr, kr, vr, cls_score, key_valid,
                         scale, interpret)
    return out, (qc, kc, vc, qr, kr, vr, cls_score, key_valid)


def _fused_bwd_rule(scale, interpret, res, g):
    qc, kc, vc, qr, kr, vr, cls_score, key_valid = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e, f: dual_attention_reference(
            a, b, c, d, e, f, cls_score, key_valid, scale),
        qc, kc, vc, qr, kr, vr)
    dqc, dkc, dvc, dqr, dkr, dvr = vjp(g)
    import numpy as _np
    zero_valid = _np.zeros(key_valid.shape, dtype=jax.dtypes.float0)
    return (dqc, dkc, dvc, dqr, dkr, dvr,
            jnp.zeros_like(cls_score), zero_valid)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_forward(qc, kc, vc, qr, kr, vr, cls_score, key_valid,
                   scale: float = 25.0, interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, q, d = qc.shape
    k = kc.shape[1]
    qc_, qr_ = (_pad_to(_pad_to(x, 8, 1), 128, 2) for x in (qc, qr))
    kc_, kr_, vc_, vr_ = (_pad_to(_pad_to(x, 128, 1), 128, 2)
                          for x in (kc, kr, vc, vr))
    qp, dp = qc_.shape[1], qc_.shape[2]
    kp = kc_.shape[1]
    score = _pad_to(cls_score.astype(jnp.float32).reshape(1, k), 128, 1)
    kmask = _pad_to(
        jnp.where(key_valid, 0.0, NEG).astype(jnp.float32).reshape(1, k),
        128, 1)
    # padded keys are invalid
    pad_neg = jnp.where(jnp.arange(kp) < k, 0.0, NEG).reshape(1, kp)
    kmask = kmask + pad_neg

    spec_q = pl.BlockSpec((1, qp, dp), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, kp, dp), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vec = pl.BlockSpec((1, kp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    out_cls, out_reg, attn = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(h,),
        in_specs=[spec_q, spec_k, spec_k, spec_q, spec_k, spec_k,
                  spec_vec, spec_vec],
        out_specs=[
            pl.BlockSpec((1, qp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, qp, dp), jnp.float32),
            jax.ShapeDtypeStruct((h, qp, dp), jnp.float32),
            jax.ShapeDtypeStruct((h, qp, kp), jnp.float32),
        ],
        interpret=interpret,
    )(qc_, kc_, vc_, qr_, kr_, vr_, score, kmask)
    return out_cls[:, :q, :d], out_reg[:, :q, :d], attn[:, :q, :k]


fused_dual_attention.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def dual_attention_reference(qc, kc, vc, qr, kr, vr, cls_score, key_valid,
                             scale: float = 25.0):
    """Pure-jnp reference used for parity tests and as the non-TPU path."""
    f32 = jnp.float32

    def l2n(x):
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    lc = jnp.einsum("hqd,hkd->hqk", l2n(qc.astype(f32)),
                    l2n(kc.astype(f32))) * scale
    lr = jnp.einsum("hqd,hkd->hqk", l2n(qr.astype(f32)),
                    l2n(kr.astype(f32))) * scale
    lc = lc * cls_score.astype(f32)[None, None, :]
    neg = jnp.where(key_valid, 0.0, NEG)[None, None, :]
    attn = 0.5 * (jax.nn.softmax(lc + neg, -1)
                  + jax.nn.softmax(lr + neg, -1))
    out_cls = jnp.einsum("hqk,hkd->hqd", attn, vc.astype(f32))
    out_reg = jnp.einsum("hqk,hkd->hqd", attn, vr.astype(f32))
    return out_cls, out_reg, attn
