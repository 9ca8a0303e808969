"""Banded-matmul lowering of the Focus stem — pure XLA, MXU-shaped.

The Focus stem (space-to-depth + 3x3 conv + BN + SiLU, reference
network_blocks.py:267) is algebraically one 6x6 stride-2 conv over the
raw (B, H, W, 3) image. XLA's conv emitter lowers any C_in=3 conv to
the vector units at ~1.4% MXU (13.6 ms of the TSCD-Large eval step,
PROFILE.md), and a Pallas banded kernel that wins standalone loses
in-program because the pallas_call boundary breaks XLA fusion around
the stem (ops/pallas/focus_stem.py).

This lowering keeps the banded-weight trick but expresses it as plain
XLA ops, so the compiler can fuse/pipeline across it:

- Rows are packed to (B, H, 3W) and pair-packed to (B, H/2, 2*3W) so
  the even/odd row de-stride is a pair of CONTIGUOUS lane slices (no
  strided/shuffled access on the 3-channel minor dim — the pathology).
- For each of the 6 kernel rows ky the source is a sublane-shifted
  slice of the even/odd plane; per output-column strip j (TJ=16
  output columns) the needed lanes are one contiguous 128-lane window
  at offset 96j. Stacking (strip, ky) gives an lhs of shape
  (B, H/2, nj, 6*128).
- ONE dot with a banded weight matrix Wb[ky*128 + 6j + t, j*out + o]
  = W[ky*18 + t, o] computes the whole conv: contraction K=768,
  N=TJ*out — MXU-shaped. Banding pads the 108-tap contraction ~7x
  (261 GFLOP padded vs 38 useful for the 32x576x576 window) but a
  padded MXU matmul at even 50% peak is ~2.7 ms vs the 13.6 ms
  vector-unit conv.
- BN scale folds into Wb; bias + SiLU are the dot's epilogue. The
  (nj, TJ*out) minor dims ARE (W/2, out) row-major, so the output
  reshape is layout-free.

Gradients: custom_vjp — the backward differentiates the equivalent
lax.conv formulation (identical math); only eval paths use this.
"""

import functools
import os

import jax
import jax.numpy as jnp

# banded-weight construction + the lax.conv oracle/backward are shared
# with the Pallas kernel (same math, different lowering)
from .pallas.focus_stem import (_band_mask, _rearrange_w,
                                _xla_reference)

TJ = 16          # output columns per strip
LANES = 128      # strip width (6*TJ + 12 = 108 used, padded to 128)

# Measured verdict (tools/profile_backbone.py, v5e, 2026-08-17): the
# banded dot runs at ~11% MXU (the 7x-padded 262 GF costs ~12 ms, vs
# 9.2 ms for the same-day 6x6 conv baseline) and its output layout
# slows dark2's first conv by a further ~4 ms — in-program the banded
# cut loses 23.1 vs 15.8 ms through dark3. Large-M matmuls at
# (165888, 768)@(768, 1024) measure ~36 TF/s standalone on this
# toolchain, so the padded-contraction trade never pays. Kept as an
# opt-in (TSCD_BANDED_STEM=1) for future toolchains; the model uses
# the fused 6x6 XLA conv.
AUTO_ENABLE = os.environ.get("TSCD_BANDED_STEM", "0") == "1"


def supported(h: int, w: int, c: int, ksize: int, stride: int,
              act: str) -> bool:
    return (AUTO_ENABLE
            and c == 3 and ksize == 3 and stride == 1 and act == "silu"
            and h % 2 == 0 and (w // 2) % TJ == 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def focus_stem_banded(x: jax.Array, w3: jax.Array, scale: jax.Array,
                      shift: jax.Array,
                      out_dtype=jnp.bfloat16) -> jax.Array:
    """Fused Focus stem: 6x6/s2 conv (+folded BN scale) + shift + SiLU.

    x: (B, H, W, 3); w3: (3, 3, 12, out) Focus param; scale/shift:
    (out,) folded BN. Returns (B, H/2, W/2, out) in out_dtype."""
    return _impl(x, w3, scale, shift, out_dtype)


def _impl(x, w3, scale, shift, out_dtype):
    B, H, W, C = x.shape
    out_ch = w3.shape[-1]
    H2, W2 = H // 2, W // 2
    nj = W2 // TJ
    n = TJ * out_ch

    # banded weight (6*128, TJ*out), BN scale folded in
    wmat = _rearrange_w(w3, C, out_ch) * scale[None]  # (108, out) fp32
    wk = wmat.reshape(6, 18, out_ch)
    wb = jnp.einsum("kltj,kto->kljo", jnp.asarray(_band_mask()),
                    wk).reshape(6 * LANES, n).astype(jnp.bfloat16)

    # packed rows, conv halo pad (2 rows/cols each side), lane pad so
    # the last strip's 128-lane window is in bounds
    lane_pad = 6 * TJ * (nj - 1) + LANES - (W * C + 2 * C)
    xp = x.astype(jnp.bfloat16).reshape(B, H, W * C)
    xp = jnp.pad(xp, ((0, 0), (2, 2), (2 * C, max(lane_pad, 0))))
    LW = xp.shape[-1]
    hp = (H + 4) // 2
    pairs = xp.reshape(B, hp, 2 * LW)
    ev = pairs[:, :, :LW]                             # even padded rows
    od = pairs[:, :, LW:]                             # odd padded rows

    # lhs (B, H2, nj, 6*128): sublane shift per kernel row, contiguous
    # 128-lane window per strip
    planes = [(ev if ky % 2 == 0 else od)[:, ky // 2: ky // 2 + H2]
              for ky in range(6)]                     # 6 x (B, H2, LW)
    lhs = jnp.stack(
        [jnp.stack([p[:, :, 6 * TJ * j: 6 * TJ * j + LANES]
                    for j in range(nj)], axis=2)      # (B, H2, nj, 128)
         for p in planes], axis=3)                    # (B, H2, nj, 6, 128)
    lhs = lhs.reshape(B, H2, nj, 6 * LANES)

    y = jnp.einsum("bhjk,kn->bhjn", lhs, wb,
                   preferred_element_type=jnp.float32)
    y = y + jnp.tile(shift, TJ)[None, None, None].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)                         # SiLU
    # (nj, TJ*out) minor dims are (W2, out) row-major: reshape is free
    return y.astype(out_dtype).reshape(B, H2, W2, out_ch)


def _fwd(x, w3, scale, shift, out_dtype):
    return _impl(x, w3, scale, shift, out_dtype), (x, w3, scale, shift)


def _bwd(out_dtype, res, g):
    x, w3, scale, shift = res
    _, vjp = jax.vjp(
        lambda x, w3, scale, shift: _xla_reference(x, w3, scale, shift,
                                                   out_dtype),
        x, w3, scale, shift)
    return vjp(g)


focus_stem_banded.defvjp(_fwd, _bwd)
