"""Haar DWT/IDWT and the high-frequency edge block.

Reference: yolox/models/surrounding_extraction.py — DWT_2D/IDWT_2D built
from pywt Haar filters as grouped strided conv2d (:12-128), and
WaveletsHFBlock (:215): zero the LF band, 1x1-conv+ReLU the HF bands,
inverse transform, and gate a 3x3-conv'd content map by the edge map.

TPU redesign: a Haar DWT is a 2x2 space-to-depth followed by a fixed
4x4 orthogonal mix of the four phases — pure reshapes plus one tiny
matmul, which XLA fuses; no conv needed, no pywt dependency. NHWC.

  LL = (a + b + c + d) / 2     (a=TL, b=TR, c=BL, d=BR of each 2x2 block)
  LH = (a + b - c - d) / 2     (vertical detail)
  HL = (a - b + c - d) / 2     (horizontal detail)
  HH = (a - b - c + d) / 2

which equals the reference's conv-based DWT with pywt haar filters
(dec_lo=[s,s], dec_hi=[-s,s] reversed before the outer products,
surrounding_extraction.py:111-122): ll=[[.5,.5],[.5,.5]],
lh=[[.5,.5],[-.5,-.5]], hl=[[.5,-.5],[.5,-.5]], hh=[[.5,-.5],[-.5,.5]].
Band SIGNS matter, not just the subspaces: filter1's converted torch
weights are applied to the raw HF bands before a ReLU
(tests/test_torch_parity_video.py locks this down). The inverse is the
transpose (orthonormal).
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def haar_dwt2d(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(B, H, W, C) -> (LL, LH, HL, HH) each (B, H/2, W/2, C).

    Implemented as ONE depthwise stride-2 conv with fixed orthonormal
    2x2 filters (the reference's conv formulation,
    surrounding_extraction.py:12): on the axon TPU the equivalent
    double-strided-slice formulation kernel-faults the worker at
    (32, 72, 72, 256), while grouped convs are the proven-stable path.
    """
    B, H, W, C = x.shape
    # base (2, 2, 1, 4): filter taps for [ll, lh, hl, hh] at positions
    # a=TL, b=TR, c=BL, d=BR
    base = jnp.asarray(
        [[[[0.5, 0.5, 0.5, 0.5]],        # a
          [[0.5, 0.5, -0.5, -0.5]]],     # b
         [[[0.5, -0.5, 0.5, -0.5]],      # c
          [[0.5, -0.5, -0.5, 0.5]]]],    # d
        x.dtype)
    kernel = jnp.tile(base, (1, 1, 1, C))        # (2, 2, 1, 4C)
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)                   # (B, H/2, W/2, 4C)
    out = out.reshape(B, H // 2, W // 2, C, 4)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]


def haar_idwt2d(ll: jax.Array, lh: jax.Array, hl: jax.Array,
                hh: jax.Array) -> jax.Array:
    """Inverse of haar_dwt2d: 4 bands (B, h, w, C) -> (B, 2h, 2w, C)."""
    a = (ll + lh + hl + hh) * 0.5
    b = (ll + lh - hl - hh) * 0.5
    c = (ll - lh + hl - hh) * 0.5
    d = (ll - lh - hl + hh) * 0.5
    bsz, h, w, ch = ll.shape
    out = jnp.stack([jnp.stack([a, b], axis=3),
                     jnp.stack([c, d], axis=3)], axis=2)
    # (B, h, 2, w, 2, C) -> (B, 2h, 2w, C)
    return out.reshape(bsz, h * 2, w * 2, ch)


class WaveletsHFBlock(nn.Module):
    """Edge-feature extractor on the reg branch
    (surrounding_extraction.py:215)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        H, W = x.shape[1], x.shape[2]
        # pad odd spatial dims (edge mode) so the 2x2 DWT blocks tile;
        # crop back after the inverse transform
        ph, pw = H % 2, W % 2
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge") \
            if (ph or pw) else x
        ll, lh, hl, hh = haar_dwt2d(xp)
        hf = jnp.concatenate([lh, hl, hh], axis=-1)
        hf = nn.Conv(ch * 3, (1, 1), dtype=self.dtype, name="filter1")(hf)
        hf = jax.nn.relu(hf)
        lh2, hl2, hh2 = jnp.split(hf, 3, axis=-1)
        edge = haar_idwt2d(jnp.zeros_like(ll), lh2, hl2, hh2)[
            :, :H, :W, :]
        content = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, name="filter2")(x)
        content = jax.nn.relu(content)
        return content * edge
