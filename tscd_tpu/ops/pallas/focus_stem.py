"""Pallas TPU kernel for the Focus stem (eval path).

The Focus stem — space-to-depth + 3x3 conv + BN + SiLU
(reference network_blocks.py:267) — is algebraically one 6x6 stride-2
conv over the raw (B, H, W, 3) image. XLA's conv emitter runs that at
~1.4% MXU on v5e (13.6 ms of the 30 ms TSCD-Large backbone,
tools/profile_backbone.py): C_in=3 forces a vector-unit lowering. Every
XLA reformulation measured the same or worse (one-hot s2d conv,
channel padding, 4-phase decomposition, im2col) — a 3-channel minor
dimension wastes 125/128 lanes of every shuffle.

Kernel design, constrained to Mosaic ops this toolchain accepts
(sublane-split reshapes, contiguous slices, 2D dots, 128-lane splits;
it rejects other lane splits/merges, lane rolls, rank-3 dots):

- The image is viewed as packed rows (B, H, 3W) (a bitcast) and kept in
  HBM; each grid step (b, j) DMAs ONE 128-lane column strip
  [b, :, 96j : 96j+128] into VMEM (the halo overlap is why this cannot
  be a BlockSpec index_map).
- Rows de-stride via a sublane-split reshape (H/2+2, 2, 128); for each
  of the 6 kernel rows ky a contiguous sublane slice gives S_ky
  (H/2, 128), and ONE dot per ky against a BANDED weight matrix
  B_ky[6j+t, j*64+o] = W[ky*18+t, o] accumulates the conv in fp32. The
  banding pads the contraction 18 -> 128 (~7x FLOPs, ~220 GF total)
  but every op is MXU-shaped, which beats the 98%-idle XLA lowering.
  BN scale is pre-folded into W; bias + SiLU fuse into the epilogue.
- Output is written packed (B, nj, H/2, 16*64) and unpacked outside by
  a middle-axis transpose + flat reshape (both layout-cheap).

TJ=16 output columns per strip; works for any H, W multiples of 32
(the framework-wide input invariant). Gradients: custom_vjp — backward
differentiates the reference XLA formulation (identical math), so the
kernel is safe under value_and_grad even though only eval paths use it.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TJ = 16          # output columns per strip
LANES = 128      # strip width (6*TJ+12 = 108 used, padded to 128)

# Measured verdict (tools/profile_backbone.py, v5e): standalone the
# kernel beats the XLA stem (9.2 vs 13.6 ms for the 32-frame window),
# but INSIDE the full backbone program it loses (eval step 45.3 vs
# 40.7 ms) — the XLA-side strip build + packed-output reshape break
# XLA's fusion/pipelining around the stem. Kept as an explicit opt-in
# for future toolchains; the model uses the fused 6x6 XLA conv.
AUTO_ENABLE = False


def supported(h: int, w: int, c: int, ksize: int, stride: int,
              act: str) -> bool:
    return (AUTO_ENABLE
            and c == 3 and ksize == 3 and stride == 1 and act == "silu"
            and h % 2 == 0 and (w // 2) % TJ == 0)


def _pick_group(nj: int, hp: int, h2: int, n: int, in_bytes: int,
                out_bytes: int) -> int:
    """Strips per grid step: as large as divides nj within the VMEM
    budget (blocks are double-buffered by the pipeline)."""
    budget = 11 * 1024 * 1024
    for g in (6, 4, 3, 2, 1):
        need = 2 * (2 * g * hp * LANES * in_bytes + g * n * h2 * out_bytes)
        if nj % g == 0 and need <= budget:
            return g
    return 1


def _kernel(e_ref, o_in_ref, b_ref, shift_ref, o_ref, *, h2: int,
            out_ch: int, group: int):
    n = TJ * out_ch
    for s in range(group):
        ev = e_ref[0, s]                              # (h2+8, 128) bf16
        od = o_in_ref[0, s]
        acc = jnp.zeros((h2, n), jnp.float32)
        for ky in range(6):
            src = ev if ky % 2 == 0 else od
            acc = acc + jnp.dot(src[ky // 2: ky // 2 + h2],
                                b_ref[ky],
                                preferred_element_type=jnp.float32)
        y = acc + shift_ref[:]
        y = y * jax.nn.sigmoid(y)                     # SiLU
        o_ref[0, :, n * s: n * (s + 1)] = y.astype(o_ref.dtype)


def _rearrange_w(w3: jax.Array, c: int, out_ch: int) -> jax.Array:
    """(3, 3, 4C, out) Focus kernel -> (36C, out) im2col matrix in
    (ky, kx, c) tap order; s2d channel order is (dx*2+dy)*C + c."""
    w6 = w3.reshape(3, 3, 2, 2, c, out_ch)            # (u, v, dx, dy, c, o)
    w6 = w6.transpose(0, 3, 1, 2, 4, 5)               # (u, dy, v, dx, c, o)
    return w6.reshape(36 * c, out_ch)


@functools.lru_cache(maxsize=4)
def _band_mask() -> np.ndarray:
    """One-hot M[ky, l, t, j]: lane l = 6j + t of kernel row ky."""
    m = np.zeros((6, LANES, 18, TJ), np.float32)
    for j in range(TJ):
        for t in range(18):
            m[:, 6 * j + t, t, j] = 1.0
    return m


def _xla_reference(x, w3, scale, shift, out_dtype,
                   compute_dtype=jnp.float32):
    """The same math via lax.conv — used for the backward pass (fp32,
    so the transposed convs get uniform dtypes) and as the test oracle
    (bf16 to mirror the kernel's dot)."""
    B, H, W, C = x.shape
    out_ch = w3.shape[-1]
    w6 = _rearrange_w(w3, C, out_ch).reshape(6, 6, C, out_ch)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        (w6 * scale[None, None, None]).astype(compute_dtype),
        window_strides=(2, 2), padding=[(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + shift[None, None, None]
    return (y * jax.nn.sigmoid(y)).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def focus_stem(x: jax.Array, w3: jax.Array, scale: jax.Array,
               shift: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """Fused Focus stem: 6x6/s2 conv (+folded BN scale) + shift + SiLU.

    x: (B, H, W, 3); w3: (3, 3, 12, out) Focus param; scale/shift:
    (out,) folded BN. Returns (B, H/2, W/2, out) in out_dtype."""
    return _focus_stem_impl(x, w3, scale, shift, out_dtype)


def _focus_stem_impl(x, w3, scale, shift, out_dtype, interpret=False):
    B, H, W, C = x.shape
    out_ch = w3.shape[-1]
    H2, W2 = H // 2, W // 2
    nj = W2 // TJ

    wmat = _rearrange_w(w3, C, out_ch) * scale[None]  # (108, out)
    wk = wmat.reshape(6, 18, out_ch)
    bmats = jnp.einsum("kltj,kto->kljo", jnp.asarray(_band_mask()),
                       wk).reshape(6, LANES, TJ * out_ch).astype(
                           jnp.bfloat16)
    shift2 = jnp.tile(shift, TJ).reshape(1, TJ * out_ch).astype(
        jnp.float32)

    # packed rows + halo pad; the even/odd ROW split happens here as
    # pure lane slices on pair-packed rows (a (2r, L) -> (r, 2L) flat
    # reshape puts each even row at lanes [0,L) and its odd partner at
    # [L,2L)) — the in-kernel interleaved de-stride this replaces cost
    # ~6.6 ms. Column strips are pre-tiled in XLA (an in-kernel DMA
    # would need 128-aligned lane offsets; 6*TJ*j is not).
    lane_pad = 6 * TJ * (nj - 1) + LANES - (W * C + 2 * C)
    rows2 = -(-(H + 4) // 16) * 16                    # 2 * (h2pad)
    hp = rows2 // 2                                   # even/odd rows
    xp = x.astype(jnp.bfloat16).reshape(B, H, W * C)
    xp = jnp.pad(xp, ((0, 0), (2, rows2 - H - 2),
                      (2 * C, max(lane_pad, 0))))
    LW = xp.shape[-1]
    pairs = xp.reshape(B, hp, 2 * LW)
    ev = pairs[:, :, :LW]
    od = pairs[:, :, LW:]
    strips_e = jnp.stack([ev[:, :, 6 * TJ * j: 6 * TJ * j + LANES]
                          for j in range(nj)], axis=1)
    strips_o = jnp.stack([od[:, :, 6 * TJ * j: 6 * TJ * j + LANES]
                          for j in range(nj)], axis=1)  # (B,nj,hp,128)

    n = TJ * out_ch
    group = _pick_group(nj, hp, H2, n, 2,
                        jnp.dtype(out_dtype).itemsize)
    njg = nj // group
    packed = pl.pallas_call(
        functools.partial(_kernel, h2=H2, out_ch=out_ch, group=group),
        grid=(B, njg),
        in_specs=[
            pl.BlockSpec((1, group, hp, LANES),
                         lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, hp, LANES),
                         lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LANES, n), lambda b, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H2, group * n),
                               lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H2, W2 * out_ch), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nj * 6 * H2 * LANES * n,
            bytes_accessed=x.size * 2 + B * H2 * W2 * out_ch * 2,
            transcendentals=B * H2 * W2 * out_ch),
        interpret=interpret,
    )(strips_e, strips_o, bmats, shift2)

    # packed IS (B, H2, W2*out) in row-major (j, o) lane order
    return packed.reshape(B, H2, W2, out_ch)


def _fwd(x, w3, scale, shift, out_dtype):
    return _focus_stem_impl(x, w3, scale, shift, out_dtype), \
        (x, w3, scale, shift)


def _bwd(out_dtype, res, g):
    x, w3, scale, shift = res
    _, vjp = jax.vjp(
        lambda x, w3, scale, shift: _xla_reference(x, w3, scale, shift,
                                                   out_dtype),
        x, w3, scale, shift)
    return vjp(g)


focus_stem.defvjp(_fwd, _bwd)
