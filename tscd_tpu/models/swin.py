"""Swin Transformer backbone (reference: yolox/models/swin_transfomer.py:
457 SwinTransformer, WindowAttention:70, BasicLayer:314, PatchMerging).

TPU-first: NHWC throughout; window partition/shift are static reshapes
(H/W padded to window multiples at trace time); attention batches all
windows as one einsum so the MXU sees (num_windows*B, heads, 49, 49)
matmuls. Returns {"dark3","dark4","dark5"} = stride 8/16/32 features so
the PAFPN variants can consume it like CSPDarknet.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse(wins: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))            # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                 # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                        # (N, N)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask=None) -> jax.Array:
        """x: (nW*B, N, C) with N = window_size**2."""
        Bn, N, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(Bn, N, 3, h, C // h)
                            .transpose(2, 0, 3, 1, 4), 3, 0)
        q, k, v = q[0], k[0], v[0]                           # (Bn, h, N, d)
        scale = (C // h) ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h))
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(jnp.float32)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + \
                mask[None, :, None].astype(jnp.float32)
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn, -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (swin_transfomer.py:215)."""
    img_mask = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(
        -1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C)."""
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift_size if ws == self.window_size else 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(Hp, Wp, ws, shift),
                               self.dtype)
        else:
            mask = None
        wins = window_partition(x, ws).reshape(-1, ws * ws, C)
        wins = WindowAttention(self.dim, ws, self.num_heads,
                               dtype=self.dtype, name="attn")(wins, mask)
        x = window_reverse(wins.reshape(-1, ws, ws, C), ws, Hp, Wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is erf-exact
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            H, W = x.shape[1], x.shape[2]
        # reshape/transpose space-to-depth ([x0, x1, x2, x3] =
        # [(h0,w0), (h1,w0), (h0,w1), (h1,w1)]) — multi-axis strided
        # slices kernel-fault the axon TPU at large shapes
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B, H // 2, W // 2,
                                                  4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T/S/B by (embed_dim, depths, num_heads); out_indices (1,2,3)
    -> stride 8/16/32 features as {"dark3","dark4","dark5"}."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        # raw 0-255 pixels, like the reference pipeline feeds its Swin
        # (yolo_pafpn.py:143 passes the YOLOX-preproc'd image straight
        # in) — keeps converted reference checkpoints numerically exact
        x = x.astype(dt)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=dt,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="patch_norm")(x)

        outs = {}
        names = {0: "dark2", 1: "dark3", 2: "dark4", 3: "dark5"}
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i)
            for b in range(depth):
                x = SwinBlock(dim, self.num_heads[i], self.window_size,
                              shift_size=(self.window_size // 2
                                          if b % 2 else 0),
                              mlp_ratio=self.mlp_ratio, dtype=dt,
                              name=f"layer{i}_block{b}")(x)
            if i in self.out_indices:
                outs[names[i]] = nn.LayerNorm(
                    dtype=dt, name=f"out_norm{i}")(x)
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=dt, name=f"merge{i}")(x)
        return outs


def swin_tiny(**kw):
    return SwinTransformer(96, (2, 2, 6, 2), (3, 6, 12, 24), **kw)


def swin_small(**kw):
    return SwinTransformer(96, (2, 2, 18, 2), (3, 6, 12, 24), **kw)


def swin_base(**kw):
    return SwinTransformer(128, (2, 2, 18, 2), (4, 8, 16, 32), **kw)
