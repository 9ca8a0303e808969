"""Layer zoo (reference: yolox/models/custom_layers.py — PaddleDet-style
helpers incl. pure-python MyDCNv2:88, CoordConv:664, DropBlock:839).

TPU notes: deformable conv is expressed as bilinear gather over offset
grids (XLA lowers the gathers; no custom CUDA); DropBlock uses a
max-pool to expand the dropped seed mask."""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class CoordConv(nn.Module):
    """Concat normalized x/y coordinate channels then conv
    (custom_layers.py:664)."""

    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        gy = jnp.linspace(-1.0, 1.0, H, dtype=self.dtype)
        gx = jnp.linspace(-1.0, 1.0, W, dtype=self.dtype)
        yy = jnp.broadcast_to(gy[None, :, None, None], (B, H, W, 1))
        xx = jnp.broadcast_to(gx[None, None, :, None], (B, H, W, 1))
        x = jnp.concatenate([x, xx.astype(x.dtype), yy.astype(x.dtype)],
                            -1)
        return nn.Conv(self.out_channels,
                       (self.kernel_size,) * 2, dtype=self.dtype,
                       name="conv")(x)


class DropBlock(nn.Module):
    """Structured dropout (custom_layers.py:839): drop contiguous
    block_size x block_size regions."""

    block_size: int = 3
    keep_prob: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 rng=None) -> jax.Array:
        if not train or self.keep_prob >= 1.0:
            return x
        if rng is None:
            rng = self.make_rng("dropout")
        B, H, W, C = x.shape
        gamma = ((1.0 - self.keep_prob) / (self.block_size ** 2)
                 * (H * W) / max((H - self.block_size + 1)
                                 * (W - self.block_size + 1), 1))
        seed = jax.random.bernoulli(rng, gamma, (B, H, W, C))
        block_mask = nn.max_pool(seed.astype(jnp.float32),
                                 (self.block_size,) * 2, strides=(1, 1),
                                 padding="SAME")
        keep = 1.0 - block_mask
        scale = keep.size / jnp.maximum(jnp.sum(keep), 1.0)
        return x * keep.astype(x.dtype) * scale.astype(x.dtype)


def _bilinear_gather(x: jax.Array, py: jax.Array, px: jax.Array
                     ) -> jax.Array:
    """x (H, W, C); py/px (...,) float positions -> (..., C)."""
    H, W, C = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    def at(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        return x[yi, xi]

    valid = ((py > -1) & (py < H) & (px > -1) & (px < W))[..., None]
    out = (at(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
           + at(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
           + at(y0 + 1, x0) * (wy * (1 - wx))[..., None]
           + at(y0 + 1, x0 + 1) * (wy * wx)[..., None])
    return jnp.where(valid, out, 0.0)


class DeformConv2d(nn.Module):
    """DCNv2 semantics in pure XLA (custom_layers.py MyDCNv2:88):
    offsets + modulation masks predicted by a standard conv, features
    sampled with bilinear gathers, then a dense kernel."""

    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        k = self.kernel_size
        off = nn.Conv(3 * k * k, (k, k),
                      kernel_init=nn.initializers.zeros, dtype=self.dtype,
                      name="offset_conv")(x)
        offsets, mask = off[..., :2 * k * k], jax.nn.sigmoid(
            off[..., 2 * k * k:])
        offsets = offsets.reshape(B, H, W, k * k, 2)

        yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing="ij")
        dy, dx = jnp.meshgrid(
            jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
            jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
            indexing="ij")
        base_y = yy[..., None] + dy.reshape(-1)
        base_x = xx[..., None] + dx.reshape(-1)
        py = base_y[None] + offsets[..., 0]
        px = base_x[None] + offsets[..., 1]

        sampled = jax.vmap(
            lambda img, y_, x_: _bilinear_gather(img, y_, x_))(
            x.astype(jnp.float32), py, px)            # (B,H,W,k*k,C)
        sampled = sampled * mask[..., None]
        sampled = sampled.reshape(B, H, W, k * k * C).astype(self.dtype)
        return nn.Dense(self.out_channels, dtype=self.dtype,
                        name="proj")(sampled)
