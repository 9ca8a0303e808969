"""FocalNet backbone (reference: yolox/models/focal.py — FocalNet:336,
FocalModulation:37, build_focalnet:501).

Focal modulation: hierarchical depthwise-conv context aggregation gated
per level — all convs/elementwise, no attention, so XLA fuses the whole
block; NHWC; returns {"dark3","dark4","dark5"}.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class FocalModulation(nn.Module):
    dim: int
    focal_level: int = 2
    focal_window: int = 9
    focal_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C)."""
        C = self.dim
        L = self.focal_level
        f = nn.Dense(2 * C + (L + 1), dtype=self.dtype, name="f")(x)
        q, ctx, gates = jnp.split(f, [C, 2 * C], axis=-1)   # gates: L+1

        ctx_all = 0.0
        for l in range(L):
            k = self.focal_factor * l + self.focal_window
            ctx = nn.Conv(C, (k, k), feature_group_count=C, use_bias=False,
                          dtype=self.dtype, name=f"focal_conv_{l}")(ctx)
            ctx = nn.gelu(ctx)
            ctx_all = ctx_all + ctx * gates[..., l:l + 1]
        ctx_global = nn.gelu(jnp.mean(ctx, axis=(1, 2), keepdims=True))
        ctx_all = ctx_all + ctx_global * gates[..., L:L + 1]

        out = q * nn.Conv(C, (1, 1), dtype=self.dtype, name="h")(ctx_all)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class FocalBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    focal_level: int = 2
    focal_window: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = FocalModulation(self.dim, self.focal_level, self.focal_window,
                            dtype=self.dtype, name="modulation")(y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class FocalNet(nn.Module):
    """focalnet tiny/small/base by (embed_dim, depths)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    focal_levels: Sequence[int] = (2, 2, 2, 2)
    focal_windows: Sequence[int] = (9, 9, 9, 9)
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        x = x.astype(dt) / 255.0
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=dt,
                    name="patch_embed")(x)
        x = nn.LayerNorm(dtype=dt, name="patch_norm")(x)
        outs = {}
        names = {1: "dark3", 2: "dark4", 3: "dark5"}
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i)
            for b in range(depth):
                x = FocalBlock(dim, self.mlp_ratio, self.focal_levels[i],
                               self.focal_windows[i], dtype=dt,
                               name=f"layer{i}_block{b}")(x)
            if i in self.out_indices:
                outs[names[i]] = nn.LayerNorm(dtype=dt,
                                              name=f"out_norm{i}")(x)
            if i < len(self.depths) - 1:
                # strided-conv downsample (focal.py patch embed between
                # stages)
                x = nn.Conv(dim * 2, (2, 2), strides=(2, 2), dtype=dt,
                            name=f"down{i}")(x)
                x = nn.LayerNorm(dtype=dt, name=f"down_norm{i}")(x)
        return outs


def build_focalnet(variant: str = "focalnet_tiny", **kw) -> FocalNet:
    cfgs = {
        "focalnet_tiny": dict(embed_dim=96, depths=(2, 2, 6, 2)),
        "focalnet_small": dict(embed_dim=96, depths=(2, 2, 18, 2)),
        "focalnet_base": dict(embed_dim=128, depths=(2, 2, 18, 2)),
    }
    return FocalNet(**{**cfgs[variant], **kw})
