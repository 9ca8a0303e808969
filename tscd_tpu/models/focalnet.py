"""FocalNet backbone (reference: yolox/models/focal.py — FocalNet:336,
FocalModulation:37, FocalModulationBlock:111, PatchEmbed:292,
build_focalnet:501; TSCD wiring YOLOPAFPN_focal yolo_pafpn.py:350 uses
focal_levels=[4,4,4,4], focal_windows=[3,3,3,3], use_conv_embed=True,
use_postln=True, use_layerscale=True).

Focal modulation: hierarchical depthwise-conv context aggregation gated
per level — all convs/elementwise, no attention, so XLA fuses the whole
block; NHWC; returns {"dark3","dark4","dark5"}.

Input contract: raw 0-255 pixels, exactly like the reference pipeline
(YOLOX does no normalization; focal.py consumes the image as-is), so
converted reference checkpoints are numerically exact. GELUs are
erf-exact to match torch nn.GELU.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gelu(x):
    return nn.gelu(x, approximate=False)


class FocalModulation(nn.Module):
    dim: int
    focal_level: int = 2
    focal_window: int = 9
    focal_factor: int = 2
    use_postln_in_modulation: bool = False
    normalize_modulator: bool = False
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
            # torch pads k//2 symmetric (focal.py:78); k is odd for the
            # reference configs so flax SAME at stride 1 is identical
            ctx = nn.Conv(C, (k, k), feature_group_count=C, use_bias=False,
                          padding=[(k // 2, k // 2)] * 2,
                          dtype=self.dtype, name=f"focal_conv_{l}")(ctx)
            ctx = _gelu(ctx)
            ctx_all = ctx_all + ctx * gates[..., l:l + 1]
        ctx_global = _gelu(jnp.mean(ctx, axis=(1, 2), keepdims=True))
        ctx_all = ctx_all + ctx_global * gates[..., L:L + 1]
        if self.normalize_modulator:
            ctx_all = ctx_all / (L + 1)

        out = q * nn.Conv(C, (1, 1), dtype=self.dtype, name="h")(ctx_all)
        if self.use_postln_in_modulation:
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(out)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class FocalBlock(nn.Module):
    """FocalModulationBlock (focal.py:111): pre/post-LN residual block
    with optional per-channel layerscale (gamma init 1e-4)."""

    dim: int
    mlp_ratio: float = 4.0
    focal_level: int = 2
    focal_window: int = 9
    use_postln: bool = False
    use_postln_in_modulation: bool = False
    use_layerscale: bool = False
    normalize_modulator: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_layerscale:
            g1 = self.param("gamma_1", nn.initializers.constant(1e-4),
                            (self.dim,))
            g2 = self.param("gamma_2", nn.initializers.constant(1e-4),
                            (self.dim,))
        else:
            g1 = g2 = 1.0

        shortcut = x
        y = x if self.use_postln else nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = FocalModulation(
            self.dim, self.focal_level, self.focal_window,
            use_postln_in_modulation=self.use_postln_in_modulation,
            normalize_modulator=self.normalize_modulator,
            dtype=self.dtype, name="modulation")(y)
        if self.use_postln:
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(y)
        x = shortcut + g1 * y

        def mlp(z):
            z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                         name="mlp_fc1")(z)
            z = _gelu(z)
            return nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(z)

        if self.use_postln:
            return x + g2 * nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name="norm2")(mlp(x))
        return x + g2 * mlp(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name="norm2")(x))


class FocalNet(nn.Module):
    """FocalNet (focal.py:336). Defaults mirror the reference class;
    the TSCD exps use focal_levels=(4,)*4, focal_windows=(3,)*4,
    use_conv_embed/use_postln/use_layerscale=True, embed_dim 96/192."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    focal_levels: Sequence[int] = (3, 3, 3, 3)
    focal_windows: Sequence[int] = (3, 3, 3, 3)
    mlp_ratio: float = 4.0
    use_conv_embed: bool = False
    use_postln: bool = False
    use_postln_in_modulation: bool = False
    use_layerscale: bool = False
    normalize_modulator: bool = False
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        if self.use_conv_embed:
            # stem: k7 s4 pad2 (focal.py:305 is_stem=True)
            x = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4),
                        padding=[(2, 2), (2, 2)], dtype=dt,
                        name="patch_embed")(x)
        else:
            x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=dt,
                        name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="patch_norm")(x)
        outs = {}
        names = {0: "dark2", 1: "dark3", 2: "dark4", 3: "dark5"}
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i)
            for b in range(depth):
                x = FocalBlock(
                    dim, self.mlp_ratio, self.focal_levels[i],
                    self.focal_windows[i],
                    use_postln=self.use_postln,
                    use_postln_in_modulation=self.use_postln_in_modulation,
                    use_layerscale=self.use_layerscale,
                    normalize_modulator=self.normalize_modulator,
                    dtype=dt, name=f"layer{i}_block{b}")(x)
            if i in self.out_indices:
                outs[names[i]] = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                              name=f"out_norm{i}")(x)
            if i < len(self.depths) - 1:
                # inter-stage downsample: PatchEmbed(patch_size=2)
                # (focal.py:248) — k2 s2 plain, or k3 s2 pad1 when
                # use_conv_embed (is_stem=False)
                if self.use_conv_embed:
                    x = nn.Conv(dim * 2, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)], dtype=dt,
                                name=f"down{i}")(x)
                else:
                    x = nn.Conv(dim * 2, (2, 2), strides=(2, 2), dtype=dt,
                                name=f"down{i}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"down_norm{i}")(x)
        return outs


def build_focalnet(variant: str = "focalnet_tiny", **kw) -> FocalNet:
    """Named variants. tiny/small/base are compact configs for this
    repo's tests; focalnet_tscd mirrors the reference TSCD exps
    (exps/TSCD_OVIS/ovis_tscd_base.py:85-99); the L/XL 22k names mirror
    build_focalnet (focal.py:501)."""
    cfgs = {
        "focalnet_tiny": dict(embed_dim=96, depths=(2, 2, 6, 2)),
        "focalnet_small": dict(embed_dim=96, depths=(2, 2, 18, 2)),
        "focalnet_base": dict(embed_dim=128, depths=(2, 2, 18, 2)),
        "focalnet_tscd": dict(
            embed_dim=192, depths=(2, 2, 6, 2),
            focal_levels=(4, 4, 4, 4), focal_windows=(3, 3, 3, 3),
            use_conv_embed=True, use_postln=True, use_layerscale=True),
        "focalnet_L_384_22k": dict(
            embed_dim=192, depths=(2, 2, 18, 2),
            focal_levels=(3, 3, 3, 3), focal_windows=(5, 5, 5, 5),
            use_conv_embed=True, use_postln=True, use_layerscale=True),
        "focalnet_L_384_22k_fl4": dict(
            embed_dim=192, depths=(2, 2, 18, 2),
            focal_levels=(4, 4, 4, 4), focal_windows=(3, 3, 3, 3),
            use_conv_embed=True, use_postln=True, use_layerscale=True),
    }
    return FocalNet(**{**cfgs[variant], **kw})
