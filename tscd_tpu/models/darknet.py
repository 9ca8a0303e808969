"""CSPDarknet backbone (reference: yolox/models/darknet.py:98).

Depth/width multipliers follow the reference: base_channels = 64*width,
base_depth = max(round(3*depth), 1); dark3/dark4 use 3x base_depth CSP
bottlenecks; dark5 has SPP then a non-shortcut CSP layer.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv, Focus, ResLayer, SPPBottleneck


class CSPDarknet(nn.Module):
    dep_mul: float
    wid_mul: float
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        Conv = DWConv if self.depthwise else BaseConv
        base_ch = int(self.wid_mul * 64)
        base_depth = max(round(self.dep_mul * 3), 1)
        dt = self.dtype

        outputs = {}
        x = Focus(base_ch, ksize=3, act=self.act, dtype=dt, name="stem")(x, train)
        outputs["stem"] = x

        x = Conv(base_ch * 2, 3, 2, act=self.act, dtype=dt, name="dark2_conv")(x, train)
        x = CSPLayer(base_ch * 2, n=base_depth, depthwise=self.depthwise,
                     act=self.act, dtype=dt, name="dark2_csp")(x, train)
        outputs["dark2"] = x

        x = Conv(base_ch * 4, 3, 2, act=self.act, dtype=dt, name="dark3_conv")(x, train)
        x = CSPLayer(base_ch * 4, n=base_depth * 3, depthwise=self.depthwise,
                     act=self.act, dtype=dt, name="dark3_csp")(x, train)
        outputs["dark3"] = x

        x = Conv(base_ch * 8, 3, 2, act=self.act, dtype=dt, name="dark4_conv")(x, train)
        x = CSPLayer(base_ch * 8, n=base_depth * 3, depthwise=self.depthwise,
                     act=self.act, dtype=dt, name="dark4_csp")(x, train)
        outputs["dark4"] = x

        x = Conv(base_ch * 16, 3, 2, act=self.act, dtype=dt, name="dark5_conv")(x, train)
        x = SPPBottleneck(base_ch * 16, act=self.act, dtype=dt, name="dark5_spp")(x, train)
        x = CSPLayer(base_ch * 16, n=base_depth, shortcut=False,
                     depthwise=self.depthwise, act=self.act, dtype=dt,
                     name="dark5_csp")(x, train)
        outputs["dark5"] = x

        return {k: v for k, v in outputs.items() if k in self.out_features}


class Darknet(nn.Module):
    """Legacy darknet21/53 (reference darknet.py:10)."""

    depth: int = 53
    stem_out_channels: int = 32
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    dtype: Any = jnp.float32

    DEPTH2BLOCKS = {21: (1, 2, 2, 1), 53: (2, 8, 8, 4)}

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype

        def group(x, in_ch, num_blocks, stride, prefix):
            x = BaseConv(in_ch * 2, 3, stride, act="lrelu", dtype=dt,
                         name=f"{prefix}_conv")(x, train)
            for i in range(num_blocks):
                x = ResLayer(dtype=dt, name=f"{prefix}_res{i}")(x, train)
            return x

        nb = self.DEPTH2BLOCKS[self.depth]
        outputs = {}
        x = BaseConv(self.stem_out_channels, 3, 1, act="lrelu", dtype=dt,
                     name="stem_conv")(x, train)
        x = group(x, self.stem_out_channels, 1, 2, "stem_g")
        outputs["stem"] = x
        in_ch = self.stem_out_channels * 2
        x = group(x, in_ch, nb[0], 2, "dark2")
        outputs["dark2"] = x
        in_ch *= 2
        x = group(x, in_ch, nb[1], 2, "dark3")
        outputs["dark3"] = x
        in_ch *= 2
        x = group(x, in_ch, nb[2], 2, "dark4")
        outputs["dark4"] = x
        in_ch *= 2
        # dark5: group + spp block
        x = group(x, in_ch, nb[3], 2, "dark5")
        f0, f1 = in_ch * 2, in_ch * 4
        x = BaseConv(f0, 1, 1, act="lrelu", dtype=dt, name="spp_c1")(x, train)
        x = BaseConv(f1, 3, 1, act="lrelu", dtype=dt, name="spp_c2")(x, train)
        x = SPPBottleneck(f0, act="lrelu", dtype=dt, name="spp")(x, train)
        x = BaseConv(f1, 3, 1, act="lrelu", dtype=dt, name="spp_c3")(x, train)
        x = BaseConv(f0, 1, 1, act="lrelu", dtype=dt, name="spp_c4")(x, train)
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}
