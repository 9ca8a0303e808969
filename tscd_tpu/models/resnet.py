"""ResNet-50/101 backbone (reference: yolox/models/resnet.py:11, built
on ResNetBottleneck network_blocks.py:292).

Mirrors the reference exactly — including its two deviations from
torchvision: the stem is a BaseConv (conv+BN+act with symmetric
(k-1)//2 padding), and ConvBn3 applies the activation BEFORE the
residual add (network_blocks.py:302,310), with another activation after
the add. NHWC; returns {"dark3","dark4","dark5"} = the reference's
stage3/4/5 (stride 8/16/32, channels 512/1024/2048).

Input contract: raw 0-255 pixels (the reference pipeline does no
normalization), so converted reference checkpoints are exact.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, ResNetBottleneck


class ResNet(nn.Module):
    """depth 50 or 101 (ResNet_cfg resnet.py:4)."""

    depth: int = 50
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        assert self.depth in (50, 101)
        layers = (3, 4, 6, 3) if self.depth == 50 else (3, 4, 23, 3)
        dt = self.dtype
        x = x.astype(dt)  # raw pixels, like the reference
        x = BaseConv(64, 7, 2, act=self.act, dtype=dt,
                     name="stem")(x, train)
        # MaxPool2d(3, 2, padding=1) — torch pads symmetric; XLA SAME
        # would pad (0,1), shifting every window by a pixel
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outs = {}
        names = {1: "dark3", 2: "dark4", 3: "dark5"}
        planes = (64, 128, 256, 512)
        for i, n_blocks in enumerate(layers):
            stride = 1 if i == 0 else 2
            x = ResNetBottleneck(planes[i], stride, has_downsample=True,
                                 act=self.act, dtype=dt,
                                 name=f"layer{i + 1}_0")(x, train)
            for b in range(1, n_blocks):
                x = ResNetBottleneck(planes[i], 1, act=self.act, dtype=dt,
                                     name=f"layer{i + 1}_{b}")(x, train)
            if i in names:
                outs[names[i]] = x
        return outs
