"""ResNet-50/101 backbone (reference: yolox/models/resnet.py:11).

NHWC bottleneck ResNet returning {"dark3","dark4","dark5"}
(C3/C4/C5, stride 8/16/32).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=dt, name=n)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=dt,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      use_bias=False, dtype=dt, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(4 * self.planes, (1, 1), use_bias=False, dtype=dt,
                      name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            x = nn.Conv(4 * self.planes, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False,
                        dtype=dt, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(out + x)


class ResNet(nn.Module):
    """depth 50 or 101."""

    depth: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        assert self.depth in (50, 101)
        layers = (3, 4, 6, 3) if self.depth == 50 else (3, 4, 23, 3)
        dt = self.dtype
        x = x.astype(dt) / 255.0
        x = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False, dtype=dt,
                    name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=dt, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        outs = {}
        names = {1: "dark3", 2: "dark4", 3: "dark5"}
        planes = (64, 128, 256, 512)
        for i, n_blocks in enumerate(layers):
            stride = 1 if i == 0 else 2
            x = Bottleneck(planes[i], stride, downsample=True, dtype=dt,
                           name=f"layer{i + 1}_0")(x, train)
            for b in range(1, n_blocks):
                x = Bottleneck(planes[i], 1, dtype=dt,
                               name=f"layer{i + 1}_{b}")(x, train)
            if i in names:
                outs[names[i]] = x
        return outs
