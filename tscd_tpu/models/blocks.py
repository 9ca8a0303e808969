"""Conv primitives for the detection core.

TPU-native counterparts of the reference block zoo
(`/root/reference/yolox/models/network_blocks.py`): BaseConv (conv->BN->act,
network_blocks.py:36), DWConv (:64), Bottleneck (:158), ResLayer (:183),
SPPBottleneck (:201), CSPLayer (:226), Focus (:267), ResNetBottleneck (:292).

Design notes (TPU-first):
- NHWC layout (XLA's preferred conv layout on TPU; the MXU consumes the
  channel dim as the contraction axis for 1x1 convs).
- Compute dtype is configurable (bf16 by default in model configs); BN runs
  in fp32 for stability, params are fp32.
- BN folding for inference: see `tscd_tpu.utils.fuse.fold_batch_norm` which
  produces a bias-ful conv and drops BN entirely — the equivalent of the
  reference's `fuseforward` deploy path.
"""

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_activation(name: str = "silu") -> Callable[[jax.Array], jax.Array]:
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.1)
    if name in ("id", "identity", None):
        return lambda x: x
    raise ValueError(f"Unsupported act type: {name}")


class BaseConv(nn.Module):
    """Conv2d -> BatchNorm -> activation, 'same' padding for odd kernels."""

    out_channels: int
    ksize: int
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32
    use_bias: bool = False  # True only after BN folding

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 valid: bool = False) -> jax.Array:
        """`valid=True` runs the SAME parameters with VALID padding —
        used by the sparse proposal-patch tower path (models/
        sparse_towers.py), where 'same' zero-padding semantics are
        reproduced by masking out-of-map patch positions instead."""
        pad = 0 if valid else (self.ksize - 1) // 2
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.use_bias:
            # fp32 batch norm; eps/momentum match the reference's torch defaults
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x)
            x = x.astype(self.dtype)
        return get_activation(self.act)(x)


class DWConv(nn.Module):
    """Depthwise conv followed by pointwise conv (network_blocks.py:64)."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 valid: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        x = BaseConv(in_ch, self.ksize, self.stride, groups=in_ch, act=self.act,
                     dtype=self.dtype, name="dconv")(x, train, valid=valid)
        x = BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
                     name="pconv")(x, train)
        return x


def _conv_cls(depthwise: bool):
    return DWConv if depthwise else BaseConv


class Bottleneck(nn.Module):
    """Standard bottleneck (network_blocks.py:158)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_channels * self.expansion)
        y = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        Conv = _conv_cls(self.depthwise)
        y = Conv(self.out_channels, 3, 1, act=self.act, dtype=self.dtype, name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class ResLayer(nn.Module):
    """Residual 1x1->3x3 lrelu layer (network_blocks.py:183)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        mid = in_ch // 2
        y = BaseConv(mid, 1, 1, act="lrelu", dtype=self.dtype, name="layer1")(x, train)
        y = BaseConv(in_ch, 3, 1, act="lrelu", dtype=self.dtype, name="layer2")(y, train)
        return x + y


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (network_blocks.py:201).

    Max-pools with 'same' padding at stride 1 lower trivially to XLA
    reduce-window ops which fuse with the surrounding convs.
    """

    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        pools = [x]
        for ks in self.kernel_sizes:
            pad = ks // 2
            pools.append(
                nn.max_pool(x, (ks, ks), strides=(1, 1),
                            padding=[(pad, pad), (pad, pad)])
            )
        x = jnp.concatenate(pools, axis=-1)
        x = BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
                     name="conv2")(x, train)
        return x


class CSPLayer(nn.Module):
    """C3: CSP bottleneck with 3 convolutions (network_blocks.py:226)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_channels * self.expansion)
        x1 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        x2 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv2")(x, train)
        for i in range(self.n):
            x1 = Bottleneck(hidden, self.shortcut, 1.0, self.depthwise,
                            self.act, dtype=self.dtype, name=f"m_{i}")(x1, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
                        name="conv3")(x, train)


def space_to_depth_focus(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H/2,W/2,4C) with the reference's channel order
    (top-left, bottom-left, top-right, bottom-right; network_blocks.py:274-289).

    Reshape/transpose lowering, NOT multi-axis strided slices — the
    latter kernel-fault the axon TPU worker at large batch x channel
    shapes (see ops/wavelets.py).
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 4, 2, 5)        # (B, H/2, W/2, w2, h2, C)
    # phase order [(h0,w0), (h1,w0), (h0,w1), (h1,w1)] = tl, bl, tr, br
    return x.reshape(B, H // 2, W // 2, 4 * C)


class Focus(nn.Module):
    """Space-to-depth stem (network_blocks.py:267)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = space_to_depth_focus(x)
        return BaseConv(self.out_channels, self.ksize, self.stride,
                        act=self.act, dtype=self.dtype, name="conv")(x, train)


class ResNetBottleneck(nn.Module):
    """Torchvision-style bottleneck with stride on the 3x3
    (network_blocks.py:292)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    act: str = "relu"
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = BaseConv(width, 1, 1, self.groups, act=self.act, dtype=self.dtype,
                       name="ConvBn1")(x, train)
        out = BaseConv(width, 3, self.stride, self.groups, act=self.act,
                       dtype=self.dtype, name="ConvBn2")(out, train)
        out = BaseConv(self.planes * self.expansion, 1, 1, self.groups,
                       act=self.act, dtype=self.dtype, name="ConvBn3")(out, train)
        if self.has_downsample:
            identity = BaseConv(self.planes * self.expansion, 1, self.stride,
                                act="id", dtype=self.dtype, name="downsample")(x, train)
        else:
            identity = x
        return get_activation(self.act)(out + identity)
