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
- BN folding for inference: see `tscd_tpu.utils.model_utils.
  fuse_conv_bn_params` which produces a bias-ful conv and drops BN
  entirely — the equivalent of the reference's `fuseforward` deploy path.
"""

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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

    Lowered as ONE one-hot 2x2 stride-2 conv (exact: 0/1 taps). The
    reshape/transpose formulation is pathological on the TPU for the
    3-channel fp32 input — the innermost (2,2,3) transpose packs
    sublanes at ~1% utilization and took 15.8 ms of the 32 ms
    TSCD-Large backbone (tools/profile_backbone.py); the conv
    formulation rides the MXU like the Haar DWT fix (ops/wavelets.py).
    Multi-axis strided slices are also out: they kernel-fault the axon
    TPU worker at large batch x channel shapes.
    """
    B, H, W, C = x.shape
    # phase order [(h0,w0), (h1,w0), (h0,w1), (h1,w1)] = tl, bl, tr, br
    # -> output channel (dx*2 + dy)*C + c
    k = np.zeros((2, 2, C, 4 * C), np.float32)
    for dy in range(2):
        for dx in range(2):
            for c in range(C):
                k[dy, dx, c, (dx * 2 + dy) * C + c] = 1.0
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(k, x.dtype), window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _FocusKernel(nn.Module):
    """Holds the (k, k, 4C, out) conv kernel at the same param path as
    BaseConv's nn.Conv ('conv/kernel') so checkpoints interchange."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _BNStats(nn.Module):
    """Declares the same variable tree as nn.BatchNorm (params
    scale/bias, batch_stats mean/var) without running it — the eval
    Focus paths fold BN into the conv instead."""

    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        return scale, bias, mean.value, var.value


class _FocusConv(nn.Module):
    """BaseConv stand-in for the Focus stem: identical param tree
    (conv/kernel + bn/*) but the conv consumes the FULL-resolution image
    with the kernel rearranged to (2k, 2k, C, out), stride doubled.
    At eval on TPU the whole stem (conv + folded BN + SiLU) runs as one
    Pallas kernel (ops/pallas/focus_stem.py)."""

    out_channels: int
    ksize: int
    stride: int
    act: str
    dtype: Dtype

    def _conv6(self, x, w3, C):
        k = self.ksize
        # s2d channel order is (dx*2+dy)*C + c (space_to_depth_focus):
        # (k,k,4C,O) -> (u,v,dx,dy,c,O) -> (u,dy,v,dx,c,O) -> (2k,2k,C,O)
        w6 = w3.reshape(k, k, 2, 2, C, self.out_channels)
        w6 = w6.transpose(0, 3, 1, 2, 4, 5).reshape(
            2 * k, 2 * k, C, self.out_channels)
        pad = k - 1
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w6.astype(self.dtype),
            window_strides=(2 * self.stride, 2 * self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        k = self.ksize
        assert k % 2 == 1, "Focus fused conv assumes odd ksize"
        w3 = _FocusKernel((k, k, 4 * C, self.out_channels), name="conv")()
        if train:
            y = self._conv6(x, w3, C)
            y = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn")(y)
            return get_activation(self.act)(y.astype(self.dtype))

        # eval: fold BN into scale/shift (same tree as nn.BatchNorm)
        gamma, beta, mean, var = _BNStats(self.out_channels, name="bn")()
        scale = gamma / jnp.sqrt(var + 1e-5)
        shift = beta - mean * scale

        from ..ops import banded_stem
        from ..ops.pallas import focus_stem
        if (jax.default_backend() == "tpu"
                and banded_stem.supported(H, W, C, k, self.stride,
                                          self.act)):
            return banded_stem.focus_stem_banded(x, w3, scale, shift,
                                                 self.dtype)
        if (jax.default_backend() == "tpu"
                and focus_stem.supported(H, W, C, k, self.stride,
                                         self.act)):
            return focus_stem.focus_stem(x, w3, scale, shift, self.dtype)
        y = self._conv6(x, w3, C).astype(jnp.float32)
        y = y * scale[None, None, None] + shift[None, None, None]
        return get_activation(self.act)(y.astype(self.dtype))


class Focus(nn.Module):
    """Space-to-depth stem (network_blocks.py:267).

    TPU lowering: s2d followed by a k x k conv on the half-res grid is
    algebraically ONE 2k x 2k stride-2(s) conv on the full-res image
    (out[i,j] sums X[2si+2(u-(k-1)/2)+dy, ...] = taps -(k-1)..k), so the
    (k,k,4C,out) kernel is rearranged to (2k,2k,C,out) at apply time and
    a single conv runs. Both the reshape/transpose s2d and a separate
    small-channel conv are pathological on the axon TPU (the split stem
    measured 14.5 ms of the 31 ms TSCD-Large backbone at <2% MXU —
    tools/profile_backbone.py); the fused conv keeps the image read to
    one pass. Param tree and math (mod float reassociation) are
    unchanged: conv/conv/kernel stays (k,k,4C,out), BN/act follow as in
    BaseConv (torch parity: tests/test_torch_parity.py)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return _FocusConv(self.out_channels, self.ksize, self.stride,
                          self.act, self.dtype, name="conv")(x, train)


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
