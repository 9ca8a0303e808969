"""YOLOv7-style ELAN backbone + FPN (reference: yolox/models/ELANNet.py —
ELANNet:745, ELANFPN:985, RepConv:625 — and yolov7.py YOLOv7:11).

NHWC. RepConv keeps the 3x3 + 1x1 (+identity BN) branches explicit; on
TPU, XLA fuses the parallel convs so deploy-time re-parameterization is
an optimization, not a requirement.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, get_activation
from .pafpn import upsample2x


class RepConv(nn.Module):
    """(ELANNet.py:625) 3x3 conv + 1x1 conv (+ BN identity when channels
    match), summed then activated."""

    out_channels: int
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.97, epsilon=1e-3, dtype=dt,
                                    name=n)
        dense = nn.Conv(self.out_channels, (3, 3),
                        strides=(self.stride,) * 2, use_bias=False,
                        dtype=dt, name="rbr_dense")(x)
        dense = bn("bn_dense")(dense)
        one = nn.Conv(self.out_channels, (1, 1),
                      strides=(self.stride,) * 2, use_bias=False,
                      dtype=dt, name="rbr_1x1")(x)
        one = bn("bn_1x1")(one)
        out = dense + one
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            out = out + bn("bn_id")(x)
        return get_activation(self.act)(out)


class ELANBlock(nn.Module):
    """(ELANNet.py ELAN layers): two 1x1 entries + chained 3x3 pairs,
    all concatenated -> 1x1 out."""

    hidden: int
    out_channels: int
    num_pairs: int = 2
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        c1 = BaseConv(self.hidden, 1, 1, act=self.act, dtype=dt,
                      name="cv1")(x, train)
        c2 = BaseConv(self.hidden, 1, 1, act=self.act, dtype=dt,
                      name="cv2")(x, train)
        outs = [c1, c2]
        h = c2
        for i in range(self.num_pairs):
            h = BaseConv(self.hidden, 3, 1, act=self.act, dtype=dt,
                         name=f"cv3_{i}a")(h, train)
            h = BaseConv(self.hidden, 3, 1, act=self.act, dtype=dt,
                         name=f"cv3_{i}b")(h, train)
            outs.append(h)
        return BaseConv(self.out_channels, 1, 1, act=self.act, dtype=dt,
                        name="out")(jnp.concatenate(outs, -1), train)


class MPDown(nn.Module):
    """Max-pool + strided-conv dual downsample (ELANNet MP blocks)."""

    out_channels: int
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        half = self.out_channels // 2
        a = nn.max_pool(x, (2, 2), strides=(2, 2))
        a = BaseConv(half, 1, 1, act=self.act, dtype=dt,
                     name="pool_conv")(a, train)
        b = BaseConv(half, 1, 1, act=self.act, dtype=dt,
                     name="pre_conv")(x, train)
        b = BaseConv(half, 3, 2, act=self.act, dtype=dt,
                     name="down_conv")(b, train)
        return jnp.concatenate([a, b], -1)


class SPPCSPC(nn.Module):
    """(ELANNet SPPCSPC): CSP split around multi-kernel max pooling."""

    out_channels: int
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        c = self.out_channels
        a = BaseConv(c, 1, 1, act=self.act, dtype=dt, name="cv1")(x, train)
        a = BaseConv(c, 3, 1, act=self.act, dtype=dt, name="cv3")(a, train)
        a = BaseConv(c, 1, 1, act=self.act, dtype=dt, name="cv4")(a, train)
        pools = [a] + [nn.max_pool(a, (k, k), strides=(1, 1),
                                   padding="SAME") for k in (5, 9, 13)]
        a = BaseConv(c, 1, 1, act=self.act, dtype=dt,
                     name="cv5")(jnp.concatenate(pools, -1), train)
        a = BaseConv(c, 3, 1, act=self.act, dtype=dt, name="cv6")(a, train)
        b = BaseConv(c, 1, 1, act=self.act, dtype=dt, name="cv2")(x, train)
        return BaseConv(c, 1, 1, act=self.act, dtype=dt,
                        name="cv7")(jnp.concatenate([a, b], -1), train)


class ELANNet(nn.Module):
    """(ELANNet.py:745) YOLOv7 backbone; returns stride 8/16/32
    features."""

    width: float = 1.0
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        w = lambda c: int(c * self.width)
        x = x.astype(dt)  # raw pixels, as the reference ELANNet consumes
        x = BaseConv(w(32), 3, 1, act=self.act, dtype=dt,
                     name="stem0")(x, train)
        x = BaseConv(w(64), 3, 2, act=self.act, dtype=dt,
                     name="stem1")(x, train)
        x = BaseConv(w(64), 3, 1, act=self.act, dtype=dt,
                     name="stem2")(x, train)
        x = BaseConv(w(128), 3, 2, act=self.act, dtype=dt,
                     name="down1")(x, train)
        x = ELANBlock(w(64), w(256), 2, self.act, dt, name="elan1")(x, train)
        x = MPDown(w(256), self.act, dt, name="mp1")(x, train)
        c3 = ELANBlock(w(128), w(512), 2, self.act, dt,
                       name="elan2")(x, train)
        x = MPDown(w(512), self.act, dt, name="mp2")(c3, train)
        c4 = ELANBlock(w(256), w(1024), 2, self.act, dt,
                       name="elan3")(x, train)
        x = MPDown(w(1024), self.act, dt, name="mp3")(c4, train)
        c5 = ELANBlock(w(256), w(1024), 2, self.act, dt,
                       name="elan4")(x, train)
        return c3, c4, c5


class ELANFPN(nn.Module):
    """(ELANNet.py:985) SPPCSPC + top-down/bottom-up ELAN neck +
    RepConv output convs; emits (256,512,1024)*width channels."""

    width: float = 1.0
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        w = lambda c: int(c * self.width)
        c3, c4, c5 = ELANNet(self.width, self.act, dt,
                             name="backbone")(x, train)
        p5 = SPPCSPC(w(512), self.act, dt, name="sppcspc")(c5, train)
        p5_up = BaseConv(w(256), 1, 1, act=self.act, dtype=dt,
                         name="lat5")(p5, train)
        c4_l = BaseConv(w(256), 1, 1, act=self.act, dtype=dt,
                        name="lat4")(c4, train)
        p4 = ELANBlock(w(128), w(256), 2, self.act, dt, name="fpn4")(
            jnp.concatenate([upsample2x(p5_up), c4_l], -1), train)
        p4_up = BaseConv(w(128), 1, 1, act=self.act, dtype=dt,
                         name="lat4u")(p4, train)
        c3_l = BaseConv(w(128), 1, 1, act=self.act, dtype=dt,
                        name="lat3")(c3, train)
        p3 = ELANBlock(w(64), w(128), 2, self.act, dt, name="fpn3")(
            jnp.concatenate([upsample2x(p4_up), c3_l], -1), train)
        n4 = ELANBlock(w(128), w(256), 2, self.act, dt, name="pan4")(
            jnp.concatenate([MPDown(w(256), self.act, dt,
                                    name="pan_mp3")(p3, train), p4], -1),
            train)
        n5 = ELANBlock(w(256), w(512), 2, self.act, dt, name="pan5")(
            jnp.concatenate([MPDown(w(512), self.act, dt,
                                    name="pan_mp4")(n4, train), p5], -1),
            train)
        out3 = RepConv(w(256), act=self.act, dtype=dt,
                       name="rep3")(p3, train)
        out4 = RepConv(w(512), act=self.act, dtype=dt,
                       name="rep4")(n4, train)
        out5 = RepConv(w(1024), act=self.act, dtype=dt,
                       name="rep5")(n5, train)
        return (out3, out4, out5)


class YOLOv7(nn.Module):
    """(yolov7.py:11) ELANFPN + YOLOX decoupled head."""

    num_classes: int = 80
    width: float = 1.0
    act: str = "silu"
    dtype: Any = jnp.float32

    def setup(self):
        from .yolo_head import YOLOXHead
        self.backbone = ELANFPN(self.width, self.act, self.dtype)
        self.head = YOLOXHead(self.num_classes, self.width, act=self.act,
                              dtype=self.dtype)

    def __call__(self, x: jax.Array, train: bool = False,
                 decode: bool = True):
        fpn = self.backbone(x, train)
        out = self.head(fpn, train)
        if decode:
            import jax.numpy as jnp
            from ..ops.decode import decode_outputs
            raw = out["outputs"].astype(jnp.float32)
            dec = decode_outputs(raw, out["hw"], self.head.strides)
            out["decoded"] = jnp.concatenate(
                [dec[..., :4], jax.nn.sigmoid(dec[..., 4:])], -1)
        return out
