"""PAFPN necks over alternate backbones (reference: yolox/models/
yolo_pafpn.py — YOLOPAFPN_Swin:120, YOLOPAFPN_ResNet:241,
YOLOPAFPN_focal:350) plus the legacy YOLOFPN (yolo_fpn.py:12) and
P6 PAFPN (yolo_pafpn_p6.py).

Each variant = backbone -> 1x1 channel projections -> the same
top-down/bottom-up CSP neck as YOLOPAFPN, emitting stride 8/16/32
features sized (256,512,1024)*width so every head is backbone-agnostic.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv
from .darknet import Darknet
from .focalnet import build_focalnet
from .pafpn import upsample2x
from .resnet import ResNet
from .swin import swin_base, swin_small, swin_tiny


class PAFPNNeck(nn.Module):
    """Top-down FPN + bottom-up PAN over three NHWC features
    (x2 stride 8, x1 stride 16, x0 stride 32) already projected to
    (ch0, ch1, ch2) channels."""

    channels: Sequence[int]           # (ch0, ch1, ch2) ascending stride
    depth: float = 1.0
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x2, x1, x0, train: bool = False):
        dt = self.dtype
        Conv = DWConv if self.depthwise else BaseConv
        ch = list(self.channels)
        n = max(round(3 * self.depth), 1)

        fpn_out0 = BaseConv(ch[1], 1, 1, act=self.act, dtype=dt,
                            name="lateral_conv0")(x0, train)
        f_out0 = jnp.concatenate([upsample2x(fpn_out0), x1], -1)
        f_out0 = CSPLayer(ch[1], n=n, shortcut=False,
                          depthwise=self.depthwise, act=self.act, dtype=dt,
                          name="C3_p4")(f_out0, train)
        fpn_out1 = BaseConv(ch[0], 1, 1, act=self.act, dtype=dt,
                            name="reduce_conv1")(f_out0, train)
        f_out1 = jnp.concatenate([upsample2x(fpn_out1), x2], -1)
        pan_out2 = CSPLayer(ch[0], n=n, shortcut=False,
                            depthwise=self.depthwise, act=self.act,
                            dtype=dt, name="C3_p3")(f_out1, train)
        p_out1 = Conv(ch[0], 3, 2, act=self.act, dtype=dt,
                      name="bu_conv2")(pan_out2, train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], -1)
        pan_out1 = CSPLayer(ch[1], n=n, shortcut=False,
                            depthwise=self.depthwise, act=self.act,
                            dtype=dt, name="C3_n3")(p_out1, train)
        p_out0 = Conv(ch[1], 3, 2, act=self.act, dtype=dt,
                      name="bu_conv1")(pan_out1, train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], -1)
        pan_out0 = CSPLayer(ch[2], n=n, shortcut=False,
                            depthwise=self.depthwise, act=self.act,
                            dtype=dt, name="C3_n4")(p_out0, train)
        return (pan_out2, pan_out1, pan_out0)


class _BackbonePAFPN(nn.Module):
    """Backbone features -> PAFPNNeck, wired exactly like the reference
    wrappers (yolo_pafpn.py:120/241/350): the neck's first convs consume
    the raw backbone channels directly (flax infers input dims), no
    projection layers — so converted reference checkpoints line up
    1:1. `out_channels` is the (pre-width) pyramid the heads see."""

    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    out_channels: Sequence[int] = (256, 512, 1024)
    dtype: Any = jnp.float32

    def make_backbone(self):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        ch = [int(c * self.width) for c in self.out_channels]
        feats = self.make_backbone()(x, train)
        x2, x1, x0 = feats["dark3"], feats["dark4"], feats["dark5"]
        return PAFPNNeck(ch, self.depth, self.depthwise, self.act,
                         dtype=self.dtype, name="neck")(x2, x1, x0, train)


class YOLOPAFPN_Swin(_BackbonePAFPN):
    """(yolo_pafpn.py:120) Swin tiny/small/base by `variant`."""

    variant: str = "tiny"

    def make_backbone(self):
        factory = {"tiny": swin_tiny, "small": swin_small,
                   "base": swin_base}[self.variant]
        return factory(dtype=self.dtype, name="backbone")


class YOLOPAFPN_Focal(_BackbonePAFPN):
    """(yolo_pafpn.py:350)."""

    variant: str = "focalnet_tiny"

    def make_backbone(self):
        return build_focalnet(self.variant, dtype=self.dtype,
                              name="backbone")


class YOLOPAFPN_ResNet(_BackbonePAFPN):
    """(yolo_pafpn.py:241) ResNet-50/101 by `res_depth`."""

    res_depth: int = 50

    def make_backbone(self):
        return ResNet(self.res_depth, dtype=self.dtype, name="backbone")


class YOLOFPN(nn.Module):
    """Legacy YOLOv3 FPN over Darknet-53 (reference yolo_fpn.py:12):
    lateral 1x1 + upsample + concat + embedding convs, no PAN."""

    depth: int = 53
    act: str = "lrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        feats = Darknet(self.depth, dtype=dt, name="backbone")(x, train)
        x2, x1, x0 = feats["dark3"], feats["dark4"], feats["dark5"]

        def embedding(z, ch, name):
            for i, (c, k) in enumerate(((ch, 1), (2 * ch, 3), (ch, 1),
                                        (2 * ch, 3), (ch, 1))):
                z = BaseConv(c, k, 1, act=self.act, dtype=dt,
                             name=f"{name}_{i}")(z, train)
            return z

        out0 = embedding(x0, 512, "embed0")
        x1_in = BaseConv(256, 1, 1, act=self.act, dtype=dt,
                         name="lateral0")(out0, train)
        x1_in = jnp.concatenate([upsample2x(x1_in), x1], -1)
        out1 = embedding(x1_in, 256, "embed1")
        x2_in = BaseConv(128, 1, 1, act=self.act, dtype=dt,
                         name="lateral1")(out1, train)
        x2_in = jnp.concatenate([upsample2x(x2_in), x2], -1)
        out2 = embedding(x2_in, 128, "embed2")
        return (out2, out1, out0)


def build_pafpn_backbone(name: str, depth: float, width: float,
                         act: str = "silu", depthwise: bool = False,
                         dtype: Any = jnp.float32, remat: bool = False):
    """Exp `backbone_name` -> feature-pyramid module, mirroring the
    reference exp wiring (exps/TSCD_OVIS/ovis_tscd_base.py:55-99):

      "MCSP"      CSPDarknet YOLOPAFPN (the default)
      "Swin_Tiny" Swin-T  -> neck out (192, 384, 768)
      "Swin_Base" Swin-B  -> neck out (256, 512, 1024)
      "Focal"     FocalNet (embed 192, conv-embed/postln/layerscale,
                  the reference TSCD focal config) -> (256, 512, 1024)

    All variants return (p3, p4, p5) stride 8/16/32 features, so
    TSCD/YOLOV heads are backbone-agnostic (flax infers the neck's
    input channels from the backbone's outputs). `remat` wraps the
    module in jax.checkpoint (static `train` arg)."""
    from .pafpn import YOLOPAFPN

    if name in ("MCSP", "mcsp", None, ""):
        cls, kw = YOLOPAFPN, dict(depth=depth, width=width, act=act,
                                  depthwise=depthwise, dtype=dtype)
    elif name == "Swin_Tiny":
        cls, kw = YOLOPAFPN_Swin, dict(
            variant="tiny", depth=depth, width=width, act=act,
            depthwise=depthwise, out_channels=(192, 384, 768),
            dtype=dtype)
    elif name == "Swin_Base":
        cls, kw = YOLOPAFPN_Swin, dict(
            variant="base", depth=depth, width=width, act=act,
            depthwise=depthwise, out_channels=(256, 512, 1024),
            dtype=dtype)
    elif "Focal" in name:
        cls, kw = YOLOPAFPN_Focal, dict(
            variant="focalnet_tscd", depth=depth, width=width, act=act,
            depthwise=depthwise, out_channels=(256, 512, 1024),
            dtype=dtype)
    else:
        raise ValueError(
            f"unknown backbone_name {name!r} "
            "(MCSP | Swin_Tiny | Swin_Base | Focal)")
    if remat:
        cls = nn.remat(cls, static_argnums=(2,))
    return cls(**kw)
