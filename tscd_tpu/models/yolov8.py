"""YOLOv8 family (reference: yolox/models/yolov8_blocks.py C2f:73,
yolov8_pafpn.py YOLOv8PAFPN:95, yolov8_head.py YOLOv8Head:18 with DFL).

NHWC; anchor-free decoupled head with Distribution Focal Loss bins for
box regression; decode returns (B, A, 4+C) with ltrb distances resolved
against per-level anchor centers.
"""

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv
from .pafpn import upsample2x


class C2f(nn.Module):
    """CSP bottleneck with 2 convs, n inner bottlenecks (yolov8_blocks
    C2f:73)."""

    out_channels: int
    n: int = 1
    shortcut: bool = False
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = int(self.out_channels * self.e)
        y = BaseConv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        h = y2
        for i in range(self.n):
            b = BaseConv(c, 3, 1, dtype=self.dtype,
                         name=f"m{i}_cv1")(h, train)
            b = BaseConv(c, 3, 1, dtype=self.dtype,
                         name=f"m{i}_cv2")(b, train)
            h = h + b if self.shortcut else b
            outs.append(h)
        return BaseConv(self.out_channels, 1, 1, dtype=self.dtype,
                        name="cv2")(jnp.concatenate(outs, -1), train)


class YOLOv8Backbone(nn.Module):
    depth: float = 1.0
    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        w = lambda c: int(c * self.width)
        d = lambda n: max(round(n * self.depth), 1)
        x = x.astype(dt) / 255.0
        x = BaseConv(w(64), 3, 2, dtype=dt, name="stem")(x, train)
        x = BaseConv(w(128), 3, 2, dtype=dt, name="down1")(x, train)
        x = C2f(w(128), d(3), True, dtype=dt, name="c2f1")(x, train)
        x = BaseConv(w(256), 3, 2, dtype=dt, name="down2")(x, train)
        c3 = C2f(w(256), d(6), True, dtype=dt, name="c2f2")(x, train)
        x = BaseConv(w(512), 3, 2, dtype=dt, name="down3")(c3, train)
        c4 = C2f(w(512), d(6), True, dtype=dt, name="c2f3")(x, train)
        x = BaseConv(w(1024), 3, 2, dtype=dt, name="down4")(c4, train)
        x = C2f(w(1024), d(3), True, dtype=dt, name="c2f4")(x, train)
        from .blocks import SPPBottleneck
        c5 = SPPBottleneck(w(1024), dtype=dt, name="sppf")(x, train)
        return c3, c4, c5


class YOLOv8PAFPN(nn.Module):
    """(yolov8_pafpn.py:95)."""

    depth: float = 1.0
    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        w = lambda c: int(c * self.width)
        d = lambda n: max(round(n * self.depth), 1)
        c3, c4, c5 = YOLOv8Backbone(self.depth, self.width, dtype=dt,
                                    name="backbone")(x, train)
        p4 = C2f(w(512), d(3), dtype=dt, name="p4")(
            jnp.concatenate([upsample2x(c5), c4], -1), train)
        p3 = C2f(w(256), d(3), dtype=dt, name="p3")(
            jnp.concatenate([upsample2x(p4), c3], -1), train)
        n4 = C2f(w(512), d(3), dtype=dt, name="n4")(
            jnp.concatenate([BaseConv(w(256), 3, 2, dtype=dt,
                                      name="down_p3")(p3, train), p4], -1),
            train)
        n5 = C2f(w(1024), d(3), dtype=dt, name="n5")(
            jnp.concatenate([BaseConv(w(512), 3, 2, dtype=dt,
                                      name="down_n4")(n4, train), c5], -1),
            train)
        return (p3, n4, n5)


class YOLOv8Head(nn.Module):
    """Anchor-free decoupled head with DFL box bins (yolov8_head.py:18)."""

    num_classes: int
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], train: bool = False):
        dt = self.dtype
        outputs, hw = [], []
        c2 = max(16, int(64 * self.width), 4 * self.reg_max)
        c3 = max(int(64 * self.width), self.num_classes)
        for k, x in enumerate(xin):
            hw.append((x.shape[1], x.shape[2]))
            r = BaseConv(c2, 3, 1, dtype=dt, name=f"reg_{k}_0")(x, train)
            r = BaseConv(c2, 3, 1, dtype=dt, name=f"reg_{k}_1")(r, train)
            r = nn.Conv(4 * self.reg_max, (1, 1), dtype=dt,
                        name=f"reg_pred_{k}")(r)
            c = BaseConv(c3, 3, 1, dtype=dt, name=f"cls_{k}_0")(x, train)
            c = BaseConv(c3, 3, 1, dtype=dt, name=f"cls_{k}_1")(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                        bias_init=nn.initializers.constant(
                            -math.log(99.0)),
                        name=f"cls_pred_{k}")(c)
            B, H, W, _ = r.shape
            outputs.append(jnp.concatenate([r, c], -1).reshape(
                B, H * W, -1))
        out = jnp.concatenate(outputs, 1)      # (B, A, 4*reg_max + C)
        return {"outputs": out, "hw": hw}

    def decode(self, out: jax.Array, hw) -> jax.Array:
        """DFL expectation -> ltrb -> cxcywh pixels + sigmoid cls.
        Returns (B, A, 4 + C)."""
        reg = out[..., :4 * self.reg_max].astype(jnp.float32)
        cls = jax.nn.sigmoid(out[..., 4 * self.reg_max:]
                             .astype(jnp.float32))
        B, A, _ = reg.shape
        bins = jnp.arange(self.reg_max, dtype=jnp.float32)
        dist = jax.nn.softmax(reg.reshape(B, A, 4, self.reg_max), -1)
        ltrb = jnp.einsum("bafr,r->baf", dist, bins)     # (B, A, 4)
        xs, ys, ss = [], [], []
        for (h, w), s in zip(hw, self.strides):
            yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                  indexing="ij")
            xs.append((xx.reshape(-1) + 0.5) * s)
            ys.append((yy.reshape(-1) + 0.5) * s)
            ss.append(jnp.full(h * w, s, jnp.float32))
        xs, ys, ss = (jnp.concatenate(z) for z in (xs, ys, ss))
        l, t, r, b = (ltrb[..., i] * ss for i in range(4))
        x1, y1 = xs - l, ys - t
        x2, y2 = xs + r, ys + b
        boxes = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2,
                           x2 - x1, y2 - y1], -1)
        return jnp.concatenate([boxes, cls], -1)


class YOLOv8(nn.Module):
    """(reference yolox/models/yolov8.py-style wrapper)."""

    num_classes: int = 80
    depth: float = 1.0
    width: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = YOLOv8PAFPN(self.depth, self.width,
                                    dtype=self.dtype)
        self.head = YOLOv8Head(self.num_classes, self.width,
                               dtype=self.dtype)

    def __call__(self, x: jax.Array, train: bool = False,
                 decode: bool = True):
        fpn = self.backbone(x, train)
        out = self.head(fpn, train)
        if decode:
            out["decoded"] = self.head.decode(out["outputs"], out["hw"])
        return out
