"""YOLO PAFPN neck (reference: yolox/models/yolo_pafpn.py:12).

CSPDarknet backbone + top-down FPN + bottom-up PAN. Outputs
(pan_out2 stride 8, pan_out1 stride 16, pan_out0 stride 32), NHWC.
Nearest-neighbour 2x upsampling is a pure reshape/broadcast — XLA fuses it
into the adjacent concat+conv.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv
from .darknet import CSPDarknet


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest 2x upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class YOLOPAFPN(nn.Module):
    depth: float = 1.0
    width: float = 1.0
    in_features: Sequence[str] = ("dark3", "dark4", "dark5")
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if x.dtype == jnp.uint8:
            # uint8 transport: letterboxed pixels are integer-exact, so
            # uploading raw uint8 (4x fewer host->HBM bytes than fp32)
            # and casting here is bit-identical to the fp32 feed
            # (tests/test_vid_datasets.py::test_uint8_transport_exact)
            x = x.astype(jnp.float32)
        dt = self.dtype
        Conv = DWConv if self.depthwise else BaseConv
        ch = [int(c * self.width) for c in self.in_channels]
        n = round(3 * self.depth)

        feats = CSPDarknet(self.depth, self.width, self.in_features,
                           self.depthwise, self.act, dtype=dt,
                           name="backbone")(x, train)
        x2, x1, x0 = [feats[f] for f in self.in_features]

        fpn_out0 = BaseConv(ch[1], 1, 1, act=self.act, dtype=dt,
                            name="lateral_conv0")(x0, train)
        f_out0 = jnp.concatenate([upsample2x(fpn_out0), x1], axis=-1)
        f_out0 = CSPLayer(ch[1], n=n, shortcut=False, depthwise=self.depthwise,
                          act=self.act, dtype=dt, name="C3_p4")(f_out0, train)

        fpn_out1 = BaseConv(ch[0], 1, 1, act=self.act, dtype=dt,
                            name="reduce_conv1")(f_out0, train)
        f_out1 = jnp.concatenate([upsample2x(fpn_out1), x2], axis=-1)
        pan_out2 = CSPLayer(ch[0], n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=dt, name="C3_p3")(f_out1, train)

        p_out1 = Conv(ch[0], 3, 2, act=self.act, dtype=dt,
                      name="bu_conv2")(pan_out2, train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(ch[1], n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=dt, name="C3_n3")(p_out1, train)

        p_out0 = Conv(ch[1], 3, 2, act=self.act, dtype=dt,
                      name="bu_conv1")(pan_out1, train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(ch[2], n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=dt, name="C3_n4")(p_out0, train)

        return (pan_out2, pan_out1, pan_out0)
