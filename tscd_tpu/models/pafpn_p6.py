"""P6 (stride-64) backbone + PAFPN (reference: yolox/models/darknet.py
CSPDarknetP6:182 and yolo_pafpn_p6.py): adds a dark6 stage and a 4-level
neck emitting stride 8/16/32/64 features."""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv, Focus, SPPBottleneck
from .pafpn import upsample2x


class CSPDarknetP6(nn.Module):
    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        Conv = DWConv if self.depthwise else BaseConv
        w = lambda c: int(c * self.width)
        d = lambda n: max(round(n * self.depth), 1)
        x = x.astype(dt)  # raw pixels, matching CSPDarknet/the reference
        x = Focus(w(64), 3, act=self.act, dtype=dt, name="stem")(x, train)
        outs = {}
        specs = [("dark2", 128, d(3), False),
                 ("dark3", 256, d(9), False),
                 ("dark4", 512, d(9), False),
                 ("dark5", 768, d(3), False),
                 ("dark6", 1024, d(3), True)]
        for name, ch, n, last in specs:
            x = Conv(w(ch), 3, 2, act=self.act, dtype=dt,
                     name=f"{name}_conv")(x, train)
            if last:
                x = SPPBottleneck(w(ch), act=self.act, dtype=dt,
                                  name=f"{name}_spp")(x, train)
            x = CSPLayer(w(ch), n=n, shortcut=not last,
                         depthwise=self.depthwise, act=self.act, dtype=dt,
                         name=f"{name}_csp")(x, train)
            outs[name] = x
        return outs


class YOLOPAFPNP6(nn.Module):
    """4-level PAFPN over CSPDarknetP6 (yolo_pafpn_p6.py)."""

    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        Conv = DWConv if self.depthwise else BaseConv
        w = lambda c: int(c * self.width)
        n = max(round(3 * self.depth), 1)
        feats = CSPDarknetP6(self.depth, self.width, self.act,
                             self.depthwise, dtype=dt,
                             name="backbone")(x, train)
        c3, c4, c5, c6 = (feats[k] for k in ("dark3", "dark4", "dark5",
                                             "dark6"))

        def csp(z, ch, name):
            return CSPLayer(w(ch), n=n, shortcut=False,
                            depthwise=self.depthwise, act=self.act,
                            dtype=dt, name=name)(z, train)

        lat6 = BaseConv(w(768), 1, 1, act=self.act, dtype=dt,
                        name="lat6")(c6, train)
        p5 = csp(jnp.concatenate([upsample2x(lat6), c5], -1), 768, "p5")
        lat5 = BaseConv(w(512), 1, 1, act=self.act, dtype=dt,
                        name="lat5")(p5, train)
        p4 = csp(jnp.concatenate([upsample2x(lat5), c4], -1), 512, "p4")
        lat4 = BaseConv(w(256), 1, 1, act=self.act, dtype=dt,
                        name="lat4")(p4, train)
        p3 = csp(jnp.concatenate([upsample2x(lat4), c3], -1), 256, "p3")

        d3 = Conv(w(256), 3, 2, act=self.act, dtype=dt,
                  name="down3")(p3, train)
        n4 = csp(jnp.concatenate([d3, lat4], -1), 512, "n4")
        d4 = Conv(w(512), 3, 2, act=self.act, dtype=dt,
                  name="down4")(n4, train)
        n5 = csp(jnp.concatenate([d4, lat5], -1), 768, "n5")
        d5 = Conv(w(768), 3, 2, act=self.act, dtype=dt,
                  name="down5")(n5, train)
        n6 = csp(jnp.concatenate([d5, lat6], -1), 1024, "n6")
        return (p3, n4, n5, n6)
