"""YOLOX top model (reference: yolox/models/yolox.py:11).

Pure forward: returns decoded dense predictions (eval convention of the
reference — sigmoid applied to obj/cls, boxes in pixels). Losses are
computed by `tscd_tpu.train.losses.yolox_loss` from the same raw outputs,
keeping the train step a single jitted pure function.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import decode_outputs
from .pafpn import YOLOPAFPN
from .yolo_head import YOLOXHead


class YOLOX(nn.Module):
    num_classes: int = 80
    depth: float = 1.0
    width: float = 1.0
    act: str = "silu"
    depthwise: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = YOLOPAFPN(self.depth, self.width, act=self.act,
                                  depthwise=self.depthwise, dtype=self.dtype)
        self.head = YOLOXHead(self.num_classes, self.width, act=self.act,
                              depthwise=self.depthwise, dtype=self.dtype)

    def __call__(self, x: jax.Array, train: bool = False,
                 decode: bool = True, return_features: bool = False):
        """x: (B, H, W, 3) NHWC. Returns head dict; if decode, adds
        'decoded': (B, A, 5+C) with pixel boxes and sigmoided obj/cls."""
        fpn_outs = self.backbone(x, train)
        out = self.head(fpn_outs, train, return_features=return_features)
        if decode:
            raw = out["outputs"].astype(jnp.float32)
            dec = decode_outputs(raw, out["hw"], self.head.strides)
            obj_cls = jax.nn.sigmoid(dec[..., 4:])
            out["decoded"] = jnp.concatenate([dec[..., :4], obj_cls], axis=-1)
        return out
