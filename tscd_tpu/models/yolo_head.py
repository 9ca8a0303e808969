"""Decoupled YOLOX head (reference: yolox/models/yolo_head.py:18).

The flax module computes the dense per-level predictions and (optionally)
returns the tower features needed by the video heads. Label assignment
(SimOTA) and losses live in `tscd_tpu.ops.simota` / `tscd_tpu.train.losses`
as pure fixed-shape functions — idiomatic JAX keeps the module stateless.

Output convention per level: (B, H, W, 5+C) with channels
[reg_x, reg_y, reg_w, reg_h, obj, cls_0..cls_{C-1}] (raw logits; reg raw).
Flattened across levels in stride order (8, 16, 32) to (B, A, 5+C).
"""

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, DWConv


def flatten_levels(level_outputs: Sequence[jax.Array]) -> jax.Array:
    """[(B,H,W,K)...] -> (B, sum(H*W), K), level order preserved."""
    return jnp.concatenate(
        [o.reshape(o.shape[0], -1, o.shape[-1]) for o in level_outputs], axis=1)


class YOLOXHead(nn.Module):
    num_classes: int
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    in_channels: Sequence[int] = (256, 512, 1024)
    act: str = "silu"
    depthwise: bool = False
    prior_prob: float = 1e-2
    dtype: Any = jnp.float32

    def _pred_bias_init(self):
        b = -math.log((1 - self.prior_prob) / self.prior_prob)
        return nn.initializers.constant(b)

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], train: bool = False,
                 return_features: bool = False):
        """Returns dict with:
          outputs: (B, A, 5+C) raw (reg raw, obj/cls logits)
          hw: list of (H, W) per level
          cls_feat/reg_feat: (B, A, 256*width) tower features (if requested)
        """
        Conv = DWConv if self.depthwise else BaseConv
        hidden = int(256 * self.width)
        dt = self.dtype

        level_outputs = []
        cls_feats, reg_feats = [], []
        hw = []
        for k, x in enumerate(xin):
            hw.append((x.shape[1], x.shape[2]))
            x = BaseConv(hidden, 1, 1, act=self.act, dtype=dt,
                         name=f"stem_{k}")(x, train)
            cls_f = x
            for i in range(2):
                cls_f = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                             name=f"cls_conv_{k}_{i}")(cls_f, train)
            reg_f = x
            for i in range(2):
                reg_f = Conv(hidden, 3, 1, act=self.act, dtype=dt,
                             name=f"reg_conv_{k}_{i}")(reg_f, train)

            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                              bias_init=self._pred_bias_init(),
                              name=f"cls_pred_{k}")(cls_f)
            reg_out = nn.Conv(4, (1, 1), dtype=dt, name=f"reg_pred_{k}")(reg_f)
            obj_out = nn.Conv(1, (1, 1), dtype=dt,
                              bias_init=self._pred_bias_init(),
                              name=f"obj_pred_{k}")(reg_f)

            level_outputs.append(
                jnp.concatenate([reg_out, obj_out, cls_out], axis=-1))
            if return_features:
                cls_feats.append(cls_f)
                reg_feats.append(reg_f)

        out = {"outputs": flatten_levels(level_outputs), "hw": hw}
        if return_features:
            out["cls_feat"] = flatten_levels(cls_feats)
            out["reg_feat"] = flatten_levels(reg_feats)
        return out
