"""Grid decode for YOLOX-style dense predictions.

Reference semantics (yolox/models/yolo_head.py:230-265):
  xy = (pred_xy + grid_xy) * stride      (box centers, pixels)
  wh = exp(pred_wh) * stride
Grids are static per (H, W) — precomputed at trace time, folded into the
compiled graph as constants.
"""

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def make_grids_and_strides(hw: Tuple[Tuple[int, int], ...],
                           strides: Tuple[int, ...]) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenated (A, 2) grid coords and (A, 1) strides for all levels."""
    grids, strs = [], []
    for (h, w), s in zip(hw, strides):
        yv, xv = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([xv, yv], axis=-1).reshape(-1, 2).astype(np.float32)
        grids.append(grid)
        strs.append(np.full((grid.shape[0], 1), s, np.float32))
    return np.concatenate(grids, 0), np.concatenate(strs, 0)


def decode_outputs(outputs: jax.Array, hw: Sequence[Tuple[int, int]],
                   strides: Sequence[int]) -> jax.Array:
    """Decode (B, A, 5+C) raw head output (reg4, obj, cls...) in place.

    Returns (B, A, 5+C) with [..., :2] = center pixels, [..., 2:4] = wh
    pixels; obj/cls columns are passed through (caller applies sigmoid).
    """
    grids, strs = make_grids_and_strides(tuple(map(tuple, hw)), tuple(strides))
    grids = jnp.asarray(grids, outputs.dtype)
    strs = jnp.asarray(strs, outputs.dtype)
    xy = (outputs[..., :2] + grids) * strs
    wh = jnp.exp(outputs[..., 2:4]) * strs
    return jnp.concatenate([xy, wh, outputs[..., 4:]], axis=-1)


def anchor_centers(hw: Sequence[Tuple[int, int]],
                   strides: Sequence[int]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-anchor (x_shift, y_shift, stride) arrays of shape (A,)."""
    grids, strs = make_grids_and_strides(tuple(map(tuple, hw)), tuple(strides))
    return grids[:, 0], grids[:, 1], strs[:, 0]
