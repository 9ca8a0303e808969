"""Debug visualizations (reference: yolox/utils/debug_vis.py
visual_predictions:9, feature_visualization.py:12, and the
Attention_msa_visual variants in post_trans.py:829).

Host-side cv2/numpy helpers: draw raw prediction rows, dump feature-map
channel grids, and render cross-frame attention heatmaps from the
`attn` matrix the aggregation kernels return."""

import os
from typing import Optional, Sequence

import cv2
import numpy as np

from .visualize import vis


def visual_predictions(img: np.ndarray, dets: np.ndarray,
                       conf: float = 0.1,
                       class_names: Optional[Sequence[str]] = None,
                       save_path: Optional[str] = None) -> np.ndarray:
    """(K, 7) [x1,y1,x2,y2,obj,score,cls] rows -> drawn image."""
    dets = np.asarray(dets, np.float32).reshape(-1, 7)
    out = vis(img.copy(), dets[:, :4], dets[:, 4] * dets[:, 5],
              dets[:, 6], conf, class_names)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        cv2.imwrite(save_path, out)
    return out


def feature_grid(feat: np.ndarray, max_channels: int = 16,
                 save_path: Optional[str] = None) -> np.ndarray:
    """(H, W, C) feature map -> tiled per-channel grayscale grid
    (feature_visualization.py:12)."""
    C = min(feat.shape[-1], max_channels)
    cols = int(np.ceil(np.sqrt(C)))
    rows = int(np.ceil(C / cols))
    H, W = feat.shape[:2]
    grid = np.zeros((rows * H, cols * W), np.uint8)
    for c in range(C):
        f = feat[..., c]
        f = (f - f.min()) / max(f.max() - f.min(), 1e-9)
        r, co = divmod(c, cols)
        grid[r * H:(r + 1) * H, co * W:(co + 1) * W] = (f * 255).astype(
            np.uint8)
    if save_path:
        cv2.imwrite(save_path, grid)
    return grid


def attention_heatmap(attn: np.ndarray, query_idx: int,
                      key_boxes: np.ndarray, img: np.ndarray,
                      save_path: Optional[str] = None) -> np.ndarray:
    """Render one query's attention over key proposals as box-weighted
    heat (the Attention_msa_visual idea, post_trans.py:829).

    attn: (Q, K) head-averaged weights; key_boxes: (K, 4) xyxy on img."""
    heat = np.zeros(img.shape[:2], np.float32)
    w = np.asarray(attn[query_idx], np.float32)
    w = w / max(w.max(), 1e-9)
    for k, box in enumerate(np.asarray(key_boxes, int)):
        x1, y1, x2, y2 = np.clip(box, 0, None)
        heat[y1:y2, x1:x2] = np.maximum(heat[y1:y2, x1:x2], w[k])
    hm = cv2.applyColorMap((heat * 255).astype(np.uint8),
                           cv2.COLORMAP_JET)
    out = cv2.addWeighted(img, 0.5, hm, 0.5, 0)
    if save_path:
        cv2.imwrite(save_path, out)
    return out
