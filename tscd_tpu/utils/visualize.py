"""Box drawing (reference: yolox/utils/visualize.py:11)."""

from typing import Optional, Sequence

import cv2
import numpy as np

_COLORS = (np.array([
    0.000, 0.447, 0.741, 0.850, 0.325, 0.098, 0.929, 0.694, 0.125,
    0.494, 0.184, 0.556, 0.466, 0.674, 0.188, 0.301, 0.745, 0.933,
    0.635, 0.078, 0.184, 0.300, 0.300, 0.300, 0.600, 0.600, 0.600,
    1.000, 0.000, 0.000, 1.000, 0.500, 0.000, 0.749, 0.749, 0.000,
    0.000, 1.000, 0.000, 0.000, 0.000, 1.000, 0.667, 0.000, 1.000,
    0.333, 0.333, 0.000, 0.333, 0.667, 0.000, 0.333, 1.000, 0.000,
    0.667, 0.333, 0.000, 0.667, 0.667, 0.000, 0.667, 1.000, 0.000,
    1.000, 0.333, 0.000, 1.000, 0.667, 0.000, 1.000, 1.000, 0.000,
    0.000, 0.333, 0.500, 0.000, 0.667, 0.500, 0.000, 1.000, 0.500,
    0.333, 0.000, 0.500, 0.333, 0.333, 0.500, 0.333, 0.667, 0.500,
]).astype(np.float32).reshape(-1, 3))


def vis(img: np.ndarray, boxes, scores, cls_ids, conf: float = 0.5,
        class_names: Optional[Sequence[str]] = None) -> np.ndarray:
    for i in range(len(boxes)):
        if scores[i] < conf:
            continue
        x0, y0, x1, y1 = (int(v) for v in boxes[i][:4])
        cls_id = int(cls_ids[i])
        color = (_COLORS[cls_id % len(_COLORS)] * 255).astype(
            np.uint8).tolist()
        name = (class_names[cls_id] if class_names
                and cls_id < len(class_names) else str(cls_id))
        text = f"{name}:{scores[i] * 100:.1f}%"
        txt_color = ((0, 0, 0) if np.mean(
            _COLORS[cls_id % len(_COLORS)]) > 0.5 else (255, 255, 255))
        font = cv2.FONT_HERSHEY_SIMPLEX
        txt_size = cv2.getTextSize(text, font, 0.4, 1)[0]
        cv2.rectangle(img, (x0, y0), (x1, y1), color, 2)
        txt_bk = (_COLORS[cls_id % len(_COLORS)] * 255 * 0.7).astype(
            np.uint8).tolist()
        cv2.rectangle(img, (x0, y0 + 1),
                      (x0 + txt_size[0] + 1, y0 + int(1.5 * txt_size[1])),
                      txt_bk, -1)
        cv2.putText(img, text, (x0, y0 + txt_size[1]), font, 0.4,
                    txt_color, 1)
    return img
