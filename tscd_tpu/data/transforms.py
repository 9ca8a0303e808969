"""Host-side image transforms (reference: yolox/data/data_augment.py).

All functions operate on HWC uint8 BGR numpy images (cv2 convention) and
produce NHWC float32 batches for the device — the TPU build keeps images
channels-last end to end (no CHW transpose like the reference's
preproc swap=(2,0,1), data_augment.py:248).
"""

import math
import random
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np


def xyxy2cxcywh(boxes: np.ndarray) -> np.ndarray:
    out = boxes.copy()
    out[:, 2] = boxes[:, 2] - boxes[:, 0]
    out[:, 3] = boxes[:, 3] - boxes[:, 1]
    out[:, 0] = boxes[:, 0] + out[:, 2] * 0.5
    out[:, 1] = boxes[:, 1] + out[:, 3] * 0.5
    return out


def augment_hsv(img: np.ndarray, hgain: float = 5, sgain: float = 30,
                vgain: float = 30) -> None:
    """In-place HSV jitter (data_augment.py:21)."""
    gains = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain]
    gains *= np.random.randint(0, 2, 3)
    gains = gains.astype(np.int16)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int16)
    hsv[..., 0] = (hsv[..., 0] + gains[0]) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] + gains[1], 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] + gains[2], 0, 255)
    cv2.cvtColor(hsv.astype(img.dtype), cv2.COLOR_HSV2BGR, dst=img)


def mirror(image: np.ndarray, boxes: np.ndarray,
           prob: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip with xyxy boxes (data_augment.py:240)."""
    _, width, _ = image.shape
    if random.random() < prob:
        image = image[:, ::-1]
        boxes = boxes.copy()
        boxes[:, 0::2] = width - boxes[:, 2::-2]
    return image, boxes


def letterbox(img: np.ndarray, input_size: Tuple[int, int]
              ) -> Tuple[np.ndarray, float]:
    """Min-ratio resize onto a 114-gray canvas, top-left anchored
    (data_augment.py:248). Returns HWC float32 and the resize ratio."""
    if len(img.shape) == 3:
        padded = np.full((input_size[0], input_size[1], 3), 114, np.uint8)
    else:
        padded = np.full(input_size, 114, np.uint8)
    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    rw, rh = int(img.shape[1] * r), int(img.shape[0] * r)
    resized = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
    padded[:rh, :rw] = resized.astype(np.uint8)
    return np.ascontiguousarray(padded, dtype=np.float32), r


def box_candidates(box1: np.ndarray, box2: np.ndarray, wh_thr: float = 2,
                   ar_thr: float = 20, area_thr: float = 0.2) -> np.ndarray:
    """(4,N) pre/post-augment xyxy boxes -> keep mask
    (data_augment.py:46)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + 1e-16) > area_thr) & (ar < ar_thr))


def random_perspective(img: np.ndarray, targets: np.ndarray,
                       degrees: float = 10, translate: float = 0.1,
                       scale: Tuple[float, float] = (0.5, 1.5),
                       shear: float = 2.0,
                       border: Tuple[int, int] = (0, 0)
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Affine warp used after mosaic (data_augment.py:61). targets are
    (N, 5) [x1, y1, x2, y2, cls]."""
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(scale[0], scale[1])
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                             borderValue=(114, 114, 114))

    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = (xy @ M.T)[:, :2].reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        xy = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        xy[:, [0, 2]] = xy[:, [0, 2]].clip(0, width)
        xy[:, [1, 3]] = xy[:, [1, 3]].clip(0, height)
        keep = box_candidates(box1=targets[:, :4].T * s, box2=xy.T)
        targets = targets[keep]
        targets[:, :4] = xy[keep]
    return img, targets


class TrainTransform:
    """Still-image train transform: HSV -> flip -> letterbox; returns
    (HWC float32, (max_labels, 5) [cls, cx, cy, w, h]) — semantics of
    data_augment.py:267 with NHWC output."""

    def __init__(self, max_labels: int = 50, flip_prob: float = 0.5,
                 hsv_prob: float = 1.0):
        self.max_labels = max_labels
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob

    def __call__(self, image: np.ndarray, targets: np.ndarray,
                 input_dim: Tuple[int, int]):
        boxes = targets[:, :4].copy()
        labels = targets[:, 4].copy()
        if len(boxes) == 0:
            image, _ = letterbox(image, input_dim)
            return image, np.zeros((self.max_labels, 5), np.float32)

        image_o, targets_o = image.copy(), targets.copy()
        boxes_o = xyxy2cxcywh(targets_o[:, :4])
        labels_o = targets_o[:, 4]

        if random.random() < self.hsv_prob:
            augment_hsv(image)
        image_t, boxes = mirror(image, boxes, self.flip_prob)
        image_t, r = letterbox(image_t, input_dim)
        boxes = xyxy2cxcywh(boxes) * r

        mask = np.minimum(boxes[:, 2], boxes[:, 3]) > 1
        boxes_t, labels_t = boxes[mask], labels[mask]
        if len(boxes_t) == 0:
            image_t, r_o = letterbox(image_o, input_dim)
            boxes_t, labels_t = boxes_o * r_o, labels_o

        targets_t = np.hstack((labels_t[:, None], boxes_t))
        padded = np.zeros((self.max_labels, 5), np.float32)
        n = min(len(targets_t), self.max_labels)
        padded[:n] = targets_t[:n]
        return image_t, padded


class ValTransform:
    """Letterbox only; returns (HWC float32, dummy labels)."""

    def __init__(self, legacy: bool = False):
        self.legacy = legacy

    def __call__(self, img, res, input_size):
        img, _ = letterbox(img, input_size)
        if self.legacy:
            img = img[:, :, ::-1].copy()
            img /= 255.0
            img -= np.array([0.485, 0.456, 0.406])
            img /= np.array([0.229, 0.224, 0.225])
        return img, np.zeros((1, 5), np.float32)


class VidValTransform:
    """Video eval transform: letterbox image AND scale gt boxes by the
    same ratio (data_augment.py:351). Returns (img, (N,5) [cls, xyxy])."""

    def __init__(self, legacy: bool = False):
        self.legacy = legacy

    def __call__(self, img, res, input_size):
        img, r = letterbox(img, input_size)
        if self.legacy:
            img = img[:, :, ::-1].copy()
            img /= 255.0
            img -= np.array([0.485, 0.456, 0.406])
            img /= np.array([0.229, 0.224, 0.225])
        boxes = res[:, :4].copy() * r
        labels = res[:, 4:5].copy()
        return img, np.hstack((labels, boxes)).astype(np.float32)
