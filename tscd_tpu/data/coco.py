"""Still-image COCO-format dataset + mosaic/mixup augmentation + loader.

Counterparts of yolox/data/datasets/coco.py (COCODataset),
yolox/data/datasets/mosaicdetection.py:39 (MosaicDetection) and the
still-image DataLoader/InfiniteSampler (yolox/data/dataloading.py:32,
samplers.py:30). Host-side numpy/cv2 only; batches come out NHWC float32
ready for jax.device_put.
"""

import math
import os
import random
import threading
import queue as queue_mod
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

from ..eval.coco_api import COCO
from .transforms import (TrainTransform, ValTransform, augment_hsv,
                         letterbox, random_perspective, xyxy2cxcywh)


class COCODataset:
    """COCO-json detection dataset (reference coco.py). Returns
    (img HWC uint8 BGR, (N,5) [x1,y1,x2,y2,cls] at ORIGINAL resolution,
    (h, w), image_id)."""

    def __init__(self, json_file: str, data_dir: str = "",
                 name: str = "train2017", img_size=(640, 640)):
        self.data_dir = data_dir
        self.name = name
        self.img_size = tuple(img_size)
        self.coco = COCO(json_file)
        self.ids = sorted(self.coco.getImgIds())
        self.class_ids = sorted(self.coco.getCatIds())
        cats = self.coco.loadCats(self.class_ids)
        self.classes = [c["name"] for c in cats]
        self.annotations = [self._load_anno(i) for i in self.ids]

    def _load_anno(self, id_):
        im = self.coco.loadImgs(id_)[0]
        width, height = im["width"], im["height"]
        anns = self.coco.loadAnns(
            self.coco.getAnnIds(imgIds=[id_], iscrowd=0))
        rows = []
        for obj in anns:
            x1 = max(0, obj["bbox"][0])
            y1 = max(0, obj["bbox"][1])
            x2 = min(width, x1 + max(0, obj["bbox"][2]))
            y2 = min(height, y1 + max(0, obj["bbox"][3]))
            if obj.get("area", 0) > 0 and x2 >= x1 and y2 >= y1:
                rows.append([x1, y1, x2, y2,
                             self.class_ids.index(obj["category_id"])])
        res = np.asarray(rows, np.float32).reshape(-1, 5)
        file_name = im.get("file_name", f"{id_:012d}.jpg")
        return res, (height, width), file_name

    def __len__(self):
        return len(self.ids)

    def load_image(self, index: int) -> np.ndarray:
        _, _, file_name = self.annotations[index]
        path = os.path.join(self.data_dir, self.name, file_name)
        img = cv2.imread(path)
        assert img is not None, f"missing image {path}"
        return img

    def pull_item(self, index: int):
        res, (h, w), _ = self.annotations[index]
        img = self.load_image(index)
        return img, res.copy(), (h, w), self.ids[index]


def get_mosaic_coordinate(mosaic_index, xc, yc, w, h, input_h, input_w):
    """Tile placement for 2x2 mosaic (reference mosaicdetection.py:14)."""
    if mosaic_index == 0:
        x1, y1, x2, y2 = max(xc - w, 0), max(yc - h, 0), xc, yc
        s_x1, s_y1, s_x2, s_y2 = w - (x2 - x1), h - (y2 - y1), w, h
    elif mosaic_index == 1:
        x1, y1, x2, y2 = xc, max(yc - h, 0), min(xc + w, input_w * 2), yc
        s_x1, s_y1, s_x2, s_y2 = 0, h - (y2 - y1), min(w, x2 - x1), h
    elif mosaic_index == 2:
        x1, y1, x2, y2 = max(xc - w, 0), yc, xc, min(input_h * 2, yc + h)
        s_x1, s_y1, s_x2, s_y2 = w - (x2 - x1), 0, w, min(y2 - y1, h)
    else:
        x1, y1, x2, y2 = (xc, yc, min(xc + w, input_w * 2),
                          min(input_h * 2, yc + h))
        s_x1, s_y1, s_x2, s_y2 = 0, 0, min(w, x2 - x1), min(y2 - y1, h)
    return (x1, y1, x2, y2), (s_x1, s_y1, s_x2, s_y2)


class MosaicDetection:
    """Mosaic + random-perspective + mixup pipeline
    (reference MosaicDetection, mosaicdetection.py:39). `video_aware` makes
    the 3 extra tiles come from the same video (MosaicDetection_VID,
    :239 get_mosic_idx) via dataset-provided `same_video_indices`."""

    def __init__(self, dataset, img_size, mosaic=True, preproc=None,
                 degrees=10.0, translate=0.1, mosaic_scale=(0.1, 2),
                 mixup_scale=(0.5, 1.5), shear=2.0, enable_mixup=True,
                 mosaic_prob=1.0, mixup_prob=1.0, video_aware=False):
        self._dataset = dataset
        self.preproc = preproc or TrainTransform(max_labels=120)
        self.degrees = degrees
        self.translate = translate
        self.scale = mosaic_scale
        self.shear = shear
        self.mixup_scale = mixup_scale
        self.enable_mosaic = mosaic
        self.enable_mixup = enable_mixup
        self.mosaic_prob = mosaic_prob
        self.mixup_prob = mixup_prob
        self.img_size = tuple(img_size)
        self.video_aware = video_aware

    def __len__(self):
        return len(self._dataset)

    def _extra_indices(self, idx, k=3):
        if self.video_aware and hasattr(self._dataset,
                                        "same_video_indices"):
            pool = self._dataset.same_video_indices(idx)
            return [random.choice(pool) for _ in range(k)]
        return [random.randint(0, len(self._dataset) - 1) for _ in range(k)]

    def __getitem__(self, idx: int):
        input_h, input_w = self.img_size
        if self.enable_mosaic and random.random() < self.mosaic_prob:
            mosaic_labels = []
            yc = int(random.uniform(0.5 * input_h, 1.5 * input_h))
            xc = int(random.uniform(0.5 * input_w, 1.5 * input_w))
            indices = [idx] + self._extra_indices(idx)
            mosaic_img = np.full((input_h * 2, input_w * 2, 3), 114,
                                 np.uint8)
            for i_m, index in enumerate(indices):
                img, _labels, _, _ = self._dataset.pull_item(index)
                h0, w0 = img.shape[:2]
                scale = min(1. * input_h / h0, 1. * input_w / w0)
                img = cv2.resize(img, (int(w0 * scale), int(h0 * scale)),
                                 interpolation=cv2.INTER_LINEAR)
                h, w = img.shape[:2]
                (l_x1, l_y1, l_x2, l_y2), (s_x1, s_y1, s_x2, s_y2) = \
                    get_mosaic_coordinate(i_m, xc, yc, w, h, input_h,
                                          input_w)
                mosaic_img[l_y1:l_y2, l_x1:l_x2] = img[s_y1:s_y2, s_x1:s_x2]
                padw, padh = l_x1 - s_x1, l_y1 - s_y1
                labels = _labels.copy()
                if _labels.size > 0:
                    labels[:, 0] = scale * _labels[:, 0] + padw
                    labels[:, 1] = scale * _labels[:, 1] + padh
                    labels[:, 2] = scale * _labels[:, 2] + padw
                    labels[:, 3] = scale * _labels[:, 3] + padh
                mosaic_labels.append(labels)
            if len(mosaic_labels):
                mosaic_labels = np.concatenate(mosaic_labels, 0)
                np.clip(mosaic_labels[:, 0], 0, 2 * input_w,
                        out=mosaic_labels[:, 0])
                np.clip(mosaic_labels[:, 1], 0, 2 * input_h,
                        out=mosaic_labels[:, 1])
                np.clip(mosaic_labels[:, 2], 0, 2 * input_w,
                        out=mosaic_labels[:, 2])
                np.clip(mosaic_labels[:, 3], 0, 2 * input_h,
                        out=mosaic_labels[:, 3])
            mosaic_img, mosaic_labels = random_perspective(
                mosaic_img, mosaic_labels, degrees=self.degrees,
                translate=self.translate, scale=self.scale,
                shear=self.shear,
                border=(-input_h // 2, -input_w // 2))
            if (self.enable_mixup and len(mosaic_labels)
                    and random.random() < self.mixup_prob):
                mosaic_img, mosaic_labels = self.mixup(
                    mosaic_img, mosaic_labels, self.img_size)
            img, padded_labels = self.preproc(mosaic_img, mosaic_labels,
                                              self.img_size)
            return img, padded_labels
        img, label, _, _ = self._dataset.pull_item(idx)
        img, padded_labels = self.preproc(img, label, self.img_size)
        return img, padded_labels

    def mixup(self, origin_img, origin_labels, input_dim):
        """(reference mosaicdetection.py:167)."""
        jit_factor = random.uniform(*self.mixup_scale)
        flip = random.random() > 0.5
        cp_index = self._extra_indices(None if not self.video_aware else 0,
                                       1)[0] if self.video_aware else \
            random.randint(0, len(self._dataset) - 1)
        img, cp_labels, _, _ = self._dataset.pull_item(cp_index)
        while len(cp_labels) == 0:
            cp_index = random.randint(0, len(self._dataset) - 1)
            img, cp_labels, _, _ = self._dataset.pull_item(cp_index)

        cp_img = np.full((input_dim[0], input_dim[1], 3), 114, np.uint8)
        cp_scale_ratio = min(input_dim[0] / img.shape[0],
                             input_dim[1] / img.shape[1])
        resized = cv2.resize(
            img, (int(img.shape[1] * cp_scale_ratio),
                  int(img.shape[0] * cp_scale_ratio)),
            interpolation=cv2.INTER_LINEAR)
        cp_img[:resized.shape[0], :resized.shape[1]] = resized
        cp_img = cv2.resize(cp_img, (int(cp_img.shape[1] * jit_factor),
                                     int(cp_img.shape[0] * jit_factor)))
        cp_scale_ratio *= jit_factor
        if flip:
            cp_img = cp_img[:, ::-1, :]
        origin_h, origin_w = cp_img.shape[:2]
        target_h, target_w = origin_img.shape[:2]
        padded_img = np.zeros((max(origin_h, target_h),
                               max(origin_w, target_w), 3), np.uint8)
        padded_img[:origin_h, :origin_w] = cp_img
        x_offset, y_offset = 0, 0
        if padded_img.shape[0] > target_h:
            y_offset = random.randint(0, padded_img.shape[0] - target_h - 1)
        if padded_img.shape[1] > target_w:
            x_offset = random.randint(0, padded_img.shape[1] - target_w - 1)
        padded_cropped_img = padded_img[
            y_offset:y_offset + target_h, x_offset:x_offset + target_w]

        cp_bboxes_origin_np = cp_labels[:, :4].copy() * cp_scale_ratio
        cp_bboxes_origin_np[:, 0::2] = np.clip(
            cp_bboxes_origin_np[:, 0::2], 0, origin_w)
        cp_bboxes_origin_np[:, 1::2] = np.clip(
            cp_bboxes_origin_np[:, 1::2], 0, origin_h)
        if flip:
            cp_bboxes_origin_np[:, 0::2] = (
                origin_w - cp_bboxes_origin_np[:, 0::2][:, ::-1])
        cp_bboxes_transformed_np = cp_bboxes_origin_np.copy()
        cp_bboxes_transformed_np[:, 0::2] = np.clip(
            cp_bboxes_transformed_np[:, 0::2] - x_offset, 0, target_w)
        cp_bboxes_transformed_np[:, 1::2] = np.clip(
            cp_bboxes_transformed_np[:, 1::2] - y_offset, 0, target_h)

        cls_labels = cp_labels[:, 4:5].copy()
        box_labels = cp_bboxes_transformed_np
        labels = np.hstack((box_labels, cls_labels))
        origin_labels = np.vstack((origin_labels, labels))
        origin_img = origin_img.astype(np.float32)
        origin_img = 0.5 * origin_img + 0.5 * padded_cropped_img.astype(
            np.float32)
        return origin_img.astype(np.uint8), origin_labels


class BatchLoader:
    """Infinite shuffled batch loader with a background prefetch thread
    (replaces torch DataLoader + InfiniteSampler + YoloBatchSampler +
    still-image DataPrefetcher). Yields dicts {imgs (B,H,W,3) f32,
    labels (B,M,5)} forever; `steps_per_epoch` = len(dataset)//B."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch

    @property
    def steps_per_epoch(self) -> int:
        return max(len(self.dataset) // self.batch_size, 1)

    def __iter__(self):
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=self.prefetch)
        rng = random.Random(self.seed)

        def worker():
            order = list(range(len(self.dataset)))
            while True:
                if self.shuffle:
                    rng.shuffle(order)
                for i in range(0, len(order) - self.batch_size + 1,
                               self.batch_size):
                    idxs = order[i:i + self.batch_size]
                    imgs, labels = [], []
                    for j in idxs:
                        im, lab = self.dataset[j]
                        imgs.append(im)
                        labels.append(lab)
                    q.put({"imgs": np.stack(imgs).astype(np.float32),
                           "labels": np.stack(labels).astype(np.float32)})

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            yield q.get()
