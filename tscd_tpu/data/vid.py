"""Video sequence datasets + window loaders.

Counterpart of yolox/data/datasets/vid.py: VIDDataset (:48) with the
ILSVRC-VID wnid class map (:28-33), XML annotation preloading (:102),
sequence construction `photo_to_sequence` (:133 — lframe consecutive
local + gframe random global frames, modes random/uniform, local_stride,
traj_linking overlap, 15-seq/video and 15000-seq caps, label-empty skip),
and the OVIS video dataset (:560 — COCO-json, short videos padded by
repeating the last frame).

TPU design: instead of torch DataLoader + CUDA-stream prefetch
(DataPrefetcher, :963), windows are produced as numpy (F, H, W, 3)
batches by a background-thread double-buffered iterator
(`WindowLoader`) that overlaps cv2 decode with device compute; the
device transfer is an async jax.device_put.
"""

import json
import os
import pickle
import random
import threading
import queue as queue_mod
from typing import Dict, List, Optional, Sequence, Tuple
from xml.dom import minidom

import cv2
import numpy as np

from ..ops.position import get_timing_signal_1d

_DECODE_POOL = None


def _decode_pool():
    """Shared frame-decode thread pool (cv2.imread drops the GIL)."""
    global _DECODE_POOL
    if _DECODE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _DECODE_POOL = ThreadPoolExecutor(
            max_workers=int(os.environ.get("TSCD_DECODE_WORKERS", "8")),
            thread_name_prefix="tscd-decode")
    return _DECODE_POOL

# ILSVRC VID 30-class wnid -> index map (reference vid.py:28-33)
VID_NAME_LIST = [
    'n02691156', 'n02419796', 'n02131653', 'n02834778', 'n01503061',
    'n02924116', 'n02958343', 'n02402425', 'n02084071', 'n02121808',
    'n02503517', 'n02118333', 'n02510455', 'n02342885', 'n02374451',
    'n02129165', 'n01674464', 'n02484322', 'n03790512', 'n02324045',
    'n02509815', 'n02411705', 'n01726692', 'n02355227', 'n02129604',
    'n04468005', 'n01662784', 'n04530566', 'n02062744', 'n02391049']
VID_CLASSES = [
    'airplane', 'antelope', 'bear', 'bicycle', 'bird', 'bus', 'car',
    'cattle', 'dog', 'domestic_cat', 'elephant', 'fox', 'giant_panda',
    'hamster', 'horse', 'lion', 'lizard', 'monkey', 'motorcycle', 'rabbit',
    'red_panda', 'sheep', 'snake', 'squirrel', 'tiger', 'train', 'turtle',
    'watercraft', 'whale', 'zebra']
NAME_NUM = {n: i for i, n in enumerate(VID_NAME_LIST)}


def parse_vid_xml(xml_path: str, img_size: Tuple[int, int]) -> np.ndarray:
    """One ILSVRC annotation xml -> (N, 5) [x1, y1, x2, y2, cls], scaled by
    the letterbox ratio for img_size (reference get_annotation,
    vid.py:238)."""
    doc = minidom.parse(xml_path)
    root = doc.documentElement
    width = int(root.getElementsByTagName("width")[0].firstChild.data)
    height = int(root.getElementsByTagName("height")[0].firstChild.data)
    rows = []
    for obj in root.getElementsByTagName("object"):
        name = obj.getElementsByTagName("name")[0].firstChild.data
        if name not in NAME_NUM:
            continue
        get = lambda t: int(obj.getElementsByTagName(t)[0].firstChild.data)
        x1 = max(0, get("xmin"))
        y1 = max(0, get("ymin"))
        x2 = min(width, get("xmax"))
        y2 = min(height, get("ymax"))
        if x2 >= x1 and y2 >= y1:
            rows.append((x1, y1, x2, y2, NAME_NUM[name]))
    res = np.zeros((len(rows), 5), np.float32)
    for i, r_ in enumerate(rows):
        res[i] = r_
    r = min(img_size[0] / height, img_size[1] / width)
    res[:, :4] *= r
    return res


def build_sequences(videos: List[List[str]], lframe: int, gframe: int,
                    mode: str = "random", training: bool = False,
                    local_stride: int = 1, traj_linking: bool = False,
                    formal: bool = False,
                    label_counts: Optional[Dict[str, int]] = None,
                    seq_cap_per_video: int = 15,
                    total_cap: int = 15000, val: bool = False,
                    tnum: int = -1,
                    rng: Optional[random.Random] = None) -> List[List[str]]:
    """photo_to_sequence semantics (vid.py:133)."""
    rng = rng or random
    res: List[List[str]] = []
    for element in videos:
        element = list(element)
        ele_len = len(element)
        if ele_len < lframe + gframe:
            if formal:
                if lframe == 0:
                    res.append(element)
                else:
                    split_num = ele_len // max(lframe, 1)
                    all_local = element[:split_num * lframe]
                    for i in np.arange(split_num) * lframe:
                        lf = all_local[i:i + lframe]
                        gf = rng.choices(element[:i] + element[i + lframe:],
                                         k=gframe)
                        res.append(lf + gf)
            continue
        if mode == "random":
            if lframe == 0:
                split_num = ele_len // gframe
                rng.shuffle(element)
                for i in range(split_num):
                    res.append(element[i * gframe:(i + 1) * gframe])
                if formal and element[split_num * gframe:]:
                    res.append(element[split_num * gframe:])
            else:
                if local_stride == 1:
                    split_num = ele_len // lframe
                    all_local = element[:split_num * lframe]
                    if training and split_num > seq_cap_per_video:
                        interval = len(all_local) // seq_cap_per_video
                        choice = np.arange(seq_cap_per_video) * interval
                    else:
                        choice = np.arange(split_num) * lframe
                    for i in choice:
                        if traj_linking and i != 0:
                            lf = all_local[i - 1:i + lframe]
                        else:
                            lf = all_local[i:i + lframe]
                            if training and label_counts is not None:
                                if sum(label_counts.get(p, 0)
                                       for p in lf) == 0:
                                    continue
                        gf = rng.sample(element[:i] + element[i + lframe:],
                                        gframe)
                        res.append(list(lf) + gf)
                    if formal and element[split_num * lframe:]:
                        tail = (element[split_num * lframe - 1:]
                                if traj_linking
                                else element[split_num * lframe:])
                        res.append(tail)
                else:
                    span = lframe * local_stride
                    split_num = ele_len // span
                    for i in range(split_num):
                        for j in range(local_stride):
                            res.append(element[span * i:span * (i + 1)]
                                       [j::local_stride])
        elif mode == "uniform":
            split_num = ele_len // gframe
            all_uniform = element[:split_num * gframe]
            for i in range(split_num):
                res.append(all_uniform[i::split_num])
        elif mode == "gl":
            split_num = ele_len // lframe
            all_local = element[:split_num * lframe]
            for i in range(split_num):
                gf = rng.sample(element[:i * lframe]
                                + element[(i + 1) * lframe:], gframe)
                res.append(all_local[i * lframe:(i + 1) * lframe] + gf)
        else:
            raise ValueError(f"unsupported mode {mode}")
    if val:
        return res if tnum == -1 else res[:tnum]
    rng.shuffle(res)
    return res[:total_cap]


class VIDDataset:
    """ImageNet VID sequence dataset (reference VIDDataset, vid.py:48).

    `file_path` is the train_seq.npy/val_seq.npy list-of-videos file; XML
    annotations are preloaded into a pickle cache keyed by image path.
    """

    def __init__(self, file_path: str, img_size=(576, 576), lframe=4,
                 gframe=12, val=False, mode="random", dataset_pth="",
                 tnum=-1, formal=False, traj_linking=False, local_stride=1,
                 training=False, cache_file=""):
        self.img_size = tuple(img_size)
        self.dataset_pth = dataset_pth
        self.val = val
        self.training = training
        self.videos = np.load(file_path, allow_pickle=True).tolist()
        self.annotations = self._preload_annotations(cache_file)
        label_counts = {k: len(v) for k, v in self.annotations.items()}
        self.res = build_sequences(
            self.videos, lframe, gframe, mode=mode, training=training,
            local_stride=local_stride, traj_linking=traj_linking,
            formal=formal, label_counts=label_counts, val=val, tnum=tnum)
        self.lframe, self.gframe = lframe, gframe

    def _preload_annotations(self, cache_file: str):
        if cache_file and os.path.exists(cache_file):
            with open(cache_file, "rb") as f:
                return pickle.load(f)
        annotations = {}
        for video in self.videos:
            for rel in video:
                xml = os.path.join(self.dataset_pth, rel).replace(
                    "Data", "Annotations").replace("JPEG", "xml")
                annotations[rel] = parse_vid_xml(xml, self.img_size)
        if cache_file:
            os.makedirs(os.path.dirname(cache_file), exist_ok=True)
            with open(cache_file, "wb") as f:
                pickle.dump(annotations, f)
        return annotations

    def __len__(self):
        return len(self.res)

    def load_frame(self, rel_path: str):
        """-> (resized HWC uint8 image, (N,5) [x1,y1,x2,y2,cls] scaled)."""
        annos = self.annotations[rel_path]
        path = os.path.join(self.dataset_pth, rel_path)
        img = cv2.imread(path)
        h, w = img.shape[:2]
        r = min(self.img_size[0] / h, self.img_size[1] / w)
        img = cv2.resize(img, (int(w * r), int(h * r)),
                         interpolation=cv2.INTER_LINEAR).astype(np.uint8)
        return img, annos.copy(), (h, w)

    def frame_index(self, rel_path: str) -> int:
        stem = os.path.splitext(os.path.basename(rel_path))[0]
        digits = "".join(c for c in stem.split("_")[-1] if c.isdigit())
        return int(digits) if digits else 0


def multiscale_resize(imgs: np.ndarray, labels: np.ndarray,
                      target_hw: Tuple[int, int]):
    """Resize a (F, H, W, 3) window + scale [cls, x, y, ...] labels
    (reference exp.preprocess / random_resize, tscd_base.py:382-424:
    on-GPU interpolate there; host cv2 here, feeding a per-size cached
    jit program)."""
    import cv2 as _cv2
    F, H, W = imgs.shape[:3]
    th, tw = target_hw
    if (th, tw) == (H, W):
        return imgs, labels
    out = np.stack([
        _cv2.resize(imgs[f], (tw, th), interpolation=_cv2.INTER_LINEAR)
        for f in range(F)])
    lab = labels.copy()
    lab[..., 1:5] *= np.array([tw / W, th / H, tw / W, th / H],
                              np.float32)
    return out.astype(np.float32), lab


class OVISVideoDataset:
    """OVIS per-frame COCO-json video dataset (reference OVIS,
    vid.py:560). Short videos are padded by repeating the last frame."""

    def __init__(self, json_path: str, data_dir: str, name: str = "",
                 img_size=(576, 576), lframe=4, gframe=12, val=False,
                 mode="random", training=False):
        from ..eval.coco_api import COCO
        self.img_size = tuple(img_size)
        self.data_dir = data_dir
        self.name = name
        self.val = val
        self.training = training
        self.coco = COCO(json_path)
        with open(json_path) as f:
            raw = json.load(f)
        self.class_ids = sorted(self.coco.getCatIds())
        n_videos = len(raw.get("videos", []))
        videos: List[List[str]] = [[] for _ in range(max(n_videos, 1))]
        self.name_id = {}
        for im in raw["images"]:
            sid = im.get("sid", 0)
            videos[sid].append(im["file_name"])
            self.name_id[im["file_name"]] = im["id"]
        for v in videos:
            v.sort()
        for v in videos:
            while 0 < len(v) < lframe + gframe:
                v.append(v[-1])
        self.annotations = {
            im["id"]: self._load_anno(im["id"]) for im in raw["images"]}
        label_counts = {fn: len(self.annotations[i][0])
                        for fn, i in self.name_id.items()}
        self.res = build_sequences(
            [v for v in videos if v], lframe, gframe, mode=mode,
            training=training, label_counts=label_counts, val=val,
            total_cap=10 ** 9)
        self.lframe, self.gframe = lframe, gframe

    def _load_anno(self, id_):
        im = self.coco.loadImgs(id_)[0]
        width, height = im["width"], im["height"]
        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=[id_],
                                                      iscrowd=0))
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
        r = min(self.img_size[0] / height, self.img_size[1] / width)
        res[:, :4] *= r
        file_name = im.get("file_name", f"{id_:012d}.jpg")
        return res, (height, width), file_name

    def __len__(self):
        return len(self.res)

    def load_frame(self, file_name: str):
        annos, img_info, img_path = self.annotations[self.name_id[file_name]]
        path = os.path.join(self.data_dir, self.name, img_path)
        img = cv2.imread(path)
        h, w = img.shape[:2]
        r = min(self.img_size[0] / h, self.img_size[1] / w)
        img = cv2.resize(img, (int(w * r), int(h * r)),
                         interpolation=cv2.INTER_LINEAR).astype(np.uint8)
        return img, annos.copy(), img_info

    def frame_index(self, file_name: str) -> int:
        stem = os.path.splitext(os.path.basename(file_name))[0]
        digits = "".join(c for c in stem.split("_")[-1] if c.isdigit())
        return int(digits) if digits else 0


class ArgoverseVideoDataset(OVISVideoDataset):
    """Argoverse-HD video dataset (reference Arg_VID, vid.py:345):
    COCO-json per-frame annotations grouped into videos by `sid` — the
    same container format OVIS uses, different category set (8 classes)
    and directory layout."""

    ARGOVERSE_CLASSES = ("person", "bicycle", "car", "motorcycle", "bus",
                         "truck", "traffic_light", "stop_sign")


def collate_window(dataset, paths: Sequence[str], max_labels: int = 120,
                   train_time_index: bool = False, cxcywh: bool = False,
                   augment: bool = False, hsv_prob: float = 1.0,
                   flip_prob: float = 0.5, img_dtype=np.float32):
    """Load one (lframe+gframe) window -> numpy batch dict
    (reference collate_fn / collate_fn_train, vid.py:817,838).

    imgs: (F, H, W, 3) float32 letterboxed (114 pad), labels (F, max, 5)
    [cls, x1, y1, x2, y2] (or cxcywh), time_embedding (F, 256).

    `augment` applies HSV jitter + horizontal flip with ONE draw per
    window (every frame transformed identically — per-frame randomness
    would corrupt the cross-frame matching signal the video heads
    learn from).

    Frame decode is fanned out over a thread pool (cv2 releases the GIL
    in imread): a 32-frame 720p window decodes in ~40 ms instead of
    ~300, which is what lets the WindowLoader keep a ~40 ms/step TPU
    eval fed (the reference leaned on torch DataLoader workers for the
    same reason). Size with TSCD_DECODE_WORKERS (default 8).

    CONTRACT: `dataset.load_frame` is called CONCURRENTLY from the pool
    threads, so implementations must be thread-safe — in particular any
    lazily-populated per-call state (annotation caches etc.) needs a
    lock or must be built eagerly in __init__ (all datasets in
    tscd_tpu.data preload annotations up front). Peak memory holds all
    F decoded frames at once (F x H x W x 3 bytes; ~88 MB for a
    32-frame 1080p window) — acceptable for the shipped window sizes;
    shrink TSCD_DECODE_WORKERS or F if that ever matters."""
    from .transforms import augment_hsv

    H, W = dataset.img_size
    F = len(paths)
    # img_dtype=np.uint8 gives the 4x-lighter device transport (pixel
    # values are integers either way; the backbone casts on-chip)
    imgs = np.full((F, H, W, 3), 114, img_dtype)
    labels = np.zeros((F, max_labels, 5), np.float32)
    infos, idxs = [], []
    do_hsv = augment and random.random() < hsv_prob
    do_flip = augment and random.random() < flip_prob
    hsv_gains = (np.random.uniform(-1, 1, 3) * [5, 30, 30]
                 * np.random.randint(0, 2, 3)).astype(np.int16) \
        if do_hsv else None
    loaded = list(_decode_pool().map(dataset.load_frame, paths))
    for i, p in enumerate(paths):
        img, annos, info = loaded[i]
        if do_hsv:
            img = np.ascontiguousarray(img)
            import cv2 as _cv2
            hsv = _cv2.cvtColor(img, _cv2.COLOR_BGR2HSV).astype(np.int16)
            hsv[..., 0] = (hsv[..., 0] + hsv_gains[0]) % 180
            hsv[..., 1] = np.clip(hsv[..., 1] + hsv_gains[1], 0, 255)
            hsv[..., 2] = np.clip(hsv[..., 2] + hsv_gains[2], 0, 255)
            img = _cv2.cvtColor(hsv.astype(np.uint8), _cv2.COLOR_HSV2BGR)
        if do_flip:
            w_img = img.shape[1]
            img = np.ascontiguousarray(img[:, ::-1])
            if len(annos):
                annos = annos.copy()
                x1 = annos[:, 0].copy()
                annos[:, 0] = w_img - annos[:, 2]
                annos[:, 2] = w_img - x1
        imgs[i, :img.shape[0], :img.shape[1]] = img
        n = min(len(annos), max_labels)
        if n:
            lab = np.concatenate([annos[:n, 4:5], annos[:n, :4]], axis=1)
            if cxcywh:
                xy = lab[:, 1:].copy()
                lab[:, 1] = (xy[:, 0] + xy[:, 2]) / 2
                lab[:, 2] = (xy[:, 1] + xy[:, 3]) / 2
                lab[:, 3] = xy[:, 2] - xy[:, 0]
                lab[:, 4] = xy[:, 3] - xy[:, 1]
            labels[i, :n] = lab
        infos.append(info)
        idxs.append(i if train_time_index else dataset.frame_index(p))
    te = get_timing_signal_1d(np.asarray(idxs, np.float32), 256)
    return {"imgs": imgs, "labels": labels, "time_embedding": te,
            "infos": infos, "paths": list(paths)}


class WindowLoader:
    """Double-buffered background loader: overlaps cv2 decode of the next
    window with device compute on the current one (replaces the CUDA-
    stream DataPrefetcher, vid.py:963)."""

    def __init__(self, dataset, shuffle: bool = False, max_labels: int = 120,
                 train_time_index: bool = False, cxcywh: bool = False,
                 prefetch: int = 2, augment: bool = False,
                 hsv_prob: float = 1.0, flip_prob: float = 0.5,
                 img_dtype=np.float32, batch_windows: int = 1):
        self.dataset = dataset
        self.shuffle = shuffle
        self.max_labels = max_labels
        self.train_time_index = train_time_index
        self.cxcywh = cxcywh
        self.prefetch = prefetch
        self.augment = augment
        self.hsv_prob = hsv_prob
        self.flip_prob = flip_prob
        self.img_dtype = img_dtype
        # batch_windows > 1 stacks B collated windows on a new leading
        # axis (imgs [B,F,H,W,3], ...) — the data-parallel unit for the
        # trainer mesh (one window per 'data' shard, the TPU analogue of
        # the reference's one-batch-per-GPU DDP split, yolox_base.py:183).
        # The last partial group is dropped so every step has the same
        # static shape.
        self.batch_windows = max(int(batch_windows), 1)
        if self.batch_windows > len(dataset.res):
            raise ValueError(
                f"batch_windows({self.batch_windows}) exceeds the "
                f"dataset's {len(dataset.res)} windows — every optimizer "
                f"step needs batch_windows full windows (shrink "
                f"mesh_data/window_batch or enlarge the dataset)")

    def __len__(self):
        return len(self.dataset.res) // self.batch_windows

    def __iter__(self):
        seqs = list(self.dataset.res)
        if self.shuffle:
            random.shuffle(seqs)
        B = self.batch_windows
        if B > 1:
            seqs = seqs[:len(seqs) - (len(seqs) % B)]
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()

        def one(paths):
            return collate_window(self.dataset, paths, self.max_labels,
                                  self.train_time_index, self.cxcywh,
                                  augment=self.augment,
                                  hsv_prob=self.hsv_prob,
                                  flip_prob=self.flip_prob,
                                  img_dtype=self.img_dtype)

        def worker():
            try:
                if B == 1:
                    for paths in seqs:
                        q.put(one(paths))
                else:
                    for i in range(0, len(seqs), B):
                        ws = [one(p) for p in seqs[i:i + B]]
                        q.put({
                            "imgs": np.stack([w["imgs"] for w in ws]),
                            "labels": np.stack([w["labels"] for w in ws]),
                            "time_embedding": np.stack(
                                [w["time_embedding"] for w in ws]),
                            "infos": [w["infos"] for w in ws],
                            "paths": [w["paths"] for w in ws]})
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
