"""Loader for the reference PyTorch package at /root/reference.

Installs minimal stubs for third-party packages the environment lacks
(torchvision, pywt, loguru, pycocotools, thop) and imports the real
`yolox` reference modules so parity tests can run the original torch
video stack (tscd_head / post_trans / tscd_matching /
surrounding_extraction / yolo_pafpn / yolo_head) against this repo.

The stubs are faithful where the models actually call them:
  - torchvision.ops.nms / batched_nms: score-sorted greedy NMS,
    batched via the per-class coordinate-offset trick torchvision uses.
  - torchvision.ops.boxes.box_area: trivial.
  - pywt.Wavelet('haar'): the exact haar filter banks pywt ships.
Everything else raises if touched.
"""

import importlib
import os
import sys
import types

REF = "/root/reference"


def _install_loguru():
    if "loguru" in sys.modules:
        return
    mod = types.ModuleType("loguru")

    class _Logger:
        def _noop(self, *a, **k):
            pass

        info = warning = error = debug = success = trace = _noop

        def catch(self, *a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        def add(self, *a, **k):
            return 0

        def remove(self, *a, **k):
            pass

    mod.logger = _Logger()
    sys.modules["loguru"] = mod


def _install_pywt():
    if "pywt" in sys.modules:
        return
    mod = types.ModuleType("pywt")
    s = 0.7071067811865476

    class Wavelet:
        def __init__(self, name):
            assert name == "haar", f"stub only supports haar, got {name}"
            self.dec_lo = [s, s]
            self.dec_hi = [-s, s]
            self.rec_lo = [s, s]
            self.rec_hi = [s, -s]

    mod.Wavelet = Wavelet
    sys.modules["pywt"] = mod


def _install_torchvision():
    if "torchvision" in sys.modules:
        return
    import torch

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def nms(boxes, scores, iou_threshold):
        """Greedy NMS, score-sorted, matching torchvision semantics."""
        order = torch.argsort(scores, descending=True, stable=True)
        keep = []
        suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
        x1, y1, x2, y2 = boxes.unbind(-1)
        areas = (x2 - x1) * (y2 - y1)
        for idx in order.tolist():
            if suppressed[idx]:
                continue
            keep.append(idx)
            xx1 = torch.maximum(x1[idx], x1)
            yy1 = torch.maximum(y1[idx], y1)
            xx2 = torch.minimum(x2[idx], x2)
            yy2 = torch.minimum(y2[idx], y2)
            w = (xx2 - xx1).clamp(min=0)
            h = (yy2 - yy1).clamp(min=0)
            inter = w * h
            iou = inter / (areas[idx] + areas - inter)
            suppressed |= iou > iou_threshold
        return torch.tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        max_coord = boxes.max()
        offsets = idxs.to(boxes) * (max_coord + torch.tensor(1.0).to(boxes))
        return nms(boxes + offsets[:, None], scores, iou_threshold)

    def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2,
                           reduction="none"):
        p = torch.sigmoid(inputs)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    def roi_align(*a, **k):
        raise NotImplementedError("torchvision stub: roi_align")

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.box_area = box_area
    boxes_mod.nms = nms
    boxes_mod.batched_nms = batched_nms
    ops.nms = nms
    ops.batched_nms = batched_nms
    ops.box_area = box_area
    ops.boxes = boxes_mod
    ops.roi_align = roi_align
    ops.sigmoid_focal_loss = sigmoid_focal_loss
    transforms = types.ModuleType("torchvision.transforms")
    tv.ops = ops
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.transforms"] = transforms


def _install_pycocotools():
    if "pycocotools" in sys.modules:
        return
    pkg = types.ModuleType("pycocotools")
    coco = types.ModuleType("pycocotools.coco")
    cocoeval = types.ModuleType("pycocotools.cocoeval")

    class COCO:
        def __init__(self, *a, **k):
            raise NotImplementedError("pycocotools stub")

    class COCOeval:
        def __init__(self, *a, **k):
            raise NotImplementedError("pycocotools stub")

    coco.COCO = COCO
    cocoeval.COCOeval = COCOeval
    pkg.coco = coco
    pkg.cocoeval = cocoeval
    sys.modules["pycocotools"] = pkg
    sys.modules["pycocotools.coco"] = coco
    sys.modules["pycocotools.cocoeval"] = cocoeval


def _install_thop():
    if "thop" in sys.modules:
        return
    mod = types.ModuleType("thop")

    def profile(*a, **k):
        raise NotImplementedError("thop stub")

    mod.profile = profile
    sys.modules["thop"] = mod


def _install_timm():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _patch_cuda_to_cpu():
    """The reference hard-codes `.to('cuda')` / `.cuda()` in forward paths
    (e.g. post_trans.py:694-695); this environment's torch is CPU-only.
    Remap those to CPU so the original code runs unmodified."""
    import torch
    if getattr(torch, "_graft_cuda_patched", False):
        return
    orig_to = torch.Tensor.to

    def _is_cuda(d):
        return (isinstance(d, str) and d.startswith("cuda")) or \
            (isinstance(d, torch.device) and d.type == "cuda")

    def to(self, *args, **kwargs):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = to
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch._graft_cuda_patched = True


def install_stubs():
    _install_loguru()
    _install_pywt()
    _install_torchvision()
    _install_pycocotools()
    _install_thop()
    _install_timm()
    _patch_cuda_to_cpu()


def load(name):
    """Import a reference module, e.g. load('yolox.models.tscd_head')."""
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return importlib.import_module(name)
