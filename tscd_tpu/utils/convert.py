"""PyTorch checkpoint -> flax variables conversion.

Lets users bring the reference's pretrained .pth checkpoints
(YOLOX model zoo, TSCD-Large) into this framework. Layout transforms:
  Conv2d weight OIHW -> HWIO kernel; Linear weight (out,in) -> (in,out);
  BatchNorm weight/bias -> bn scale/bias (params) and running
  mean/var -> batch_stats.

Name translation mirrors the module correspondence documented in each
model file (reference names on the left):
  backbone.backbone.dark2.0 -> backbone/backbone/dark2_conv
  backbone.backbone.dark2.1 -> backbone/backbone/dark2_csp
  <csp>.m.0               -> <csp>/m_0
  head.stems.0            -> head/stem_0
  head.cls_convs.0.1      -> head/cls_conv_0_1
  head.cls_preds.0        -> head/cls_pred_0
"""

import re
from typing import Any, Dict, Tuple

import numpy as np
from flax import traverse_util


def _translate_backbone(parts):
    """Translate CSPDarknet/PAFPN segment names."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("dark2", "dark3", "dark4", "dark5"):
            idx = parts[i + 1]
            if p == "dark5":
                sub = {"0": "conv", "1": "spp", "2": "csp"}[idx]
            else:
                sub = {"0": "conv", "1": "csp"}[idx]
            out.append(f"{p}_{sub}")
            i += 2
        elif p == "m" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"m_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def _translate_head(parts):
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("stems", "cls_preds", "reg_preds", "obj_preds"):
            k = parts[i + 1]
            base = {"stems": "stem", "cls_preds": "cls_pred",
                    "reg_preds": "reg_pred", "obj_preds": "obj_pred"}[p]
            out.append(f"{base}_{k}")
            i += 2
        elif p in ("cls_convs", "reg_convs", "cls_convs2", "reg_convs2"):
            k, j = parts[i + 1], parts[i + 2]
            base = {"cls_convs": "cls_conv", "reg_convs": "reg_conv",
                    "cls_convs2": "cls_conv2",
                    "reg_convs2": "reg_conv2"}[p]
            out.append(f"{base}_{k}_{j}")
            i += 3
        elif p == "edge_enhance_reg":
            k = parts[i + 1]
            out.append(f"edge_{k}")
            # skip the Sequential index (always 0)
            i += 3 if i + 2 < len(parts) and parts[i + 2] == "0" else 2
        elif p == "filter1" or p == "filter2":
            out.append(p)
            # skip Sequential conv index
            if i + 1 < len(parts) and parts[i + 1] == "0":
                i += 2
            else:
                i += 1
        else:
            out.append(p)
            i += 1
    return out


def torch_to_flax(state_dict: Dict[str, np.ndarray]
                  ) -> Dict[str, Dict]:
    """torch state_dict (tensor or ndarray values) ->
    {'params': ..., 'batch_stats': ...} nested dicts."""
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, val in state_dict.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = name.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        leaf = parts[-1]
        parts = parts[:-1]
        parts = _translate_backbone(parts)
        parts = _translate_head(parts)

        is_bn = parts and parts[-1] == "bn"
        if is_bn:
            if leaf == "weight":
                params[tuple(parts) + ("scale",)] = arr
            elif leaf == "bias":
                params[tuple(parts) + ("bias",)] = arr
            elif leaf == "running_mean":
                stats[tuple(parts) + ("mean",)] = arr
            elif leaf == "running_var":
                stats[tuple(parts) + ("var",)] = arr
            continue
        if leaf == "weight":
            if arr.ndim == 4:          # conv OIHW -> HWIO
                params[tuple(parts) + ("kernel",)] = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:        # linear (out,in) -> (in,out)
                params[tuple(parts) + ("kernel",)] = arr.T
            else:                      # layernorm weight
                params[tuple(parts) + ("scale",)] = arr
        elif leaf == "bias":
            params[tuple(parts) + ("bias",)] = arr
        else:
            params[tuple(parts) + (leaf,)] = arr
    return {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth checkpoint's model state_dict as numpy arrays
    (CPU, weights_only for safety)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    return {k: v.cpu().numpy() for k, v in sd.items()}
