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


# reference modules with no counterpart in the rebuild: the matcher's
# self-attention/FFN layers are constructed but never called in its
# forward (tscd_matching.py:761-888 uses only the aware-cross layers),
# and edge_feature_embedding only fires when edge dim != hidden dim
# (:734-735), never true for WaveletsHFBlock outputs.
_DROP_SEGMENTS = (
    "transformer_self_attention_layers",
    "transformer_ffn_layers",
    "edge_feature_embedding",
)

_QKV_NAMES = ("q_cls_local", "kv_cls", "q_reg_local", "kv_reg",
              "qkv_cls", "qkv_reg")


def _translate_video(parts):
    """Translate TSCD video-stack segment names (aggregation + matcher +
    task-aligned; reference tscd_matching.py / post_trans.py)."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "mca" and i + 1 < len(parts) and parts[i + 1] in _QKV_NAMES:
            # Attention_mca_g2l's projections live on the repo's
            # DualBranchAttention child named 'attn'
            out.extend(["mca", "attn"])
            i += 1
        elif p == "transformer_aware_cross_attention_layers":
            out.append(f"layer_{parts[i + 1]}")
            i += 2
        elif p == "transformer_cross_attention_layers":
            # TaskAligned: layer j -> attn_j (+ norm_j handled below)
            j = parts[i + 1]
            rest = parts[i + 2:]
            if rest and rest[0] == "multihead_attn":
                out.append(f"attn_{j}")
                i += 3
            elif rest and rest[0] == "norm":
                out.append(f"norm_{j}")
                i += 3
            else:
                out.append(f"layer_{j}")
                i += 2
        elif p == "multihead_attn" or p == "self_attn":
            out.append("attn")
            i += 1
        elif p == "transBlocks":
            # LocalAggregation blocks (post_trans.py:972)
            out.append(f"block_{parts[i + 1]}")
            i += 2
        elif p == "net" and i + 1 < len(parts) and parts[i + 1] in ("0", "3"):
            # FFN Sequential(Linear, GELU, Dropout, Linear, Dropout)
            out.append("fc1" if parts[i + 1] == "0" else "fc2")
            i += 2
        elif p == "fc" and i + 1 < len(parts) and parts[i + 1] in ("0", "2"):
            # SEModule Sequential(Linear, ReLU, Linear) -> fc1/fc2
            out.append("fc1" if parts[i + 1] == "0" else "fc2")
            i += 2
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
        if any(seg in parts for seg in _DROP_SEGMENTS):
            continue
        leaf = parts[-1]
        parts = parts[:-1]
        parts = _translate_backbone(parts)
        parts = _translate_head(parts)
        parts = _translate_video(parts)

        # PositionMHAttention.position_embedding and SelfAttentionLocal's
        # loc2feature are 1x1 Conv2d over the 64-dim relative-geometry
        # embedding (tscd_matching.py:27, post_trans.py:86); the rebuild
        # applies them as a Dense on the last axis
        if (leaf == "weight" and arr.ndim == 4 and parts
                and parts[-1] in ("position_embedding", "loc2feature")):
            params[tuple(parts) + ("kernel",)] = arr[:, :, 0, 0].T
            continue

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


# --------------------------------------------------------------------------
# Alternate-backbone converters (Swin / FocalNet / ResNet), mirroring the
# reference modules swin_transfomer.py:457, focal.py:336, resnet.py:11.
# Shared leaf layout rules with torch_to_flax; names are rewritten to
# this repo's module paths (models/swin.py, focalnet.py, resnet.py).


def _swin_parts(p):
    """torch swin name parts (sans leaf) -> flax path, or None to drop."""
    if p[0] == "patch_embed":
        return ["patch_embed"] if p[1] == "proj" else ["patch_norm"]
    if p[0].startswith("norm") and p[0][4:].isdigit():
        # per-out-index feature norms (swin_transfomer.py:557-560)
        return [f"out_norm{p[0][4:]}"]
    if p[0] != "layers":
        return None
    stage = int(p[1])
    if p[2] == "blocks":
        base = [f"layer{stage}_block{int(p[3])}"]
        rest = p[4:]
        if not rest:
            return None
        if rest[0] in ("norm1", "norm2"):
            return base + [rest[0]]
        if rest[0] == "attn":
            if rest[1:] == ["relative_position_index"]:
                return None                      # recomputed at trace time
            return base + ["attn"] + rest[1:]
        if rest[0] == "mlp":
            return base + [f"mlp_{rest[1]}"]
        return None
    if p[2] == "downsample":
        return [f"merge{stage}", "norm" if p[3] == "norm" else "reduction"]
    return None


def _focalnet_parts(p):
    if p[0] == "patch_embed":
        return ["patch_embed"] if p[1] == "proj" else ["patch_norm"]
    if p[0].startswith("norm") and p[0][4:].isdigit():
        return [f"out_norm{p[0][4:]}"]
    if p[0] != "layers":
        return None
    stage = int(p[1])
    if p[2] == "blocks":
        base = [f"layer{stage}_block{int(p[3])}"]
        rest = p[4:]
        if not rest:                             # gamma_1 / gamma_2 leaf
            return base
        if rest[0] in ("norm1", "norm2"):
            return base + [rest[0]]
        if rest[0] == "modulation":
            sub = rest[1:]
            if sub and sub[0] == "focal_layers":
                # Sequential(conv, GELU) -> focal_conv_{l}
                return base + ["modulation", f"focal_conv_{int(sub[1])}"]
            return base + ["modulation"] + sub
        if rest[0] == "mlp":
            return base + [f"mlp_{rest[1]}"]
        return None
    if p[2] == "downsample":
        return [f"down{stage}" if p[3] == "proj" else f"down_norm{stage}"]
    return None


def _resnet_parts(p):
    if p[0] == "stem":
        return ["stem"] + p[1:]
    m = re.fullmatch(r"layer(\d+)", p[0])
    if not m:
        return None
    base = [f"layer{m.group(1)}_{int(p[1])}"]
    rest = p[2:]
    if rest[0] == "downsample":
        # Sequential(conv, bn) -> BaseConv(act="id") submodules
        return base + ["downsample", "conv" if rest[1] == "0" else "bn"]
    return base + rest                            # ConvBnK.{conv,bn}


def _elan_inner(rest):
    """Shared inner-module renames for the ELAN family."""
    out = []
    i = 0
    while i < len(rest):
        r = rest[i]
        if r == "bottlenecks":
            out.append(f"bottleneck_{int(rest[i + 1])}")
            i += 2
        elif r in ("rbr_dense", "rbr_1x1"):
            # Sequential(conv, bn) -> conv kernel on the module name,
            # bn params on <name>_bn
            out.append(r if rest[i + 1] == "0" else f"{r}_bn")
            i += 2
        elif r == "rbr_identity":
            out.append("rbr_identity_bn")
            i += 1
        elif r == "maxpool" or r == "mp":
            i += 1                                  # paramless
        else:
            out.append(r)
            i += 1
    return out


def _elan_stage_module(arch, stage_i, j, n_stages):
    """blocks.{i}.{j} -> our stage module name, None if paramless."""
    if arch == "tiny":
        seq = (["elan"] if stage_i == 0 else ["mp", "elan"])
        if stage_i == n_stages - 1:
            seq = seq + ["spp"]
    else:
        seq = ["down", "elan"]
        if stage_i == n_stages - 1:
            seq = seq + ["spp"]
    kind = seq[j]
    if kind == "mp":
        return None
    return f"stage{stage_i}_{kind}"


def _make_elan_parts(arch):
    n_stages = len(_ELAN_STAGES[arch])

    def parts(p):
        if p[0] == "stem":
            if p[1] == "conv":                      # W6-family Focus
                return ["stem", "conv"] + _elan_inner(p[2:])
            return [f"stem_{int(p[1])}"] + _elan_inner(p[2:])
        if p[0] == "blocks":
            stage_i, j = int(p[1]), int(p[2])
            mod = _elan_stage_module(arch, stage_i, j, n_stages)
            if mod is None:
                return None
            return [mod] + _elan_inner(p[3:])
        # FPN / FPNP6 top-level names map 1:1 except repconvs
        if p[0] == "repconvs":
            return [f"repconv_{int(p[1])}"] + _elan_inner(p[2:])
        return [p[0]] + _elan_inner(p[1:])

    return parts


# stage counts per arch (ch table minus the stem row)
_ELAN_STAGES = {k: [None] * (5 if k in ("tiny", "L", "X") else 6)
                for k in ("tiny", "L", "X", "W6", "E6", "D6", "E6E")}
for _k in _ELAN_STAGES:
    _ELAN_STAGES[_k] = _ELAN_STAGES[_k][1:]        # 4 (P5) or 5 (P6)


_BACKBONE_PART_FNS = {
    "swin": _swin_parts,
    "focalnet": _focalnet_parts,
    "resnet": _resnet_parts,
    "elan-tiny": _make_elan_parts("tiny"),
    "elan-L": _make_elan_parts("L"),
    "elan-X": _make_elan_parts("X"),
    "elan-W6": _make_elan_parts("W6"),
    "elan-E6": _make_elan_parts("E6"),
    "elan-D6": _make_elan_parts("D6"),
    "elan-E6E": _make_elan_parts("E6E"),
}


def backbone_to_flax(state_dict: Dict[str, np.ndarray], family: str,
                     prefix: Tuple[str, ...] = ()) -> Dict[str, Dict]:
    """torch backbone state_dict -> {'params','batch_stats'} for the
    matching tscd_tpu.models module. `prefix` nests the result (e.g.
    ("backbone",) when converting a full YOLOPAFPN_* wrapper)."""
    part_fn = _BACKBONE_PART_FNS[family]
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, val in state_dict.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        p = name.split(".")
        leaf = p[-1]
        if leaf == "num_batches_tracked":
            continue
        parts = part_fn(p[:-1])
        if parts is None:
            continue
        key = prefix + tuple(parts)
        if parts[-1] == "bn" or parts[-1].endswith("_bn"):
            if leaf == "weight":
                params[key + ("scale",)] = arr
            elif leaf == "bias":
                params[key + ("bias",)] = arr
            elif leaf == "running_mean":
                stats[key + ("mean",)] = arr
            elif leaf == "running_var":
                stats[key + ("var",)] = arr
            continue
        if leaf == "weight":
            if arr.ndim == 4:
                params[key + ("kernel",)] = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                params[key + ("kernel",)] = arr.T
            else:
                params[key + ("scale",)] = arr
        elif leaf == "bias":
            params[key + ("bias",)] = arr
        else:   # gamma_1/gamma_2, relative_position_bias_table, ...
            params[key + (leaf,)] = arr
    return {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }
