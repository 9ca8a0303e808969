"""Model introspection + inference-time transforms (reference:
yolox/utils/model_utils.py — get_model_info:23 thop FLOPs,
fuse_conv_and_bn:34/fuse_model:79, freeze_module:130, adjust_status:159).

TPU notes: FLOPs come from XLA's own cost analysis of the jitted forward
(exact for the compiled program, unlike thop's per-module estimate);
conv+BN folding rewrites the param tree so eval uses a single conv —
XLA fuses BN anyway, so folding is for param-count/export parity.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def count_params(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def get_model_info(model, variables, input_shape: Tuple[int, ...],
                   **apply_kwargs) -> str:
    """'Params: X.XXM, GFLOPs: Y.YY' for one forward at input_shape
    (reference get_model_info:23)."""
    n_params = count_params(variables.get("params", variables))

    def fwd(x):
        return model.apply(variables, x, **apply_kwargs)

    x = jnp.zeros(input_shape, jnp.float32)
    try:
        analysis = jax.jit(fwd).lower(x).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
    except Exception:
        flops = float("nan")
    return (f"Params: {n_params / 1e6:.2f}M, "
            f"GFLOPs: {flops / 1e9:.2f}")


def fuse_conv_bn_params(params: Dict, batch_stats: Dict,
                        eps: float = 1e-5) -> Dict:
    """Fold every `{conv: {kernel}, bn: {scale,bias}}` sibling pair
    (reference fuse_conv_and_bn:34 — the BaseConv fuseforward deploy
    path): the kernel absorbs gamma/std and the BN reduces to a pure
    bias add (scale=1, bias=beta - mean*gamma/std) — pair with
    `fused_batch_stats` (mean=0, var=1) so the param tree structure is
    unchanged and XLA folds the remaining add into the conv."""
    flat_p = dict(traverse_util.flatten_dict(params))
    flat_s = dict(traverse_util.flatten_dict(batch_stats))
    out = dict(flat_p)
    for path in list(flat_p):
        if path[-2:] != ("conv", "kernel"):
            continue
        parent = path[:-2]
        bn_scale = parent + ("bn", "scale")
        bn_bias = parent + ("bn", "bias")
        bn_mean = parent + ("bn", "mean")
        bn_var = parent + ("bn", "var")
        if bn_scale not in flat_p or bn_mean not in flat_s:
            continue
        k = np.asarray(flat_p[path], np.float32)          # HWIO
        gamma = np.asarray(flat_p[bn_scale], np.float32)
        beta = np.asarray(flat_p[bn_bias], np.float32)
        mean = np.asarray(flat_s[bn_mean], np.float32)
        var = np.asarray(flat_s[bn_var], np.float32)
        std = np.sqrt(var + eps)
        out[path] = k * (gamma / std)[None, None, None, :]
        out[bn_scale] = np.ones_like(gamma)
        out[bn_bias] = beta - mean * gamma / std
    return traverse_util.unflatten_dict(out)


def fused_batch_stats(batch_stats: Dict) -> Dict:
    """Identity running stats to pair with fuse_conv_bn_params."""
    flat = dict(traverse_util.flatten_dict(batch_stats))
    out = {}
    for path, v in flat.items():
        v = np.asarray(v)
        out[path] = (np.zeros_like(v) if path[-1] == "mean"
                     else np.ones_like(v))
    return traverse_util.unflatten_dict(out)


def freeze_tree(params, prefixes) -> Dict:
    """Map param path -> 'frozen'|'trainable' labels (reference
    freeze_module:130; used with optax.multi_transform — see
    tscd_tpu.train.optim)."""
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict({
        k: ("frozen" if any("/".join(map(str, k)).startswith(p)
                            for p in prefixes) else "trainable")
        for k in flat})
