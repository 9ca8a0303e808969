"""Checkpoint save/load (reference: yolox/utils/checkpoint.py).

msgpack-serialized pytrees via flax.serialization (fast, dependency-free);
`load_tolerant` mirrors the reference's shape-mismatch-tolerant
`load_ckpt` (checkpoint.py:11) — essential for the 2-stage recipe of
initializing TSCD from a YOLOX checkpoint. Latest + best copies like
`save_checkpoint` (checkpoint.py:36).
"""

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization, traverse_util


def save_checkpoint(state_dict: Dict[str, Any], save_dir: str,
                    is_best: bool = False, name: str = "latest"):
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{name}_ckpt.msgpack")
    host_state = jax.tree_util.tree_map(np.asarray, state_dict)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host_state))
    if is_best:
        shutil.copyfile(path, os.path.join(save_dir, "best_ckpt.msgpack"))
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def opt_state_to_ckpt(opt_state: Any) -> Dict[str, Any]:
    """Optimizer state (optax NamedTuple chain) -> serializable dict
    (reference saves `optimizer.state_dict()` in every checkpoint,
    yolox/core/trainer.py:355 — momentum must survive a resume)."""
    return serialization.to_state_dict(opt_state)


def restore_opt_state(template: Any, ckpt_entry: Optional[Dict[str, Any]],
                      log=print) -> Any:
    """Restore optimizer state into a freshly-initialized template;
    tolerant like load_tolerant — a structure mismatch (optimizer
    recipe changed between runs) falls back to the fresh init with a
    warning instead of failing the resume."""
    if ckpt_entry is None:
        return template
    try:
        return serialization.from_state_dict(template, ckpt_entry)
    except Exception as e:  # noqa: BLE001 — tolerant by contract
        log(f"optimizer state restore failed ({e!r}); keeping fresh init")
        return template


def load_tolerant(target: Dict[str, Any], ckpt: Dict[str, Any],
                  log=print) -> Dict[str, Any]:
    """Merge ckpt leaves into target, skipping missing keys and shape
    mismatches with a warning (reference load_ckpt, checkpoint.py:11)."""
    flat_t = traverse_util.flatten_dict(target)
    flat_c = traverse_util.flatten_dict(ckpt)
    out = {}
    for k, v in flat_t.items():
        if k not in flat_c:
            log(f"{'/'.join(map(str, k))} not in checkpoint, keeping init")
            out[k] = v
        elif tuple(np.shape(flat_c[k])) != tuple(np.shape(v)):
            log(f"shape mismatch at {'/'.join(map(str, k))}: "
                f"ckpt {np.shape(flat_c[k])} vs model {np.shape(v)}, "
                "keeping init")
            out[k] = v
        else:
            out[k] = np.asarray(flat_c[k]).astype(np.asarray(v).dtype)
    return traverse_util.unflatten_dict(out)
