"""On-demand native builds (reference: yolox/layers/jit_ops.py JitOp —
torch cpp_extension + ninja there; plain g++ + ctypes here).

Sources compile once into a per-source-hash cached .so under
~/.cache/tscd_tpu (or $TSCD_TPU_CACHE); concurrent builds are serialized
with an exclusive lock file (the reference used wait_for_the_master,
jit_ops.py:85-87)."""

import ctypes
import fcntl
import hashlib
import os
import subprocess
from typing import Optional

_CACHE = os.environ.get(
    "TSCD_TPU_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "tscd_tpu"))


def build_library(src_path: str, name: str,
                  extra_flags=()) -> Optional[str]:
    with open(src_path) as f:
        src = f.read()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    os.makedirs(_CACHE, exist_ok=True)
    out = os.path.join(_CACHE, f"lib{name}-{tag}.so")
    if os.path.exists(out):
        return out
    lock = os.path.join(_CACHE, f".{name}.lock")
    with open(lock, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        if os.path.exists(out):
            return out
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               *extra_flags, src_path, "-o", out + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
        os.replace(out + ".tmp", out)
    return out


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen tscd_tpu/native/<name>.cpp. Returns
    None when no toolchain is available — callers fall back to numpy."""
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"{name}.cpp")
    if not os.path.exists(src):
        return None
    path = build_library(src, name)
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None
