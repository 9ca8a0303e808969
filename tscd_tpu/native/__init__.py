"""Native (C++) components, built on demand with g++ and bound via
ctypes (the reference uses pybind11 torch extensions + ninja,
yolox/layers/jit_ops.py; this build is torch-free)."""

from .jit_build import load_library

__all__ = ["load_library"]
