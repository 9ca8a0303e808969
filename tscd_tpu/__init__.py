"""tscd_tpu — TPU-native video object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Video-Object-Detection/TSCD (YOLOX + YOLOV + TSCD spatiotemporal
context-aware decoupling), designed TPU-first:

- NHWC tensor layout, bfloat16 compute, fp32 params/BN stats.
- Static shapes everywhere: fixed proposal count P with validity masks
  replaces the reference's ragged per-frame NMS survivors.
- SimOTA, NMS, Hungarian matching all run on-device with no host syncs.
- Data parallelism via jax.sharding.Mesh + pjit; BN is sync-BN by
  construction (global-batch reductions under jit).
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS request even when a site plugin
# (e.g. a remote-TPU sitecustomize) pins its own platform priority
# before user code runs: the env var is jax's documented selector, and
# every CLI under tools/ relies on it for host-only / CI runs. No-op
# when unset or once the backend is already initialized.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms",
                           _os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass

# Persistent XLA compile cache for every consumer of the framework
# (CLIs, tests, notebooks). bench.py/__graft_entry__ enabled it
# locally; the eval/train CLIs did not, which cost a full recompile of
# e.g. a width-1.0 eval program (~5-10 min on this host) per process.
# Opt out with TSCD_NO_COMPILE_CACHE=1; an explicit
# JAX_COMPILATION_CACHE_DIR env var wins.
if not _os.environ.get("TSCD_NO_COMPILE_CACHE"):
    import jax as _jax2

    try:
        _jax2.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.expanduser("~/.cache/jax_comp_cache")))
    except RuntimeError:
        pass
