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
