"""Profiling / tracing hooks (SURVEY §5.1 — the reference has only manual
wall-clock meters; the TPU build adds real tracing).

`trace(dir)` wraps jax.profiler tracing (view in XProf/TensorBoard);
`annotate(name)` marks named regions in the trace; `device_timer`
reproduces the reference's time_synchronized accounting
(yolox/utils/dist.py:290) with an explicit readback barrier — on the
axon-tunneled TPU a tiny host readback is the only reliable sync."""

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in profiler traces (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)


def sync(x=None) -> None:
    """Execution barrier: block until `x` (or a trivial op) is done."""
    if x is None:
        x = jnp.zeros(())
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


class device_timer:
    """with device_timer() as t: ...; t.ms — device-synchronized timing
    (reference time_synchronized)."""

    def __init__(self, result=None):
        self.result = result
        self.ms = 0.0

    def __enter__(self):
        sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        sync(self.result)
        self.ms = (time.perf_counter() - self._t0) * 1000.0
        return False
