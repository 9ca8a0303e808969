"""Multi-host / cross-process helpers (reference: yolox/utils/dist.py
rank helpers + pickled gloo gather :195-233, yolox/core/launch.py
rendezvous, yolox/utils/allreduce_norm.py:97).

TPU-native mapping: jax.distributed.initialize replaces
init_process_group; multihost_utils.process_allgather replaces the
pickled gloo all_gather; BN-stat cross-replica averaging is a pytree
pmean over the data axis (or free under a sharded jit)."""

from typing import Any, List, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces launch.py:101-147). No-op for a
    single process."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (reference dist.py:195 all_gather over the gloo side-group). Uses
    multihost_utils over a length-prefixed uint8 buffer."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))
    max_size = int(np.max(sizes))
    buf = np.zeros(max_size, np.uint8)
    buf[:payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)
    return [pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
            for i in range(jax.process_count())]


def gather_objects(obj: Any, dst: int = 0) -> List[Any]:
    """(reference dist.py:233) — all processes pay the allgather; only
    dst keeps the result."""
    out = all_gather_objects(obj)
    return out if jax.process_index() == dst else []


def sync_batch_stats(batch_stats, mesh=None):
    """Cross-replica mean of BN running stats before eval (reference
    allreduce_norm.py:97). Under a DP mesh where each replica holds
    identical replicated stats this is a no-op; use it when stats were
    updated per-shard (e.g. per-process prefetch pipelines)."""
    if jax.process_count() == 1 and (mesh is None or mesh.size == 1):
        return batch_stats
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        lambda a: multihost_utils.process_allgather(np.asarray(a)).mean(0),
        batch_stats)
