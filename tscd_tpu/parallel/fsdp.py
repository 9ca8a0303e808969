"""FSDP / ZeRO-3-style sharding of train state over the mesh.

The reference scales only by DDP (replicated params, NCCL all-reduce —
yolox/core/launch.py). On TPU the same mesh that provides data
parallelism can also shard the *state* — params, optimizer momenta and
the EMA copy — so per-chip HBM for state drops ~linearly with the data
axis and XLA inserts the all-gather (params, before use) and
reduce-scatter (grads) collectives from sharding annotations alone.
That is the standard GSPMD FSDP recipe: pick a mesh, annotate leaf
shardings, let the partitioner place collectives on ICI.

No reference counterpart (TPU-native extension); the jitted step
functions in train/step.py are used unchanged — only operand placement
differs.
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape, n: int, min_size: int = 2 ** 14) -> P:
    """PartitionSpec sharding the largest n-divisible dim of `shape`.

    Leaves smaller than `min_size` elements (biases, BN scales, scalars)
    stay replicated — sharding them costs more in collective latency
    than it saves in HBM.
    """
    if n <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def fsdp_shardings(tree: Any, mesh: Mesh, min_size: int = 2 ** 14):
    """A pytree of NamedShardings matching `tree`'s leaves.

    Works on the full TrainState: optimizer momenta and EMA leaves
    mirror param shapes so the same rule shards them identically
    (ZeRO-3: every state copy partitioned); scalars and small leaves
    replicate.
    """
    n = mesh.shape["data"]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, fsdp_spec(shape, n, min_size))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def shard_train_state(state: Any, mesh: Mesh,
                      min_size: int = 2 ** 14) -> Any:
    """Place a (host or single-device) TrainState onto the mesh with
    FSDP shardings. Use together with `mesh.shard_batch` for the data
    operands; jit the step with `jit_fsdp_step` so the updated state
    keeps the same layout."""
    sh = fsdp_shardings(state, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def jit_fsdp_step(step_fn, state: Any, mesh: Mesh,
                  min_size: int = 2 ** 14,
                  num_data_args: Optional[int] = None):
    """jit `step_fn(state, *batch) -> (state, metrics)` with the state
    pinned to FSDP shardings on both sides (out_shardings keeps the
    updated state partitioned instead of letting the partitioner
    replicate it back), batch operands sharded along `data`, and the
    state buffer donated so HBM stays flat."""
    state_sh = fsdp_shardings(state, mesh, min_size)
    if num_data_args is None:
        # batch shardings propagate from operand placement (shard_batch)
        return jax.jit(step_fn, donate_argnums=(0,),
                       out_shardings=(state_sh, None))
    data_sh = NamedSharding(mesh, P("data"))
    in_sh = (state_sh,) + (data_sh,) * num_data_args
    return jax.jit(step_fn, donate_argnums=(0,), in_shardings=in_sh,
                   out_shardings=(state_sh, None))
