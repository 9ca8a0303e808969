"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP stack
(yolox/core/launch.py, yolox/utils/dist.py): one jitted SPMD program over
a jax.sharding.Mesh. Data parallelism = batch-axis sharding; gradient
all-reduce, BN-stat sync and eval gathers are XLA collectives inserted
automatically from the sharding annotations — no rendezvous or process
groups to manage (jax.distributed.initialize handles multi-host).

Axes:
  data  — batch / frame-window axis (DP). Maps to ICI within a slice.
  model — reserved for tensor-parallel sharding of the widest convs /
          attention heads (TP); size 1 by default.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    dev_array = np.asarray(devices[:num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / frame) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays with a shardable leading dim)
    onto the mesh, sharded along `data`."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), batch)
