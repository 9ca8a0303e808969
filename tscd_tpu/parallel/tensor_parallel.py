"""Tensor parallelism (TP): wide param dims sharded over the `model`
mesh axis.

The reference scales only by data parallelism (DDP over NCCL,
yolox/core/launch.py); its single-GPU model must fit one device. On
TPU the same GSPMD recipe that gives DP/FSDP also gives tensor
parallelism: shard each wide layer's OUTPUT-channel dim over the
`model` axis and let the partitioner propagate channel-sharded
activations and insert the (all-reduce / all-gather) collectives on
ICI — the Megatron pattern, derived from annotations instead of
hand-written collectives. Convs keep their HW tiles intact (only the
channel dim shards), so per-chip HBM for weights AND activations drops
with the model axis — this is the axis that lets a model or activation
footprint larger than one chip's HBM run at all.

Composes with the `data` axis: a (data, model) mesh runs DP x TP in
one jitted program (see jit_tp_step / tests/test_tensor_parallel.py),
and with parallel/fsdp.py's state sharding on the data axis.

No reference counterpart (TPU-native extension). The model code is
unchanged — only operand placement differs.
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec(shape, n: int, min_out: int = 64) -> P:
    """PartitionSpec sharding a param's output-feature dim over `model`.

    Rule: rank >= 2 leaves whose LAST dim (conv cout / dense out) is
    divisible by `n` and at least `min_out` shard that dim; everything
    else (biases, BN vectors, scalars, narrow heads like the cls/reg
    prediction convs) replicates. Small vectors are cheaper to
    replicate than to gather, and GSPMD slices replicated BN vectors
    against channel-sharded activations on the fly.
    """
    ndim = len(shape)
    if n <= 1 or ndim < 2:
        return P()
    out = shape[-1]
    if out % n != 0 or out < min_out:
        return P()
    spec = [None] * ndim
    spec[-1] = "model"
    return P(*spec)


def tp_shardings(tree: Any, mesh: Mesh, min_out: int = 64):
    """A pytree of NamedShardings applying `tp_spec` to every leaf.

    Works on params alone or on a full TrainState: optimizer momenta
    and the EMA copy mirror param shapes, so the same rule shards them
    identically and the updated state keeps one consistent layout.
    """
    n = mesh.shape["model"]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, tp_spec(shape, n, min_out))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def shard_params_tp(tree: Any, mesh: Mesh, min_out: int = 64) -> Any:
    """Place params (or a full TrainState) onto the mesh with TP
    shardings."""
    sh = tp_shardings(tree, mesh, min_out)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)


def jit_tp_eval(eval_fn, variables: Any, mesh: Mesh,
                min_out: int = 64, num_data_args: int = 1):
    """jit `eval_fn(variables, *batch) -> out` with variables pinned to
    TP shardings and batch operands sharded along `data` (size-1 data
    axis = pure model parallelism for single-stream latency / fitting
    a model that exceeds one chip's HBM). Outputs replicate."""
    var_sh = tp_shardings(variables, mesh, min_out)
    data_sh = NamedSharding(mesh, P("data"))
    in_sh = (var_sh,) + (data_sh,) * num_data_args
    return jax.jit(eval_fn, in_shardings=in_sh)


def jit_tp_step(step_fn, state: Any, mesh: Mesh,
                min_out: int = 64,
                num_data_args: Optional[int] = None):
    """jit `step_fn(state, *batch) -> (state, metrics)` as DP x TP:
    state pinned to TP shardings on both sides (the updated state keeps
    the model-sharded layout), batch operands sharded along `data`,
    state donated so HBM stays flat. Grad all-reduce over `data` and
    the TP activation collectives over `model` both fall out of
    GSPMD."""
    state_sh = tp_shardings(state, mesh, min_out)
    if num_data_args is None:
        return jax.jit(step_fn, donate_argnums=(0,),
                       out_shardings=(state_sh, None))
    data_sh = NamedSharding(mesh, P("data"))
    in_sh = (state_sh,) + (data_sh,) * num_data_args
    return jax.jit(step_fn, donate_argnums=(0,), in_shardings=in_sh,
                   out_shardings=(state_sh, None))
