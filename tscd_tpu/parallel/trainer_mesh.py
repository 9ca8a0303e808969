"""Trainer-facing mesh wiring: exp knobs -> device mesh -> jitted step.

This is the PRODUCT path for multi-chip training — the TPU-native
equivalent of the reference's in-trainer DDP launch
(yolox/core/launch.py:39 spawns one process per GPU and wraps the model
in DDP at yolox/core/tscd_trainer.py:231). Here the trainer stays ONE
program: it reads three exp knobs

    mesh_data   (int)  — data-parallel axis size; -1 = all devices/model
    mesh_model  (int)  — tensor-parallel axis size (DP x TP when > 1)
    fsdp        (bool) — shard state (params/momenta/EMA) over `data`

builds a jax.sharding.Mesh, places the TrainState, and jits its existing
step function with the matching in/out shardings; the gradient
all-reduce, sync-BN mean, FSDP all-gather/reduce-scatter and TP
activation collectives all fall out of GSPMD. The sharding rules
themselves live in parallel/fsdp.py / parallel/tensor_parallel.py and
are reused unchanged.
"""

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .fsdp import fsdp_shardings, jit_fsdp_step
from .mesh import make_mesh
from .tensor_parallel import jit_tp_step, tp_shardings


def mesh_from_exp(exp) -> Optional[Mesh]:
    """Build the trainer mesh from exp knobs; None = single-device path
    (the default: mesh_data=1, mesh_model=1 leaves every existing config
    exactly as before)."""
    num_model = int(getattr(exp, "mesh_model", 1) or 1)
    num_data = int(getattr(exp, "mesh_data", 1) or 1)
    if num_data == -1:
        num_data = max(len(jax.devices()) // num_model, 1)
    if num_data * num_model <= 1:
        return None
    have = len(jax.devices())
    assert num_data * num_model <= have, (
        f"mesh_data({num_data}) x mesh_model({num_model}) needs "
        f"{num_data * num_model} devices, have {have}")
    return make_mesh(num_data=num_data, num_model=num_model)


def _state_shardings(state: Any, mesh: Mesh, fsdp: bool):
    if mesh.shape.get("model", 1) > 1:
        return tp_shardings(state, mesh)
    if fsdp:
        return fsdp_shardings(state, mesh)
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: rep, state)


def place_state(state: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Put a host/single-device TrainState onto the mesh with the layout
    the jitted step expects (replicated for plain DP, sharded for
    FSDP/TP)."""
    sh = _state_shardings(state, mesh, fsdp)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def jit_trainer_step(step_fn, state: Any, mesh: Optional[Mesh],
                     fsdp: bool = False, num_data_args: int = 3):
    """jit `step_fn(state, *batch) -> (state, metrics)` for the trainer.

    mesh=None -> the unchanged single-device jit (donated state).
    Otherwise batch operands shard along `data`, and the state layout is
    chosen by the knobs: TP when the mesh has a model axis, FSDP when
    fsdp=True, replicated plain-DP otherwise.
    """
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    if mesh.shape.get("model", 1) > 1:
        return jit_tp_step(step_fn, state, mesh,
                           num_data_args=num_data_args)
    if fsdp:
        return jit_fsdp_step(step_fn, state, mesh,
                             num_data_args=num_data_args)
    state_sh = _state_shardings(state, mesh, False)
    data_sh = NamedSharding(mesh, P("data"))
    in_sh = (state_sh,) + (data_sh,) * num_data_args
    return jax.jit(step_fn, donate_argnums=(0,), in_shardings=in_sh,
                   out_shardings=(state_sh, None))
