"""Multi-chip sharded video inference (new TPU capability — the
reference materializes every frame window on ONE GPU, SURVEY.md §2.7/
§5.7; here the frame axis shards across the mesh).

Structure: the per-frame work (backbone + head towers + dense decode +
fixed-slot proposal selection + feature gather) is embarrassingly
parallel over frames -> shard the F axis across the 'data' mesh axis
under one jitted program; GSPMD inserts the all-gather of the tiny
per-proposal features/scores (F*P*(C+4+…) floats, KBs) before the
cross-frame MCA aggregation + matcher, which are replicated. The HBM-
heavy convs never leave their shard; only proposal tensors ride ICI.

Works with any divisor of F = lframe + gframe; the matcher state is
replicated (it is O(P*C), tiny)."""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_tscd_eval(model, mesh: Mesh, lframe: int, gframe: int,
                           num_classes: int,
                           postprocess: bool = True,
                           nms_thresh: float = 0.5,
                           conf_thre: float = 0.001):
    """Returns eval_fn(variables, frames (F,H,W,3), te (F,256), state)
    -> ((refined, original) or head_out, new_state) compiled with the
    frame axis sharded over mesh axis 'data'."""
    from ..models.tscd import tscd_eval_postprocess

    frame_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def fwd(variables, frames, te, state):
        frames = jax.lax.with_sharding_constraint(frames, frame_sharding)
        out = model.apply(variables, frames, te, lframe, gframe, False,
                          state)
        if postprocess:
            refined, original = tscd_eval_postprocess(
                out, lframe, num_classes, nms_thresh=nms_thresh,
                conf_thre=conf_thre)
            return (refined, original), out["matcher_state"]
        return out, out["matcher_state"]

    return jax.jit(
        fwd,
        in_shardings=(rep, frame_sharding, frame_sharding, rep),
        out_shardings=(rep, rep))


def make_sharded_yolox_eval(model, mesh: Mesh, num_classes: int,
                            conf_thre: float = 0.01,
                            nms_thre: float = 0.65, out_k: int = 100):
    """Batch-sharded still-image eval: images shard over 'data', each
    device runs decode + fixed-shape NMS on its shard; outputs stay
    sharded (host gathers lazily on readback)."""
    from ..ops.postprocess import postprocess_dense_batch

    batch_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def fwd(variables, images):
        images = jax.lax.with_sharding_constraint(images, batch_sharding)
        out = model.apply(variables, images, False, True)
        return postprocess_dense_batch(out["decoded"], num_classes,
                                       conf_thre, nms_thre, out_k)

    return jax.jit(fwd, in_shardings=(rep, batch_sharding),
                   out_shardings=batch_sharding)
