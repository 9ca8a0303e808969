"""Jitted train/eval step builders.

One compiled XLA program per step: forward + SimOTA + losses + backward +
SGD + EMA. Under a sharded mesh the gradient all-reduce and sync-BN fall
out of the sharding annotations (batch axis sharded, params replicated).
"""

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import freeze, unfreeze

from ..parallel.mesh import data_sharding, replicated
from .ema import ema_init, ema_update
from .losses import tscd_loss, yolox_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    step: jax.Array


def init_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    return TrainState(
        params=params, batch_stats=bs, opt_state=tx.init(params),
        ema_params=ema_init(params), ema_batch_stats=ema_init(bs),
        step=jnp.zeros((), jnp.int32))


def scan_accum_value_and_grad(chunk_loss_fn, params, batch, accum: int):
    """Gradient accumulation inside ONE jitted step.

    Splits each array in `batch` (a tuple with a common leading batch
    axis divisible by `accum`) into `accum` chunks, runs
    `jax.value_and_grad(chunk_loss_fn)` over them under a `lax.scan`,
    and returns the chunk-MEAN `(grads, aux)`. `chunk_loss_fn(params,
    *chunk) -> (total_loss, aux)` must itself return chunk means
    (losses, BN stats). Peak activation memory scales with batch/accum
    (only one chunk's forward+backward is live at a time).

    Exactness: when the loss decomposes per batch element (the TSCD
    trainer's per-window vmap, or fix_bn eval-mode BN) the result is
    EXACTLY the full-batch step (tests/test_trainer_mesh.py pins it).
    With train-mode BN (still-image stage 1) BN normalizes per CHUNK —
    the standard grad-accumulation/DDP-per-GPU semantics, same as the
    reference's per-GPU BN batch; the mechanics (mean of per-chunk
    grads/stats) are pinned against a hand-rolled oracle in
    tests/test_e2e_still.py. No reference analog for the knob itself —
    the reference's per-GPU batch is memory-bound (yolox_base.py:183)."""
    grad_fn = jax.value_and_grad(chunk_loss_fn, has_aux=True)

    def split(a):
        return a.reshape((accum, a.shape[0] // accum) + a.shape[1:])

    chunks = jax.tree_util.tree_map(split, batch)
    first = jax.tree_util.tree_map(lambda a: a[0], chunks)
    (_, aux_sh), g_sh = jax.eval_shape(grad_fn, params, *first)

    def zeros(t):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), t)

    def body(carry, chunk):
        g_sum, aux_sum = carry
        (_, aux), g = grad_fn(params, *chunk)
        return (jax.tree_util.tree_map(jnp.add, g_sum, g),
                jax.tree_util.tree_map(jnp.add, aux_sum, aux)), None

    (g_sum, aux_sum), _ = jax.lax.scan(
        body, (zeros(g_sh), zeros(aux_sh)), chunks)
    inv = 1.0 / accum
    mean = lambda t: jax.tree_util.tree_map(lambda a: a * inv, t)  # noqa: E731
    return mean(g_sum), mean(aux_sum)


def make_yolox_train_step(model, tx, strides=(8, 16, 32),
                          use_l1: bool = False,
                          ema_decay: float = 0.9998,
                          grad_accum: int = 1) -> Callable:
    """Still-image YOLOX train step: (state, images (B,H,W,3),
    labels (B,G,5)) -> (state, metrics). grad_accum > 1 scans the batch
    in chunks inside the same program (see scan_accum_value_and_grad)."""

    def step(state: TrainState, images, labels):
        def loss_fn(params, images, labels):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, True, False, mutable=["batch_stats"],
                method=lambda mdl, x, t, d: mdl(x, train=t, decode=d))
            losses = yolox_loss(out["outputs"], labels, out["hw"], strides,
                                use_l1=use_l1)
            return losses["total_loss"], (losses, mut["batch_stats"])

        if grad_accum > 1:
            grads, (losses, new_bs) = scan_accum_value_and_grad(
                loss_fn, state.params, (images, labels), grad_accum)
        else:
            (_, (losses, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, images, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_state = TrainState(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, new_step,
                                  ema_decay),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                       new_step, ema_decay),
            step=new_step)
        return new_state, losses

    return step


def make_tscd_train_step(model, tx, lframe: int, gframe: int,
                         strides=(8, 16, 32),
                         ema_decay: float = 0.9998,
                         ota_mode: bool = True) -> Callable:
    """Video train step over one (lframe+gframe) window:
    (state, frames (F,H,W,3), labels (F,G,5), time_emb (F,256))
    -> (state, metrics). Matcher state resets each window (the reference
    trainer always passes resume=False, tscd_trainer.py:166)."""

    def step(state: TrainState, frames, labels, time_emb):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                frames, time_emb, lframe, gframe, True,
                labels=labels, mutable=["batch_stats"])
            losses = tscd_loss(out, labels, strides, lframe,
                               ota_mode=ota_mode)
            return losses["total_loss"], (losses, mut["batch_stats"])

        (_, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_state = TrainState(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, new_step,
                                  ema_decay),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                       new_step, ema_decay),
            step=new_step)
        return new_state, losses

    return step


def jit_sharded_step(step_fn, mesh=None):
    """jit a step; shardings propagate from operand placement (put the
    state with `replicated(mesh)` and batches with `shard_batch`), and
    GSPMD inserts the gradient all-reduce / global BN means. Donates the
    state buffer to keep HBM flat."""
    return jax.jit(step_fn, donate_argnums=(0,))
