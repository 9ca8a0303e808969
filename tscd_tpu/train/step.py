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


def make_yolox_train_step(model, tx, strides=(8, 16, 32),
                          use_l1: bool = False,
                          ema_decay: float = 0.9998) -> Callable:
    """Still-image YOLOX train step: (state, images (B,H,W,3),
    labels (B,G,5)) -> (state, metrics)."""

    def step(state: TrainState, images, labels):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, True, False, mutable=["batch_stats"],
                method=lambda mdl, x, t, d: mdl(x, train=t, decode=d))
            losses = yolox_loss(out["outputs"], labels, out["hw"], strides,
                                use_l1=use_l1)
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
