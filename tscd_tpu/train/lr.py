"""LR schedules (reference: yolox/utils/lr_scheduler.py:9).

Implemented as pure functions iter -> lr so they can live inside the
jitted train step (the schedule is evaluated on device from the step
counter; no per-iter host work).
"""

import math
from typing import Callable

import jax.numpy as jnp


def yolox_warm_cos_lr(lr: float, min_lr_ratio: float, total_iters: int,
                      warmup_iters: int, warmup_lr_start: float,
                      no_aug_iters: int) -> Callable:
    """Quadratic warmup -> cosine -> min-lr floor during the no-aug tail
    (lr_scheduler.py:121-148)."""
    min_lr = lr * min_lr_ratio
    cos_iters = max(total_iters - warmup_iters - no_aug_iters, 1)

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = (lr - warmup_lr_start) * jnp.power(
            it / max(warmup_iters, 1), 2.0) + warmup_lr_start
        progress = jnp.clip((it - warmup_iters) / cos_iters, 0.0, 1.0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(
            math.pi * progress))
        out = jnp.where(it < warmup_iters, warm, cos)
        out = jnp.where(it >= total_iters - no_aug_iters, min_lr, out)
        return out

    return schedule


def cos_lr(lr: float, total_iters: int) -> Callable:
    def schedule(it):
        return lr * 0.5 * (1.0 + jnp.cos(
            math.pi * jnp.asarray(it, jnp.float32) / total_iters))
    return schedule


def warm_cos_lr(lr: float, total_iters: int, warmup_iters: int,
                warmup_lr_start: float = 1e-6) -> Callable:
    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = (lr - warmup_lr_start) * it / max(warmup_iters, 1) \
            + warmup_lr_start
        cos = lr * 0.5 * (1.0 + jnp.cos(
            math.pi * (it - warmup_iters) / (total_iters - warmup_iters)))
        return jnp.where(it < warmup_iters, warm, cos)
    return schedule


def multistep_lr(lr: float, milestones, gamma: float = 0.1) -> Callable:
    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        k = sum((it >= m).astype(jnp.float32) for m in milestones)
        return lr * jnp.power(gamma, k)
    return schedule
