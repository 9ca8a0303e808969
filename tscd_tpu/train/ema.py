"""Model EMA (reference: yolox/utils/ema.py:22).

decay(t) = d * (1 - exp(-t / 2000)), applied to params AND batch stats
(the reference EMAs the full state_dict). Pure-tree update inside the
jitted train step.
"""

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(tree: Any) -> Any:
    # real copies, not aliases: the train step donates the whole state, and
    # donating params and ema_params that share a buffer is an error
    return jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), tree)


def ema_update(ema_tree: Any, new_tree: Any, updates: jax.Array,
               decay: float = 0.9998) -> Any:
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))

    def upd(e, n):
        n = n.astype(e.dtype)
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + n * (1.0 - d)
        return n

    return jax.tree_util.tree_map(upd, ema_tree, new_tree)
