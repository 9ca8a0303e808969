"""FSDP (ZeRO-3-style state sharding) on the virtual 8-device mesh.

The reference scales only by DDP (replicated params); parallel/fsdp.py
shards params + optimizer momenta + EMA over the data axis via GSPMD
annotations. These tests assert (a) the sharding rule itself, (b) the
FSDP step is numerically the DP step (same math, collectives inserted
by the partitioner), and (c) the state really is partitioned on device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tscd_tpu.models.tscd import TSCD
from tscd_tpu.ops.position import get_timing_signal_1d
from tscd_tpu.parallel.fsdp import (fsdp_spec, fsdp_shardings,
                                    jit_fsdp_step, shard_train_state)
from tscd_tpu.parallel.mesh import make_mesh
from tscd_tpu.train.losses import tscd_loss
from tscd_tpu.train.optim import build_sgd
from tscd_tpu.train.step import TrainState, init_train_state

C, HW = 5, 64


def test_fsdp_spec_rule():
    assert fsdp_spec((4,), 8) == P()                     # too small
    assert fsdp_spec((3, 3, 16, 64), 8, min_size=1) == P(
        None, None, None, "data")                        # largest div dim
    assert fsdp_spec((3, 3, 24, 20), 8, min_size=1) == P(
        None, None, "data", None)                        # 24 % 8 == 0
    assert fsdp_spec((3, 5, 7), 8, min_size=1) == P()    # nothing divides
    assert fsdp_spec((128, 128), 1) == P()               # 1-device mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fsdp_train_step_matches_single_device():
    """One batched TSCD train step: single-device vs FSDP-sharded state
    on the 8-device mesh — loss and post-update params equal to fp32
    reduction tolerance, and the sharded state is actually partitioned."""
    Lf, Gf = 1, 1
    Ff, B, NP = Lf + Gf, 8, 6
    strides = (8, 16, 32)
    m = TSCD(num_classes=C, depth=0.33, width=0.125, num_proposals=NP,
             heads=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (B, Ff, HW, HW, 3)), jnp.float32)
    te = jnp.broadcast_to(
        jnp.asarray(get_timing_signal_1d(np.arange(Ff), 256), jnp.float32),
        (B, Ff, 256))
    labels = np.zeros((B, Ff, 6, 5), np.float32)
    labels[:, :, 0] = [1, 30, 30, 20, 20]
    labels[:, :, 1] = [3, 48, 16, 16, 12]
    labels = jnp.asarray(labels)
    variables = m.init(jax.random.PRNGKey(0), x[0], te[0], Lf, Gf)
    tx = build_sgd(lambda i: 0.01, freeze_prefixes=("backbone",))
    state = init_train_state(variables, tx)

    def step_fn(state, xb, lb, tb):
        def loss_fn(params):
            def one(xw, lw, tw):
                out, mut = m.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    xw, tw, Lf, Gf, True, mutable=["batch_stats"])
                return (tscd_loss(out, lw, strides, Lf)["total_loss"],
                        mut["batch_stats"])

            total, bs = jax.vmap(one)(xb, lb, tb)
            return total.mean(), jax.tree_util.tree_map(
                lambda a: a.mean(0), bs)

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            ema_params=state.ema_params,
            ema_batch_stats=state.ema_batch_stats,
            step=state.step + 1)
        return new_state, loss

    # single device reference
    ref_state, ref_loss = jax.jit(step_fn)(
        jax.tree_util.tree_map(jnp.copy, state), x, labels, te)

    # FSDP over the 8-device mesh (min_size lowered so the tiny test
    # model's conv kernels actually shard)
    MIN = 2 ** 8
    mesh = make_mesh(num_data=8)
    state_f = shard_train_state(
        jax.tree_util.tree_map(jnp.copy, state), mesh, min_size=MIN)
    dp = NamedSharding(mesh, P("data"))
    put = lambda t: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, dp), t)
    fstep = jit_fsdp_step(step_fn, state_f, mesh, min_size=MIN,
                          num_data_args=3)
    new_state, loss_f = fstep(state_f, put(x), put(labels), put(te))

    np.testing.assert_allclose(float(loss_f), float(ref_loss), rtol=1e-5)

    # params really partitioned: at least one large leaf has non-trivial
    # sharding and its per-device shard is smaller than the global shape
    sharded_leaves = [
        p for p in jax.tree_util.tree_leaves(new_state.params)
        if hasattr(p, "sharding") and p.sharding.spec != P()
        and int(np.prod(p.shape)) >= MIN]
    assert sharded_leaves, "no param leaf was sharded"
    for p in sharded_leaves[:3]:
        shard_shape = p.addressable_shards[0].data.shape
        assert int(np.prod(shard_shape)) < int(np.prod(p.shape))
    # momenta follow the same layout
    mom_sharded = [
        p for p in jax.tree_util.tree_leaves(new_state.opt_state)
        if hasattr(p, "sharding") and getattr(p, "ndim", 0) >= 2
        and p.sharding.spec != P()]
    assert mom_sharded, "no optimizer momentum leaf was sharded"

    # numerics match the single-device step
    for (k1, p1), (k8, p8) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(new_state.params)):
        scale = max(float(np.abs(np.asarray(p1)).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(p8), np.asarray(p1), rtol=1e-4,
            atol=max(1e-4 * scale, 1e-7),
            err_msg=f"param {jax.tree_util.keystr(k1)}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fsdp_shardings_cover_full_state():
    """fsdp_shardings maps every TrainState leaf (incl. nested optax
    wrapper states) to a NamedSharding without error."""
    m = TSCD(num_classes=C, depth=0.33, width=0.125, num_proposals=4,
             heads=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, HW, HW, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(2), 256), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, te, 1, 1)
    tx = build_sgd(lambda i: 0.01)
    state = init_train_state(variables, tx)
    mesh = make_mesh(num_data=8)
    sh = fsdp_shardings(state, mesh)
    n_state = len(jax.tree_util.tree_leaves(state))
    n_sh = len(jax.tree_util.tree_leaves(
        sh, is_leaf=lambda s: isinstance(s, NamedSharding)))
    assert n_state == n_sh
