"""Tensor parallelism (model-axis param sharding) on the virtual
8-device mesh.

parallel/tensor_parallel.py shards wide output-channel dims over the
`model` mesh axis (Megatron pattern via GSPMD annotations). These tests
assert (a) the sharding rule, (b) a TP eval forward equals the
single-device forward while params are actually channel-partitioned,
and (c) one DP x TP train step on a (2, 4) mesh equals the
single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tscd_tpu.models.tscd import TSCD
from tscd_tpu.ops.position import get_timing_signal_1d
from tscd_tpu.parallel.mesh import make_mesh
from tscd_tpu.parallel.tensor_parallel import (jit_tp_eval, jit_tp_step,
                                               shard_params_tp, tp_spec,
                                               tp_shardings)
from tscd_tpu.train.losses import tscd_loss
from tscd_tpu.train.optim import build_sgd
from tscd_tpu.train.step import TrainState, init_train_state

C, HW = 5, 64


def test_tp_spec_rule():
    assert tp_spec((3, 3, 16, 128), 4) == P(None, None, None, "model")
    assert tp_spec((256, 128), 4) == P(None, "model")      # dense
    assert tp_spec((128,), 4) == P()                       # BN vector
    assert tp_spec((3, 3, 16, 60), 4) == P()               # 60 % 4 != 0... divisible, but < 64
    assert tp_spec((3, 3, 16, 64), 4, min_out=64) == P(
        None, None, None, "model")
    assert tp_spec((3, 3, 16, 66), 4) == P()               # not divisible
    assert tp_spec((3, 3, 16, 128), 1) == P()              # 1-way = off


def _tiny_model_and_data(B=None):
    Lf, Gf = 1, 1
    Ff, NP = Lf + Gf, 6
    m = TSCD(num_classes=C, depth=0.33, width=0.25, num_proposals=NP,
             heads=2)
    rng = np.random.default_rng(0)
    if B is None:
        x = jnp.asarray(rng.uniform(0, 255, (Ff, HW, HW, 3)), jnp.float32)
        te = jnp.asarray(get_timing_signal_1d(np.arange(Ff), 256),
                         jnp.float32)
    else:
        x = jnp.asarray(rng.uniform(0, 255, (B, Ff, HW, HW, 3)),
                        jnp.float32)
        te = jnp.broadcast_to(
            jnp.asarray(get_timing_signal_1d(np.arange(Ff), 256),
                        jnp.float32), (B, Ff, 256))
    return m, x, te, Lf, Gf


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_eval_forward_matches_single_device():
    """TSCD eval forward with params sharded 8-way over `model` (data
    axis size 1 = pure tensor parallelism) equals the single-device
    forward, and wide conv kernels really are channel-partitioned."""
    m, x, te, Lf, Gf = _tiny_model_and_data()
    variables = m.init(jax.random.PRNGKey(0), x, te, Lf, Gf)

    def fwd(variables, x, te):
        out = m.apply(variables, x, te, Lf, Gf, False)
        return out["refined_cls_logits"], out["decoded"]

    ref = jax.jit(fwd)(variables, x, te)

    MIN = 16  # tiny test model: let its widest (>=16ch) kernels shard
    mesh = make_mesh(num_data=1, num_model=8)
    var_tp = shard_params_tp(variables, mesh, min_out=MIN)
    tp_fwd = jit_tp_eval(fwd, var_tp, mesh, min_out=MIN, num_data_args=2)
    got = tp_fwd(var_tp, x, te)

    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)

    sharded = [
        p for p in jax.tree_util.tree_leaves(var_tp["params"])
        if hasattr(p, "sharding") and p.sharding.spec != P()]
    assert sharded, "no param leaf was model-sharded"
    for p in sharded[:3]:
        shard_shape = p.addressable_shards[0].data.shape
        assert shard_shape[-1] == p.shape[-1] // 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_tp_train_step_matches_single_device():
    """One TSCD train step on a (data=2, model=4) mesh — batch sharded
    over `data`, params/momenta/EMA sharded over `model` — equals the
    single-device step to fp32 reduction tolerance."""
    B = 4
    strides = (8, 16, 32)
    m, x, te, Lf, Gf = _tiny_model_and_data(B=B)
    labels = np.zeros((B, Lf + Gf, 6, 5), np.float32)
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

    ref_state, ref_loss = jax.jit(step_fn)(
        jax.tree_util.tree_map(jnp.copy, state), x, labels, te)

    MIN = 16
    mesh = make_mesh(num_data=2, num_model=4)
    state_t = shard_params_tp(
        jax.tree_util.tree_map(jnp.copy, state), mesh, min_out=MIN)
    dp = NamedSharding(mesh, P("data"))
    put = lambda t: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, dp), t)
    tstep = jit_tp_step(step_fn, state_t, mesh, min_out=MIN,
                        num_data_args=3)
    new_state, loss_t = tstep(state_t, put(x), put(labels), put(te))

    np.testing.assert_allclose(float(loss_t), float(ref_loss), rtol=1e-5)

    sharded = [
        p for p in jax.tree_util.tree_leaves(new_state.params)
        if hasattr(p, "sharding") and p.sharding.spec != P()]
    assert sharded, "no updated param leaf kept the model sharding"

    for (k1, p1), (k8, p8) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(new_state.params)):
        scale = max(float(np.abs(np.asarray(p1)).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(p8), np.asarray(p1), rtol=1e-4,
            atol=max(1e-4 * scale, 1e-7),
            err_msg=f"param {jax.tree_util.keystr(k1)}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_shardings_cover_full_state():
    """tp_shardings maps every TrainState leaf (incl. nested optax
    wrapper states) to a NamedSharding."""
    m, x, te, Lf, Gf = _tiny_model_and_data()
    variables = m.init(jax.random.PRNGKey(0), x, te, Lf, Gf)
    tx = build_sgd(lambda i: 0.01)
    state = init_train_state(variables, tx)
    mesh = make_mesh(num_data=2, num_model=4)
    sh = tp_shardings(state, mesh)
    n_state = len(jax.tree_util.tree_leaves(state))
    n_sh = len(jax.tree_util.tree_leaves(
        sh, is_leaf=lambda s: isinstance(s, NamedSharding)))
    assert n_state == n_sh
