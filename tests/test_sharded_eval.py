"""Multi-device tests on the virtual 8-device CPU mesh: frame-sharded
TSCD eval matches single-device output; batch-sharded YOLOX eval runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.models.matching import init_matcher_state
from tscd_tpu.models.tscd import TSCD
from tscd_tpu.models.yolox import YOLOX
from tscd_tpu.ops.position import get_timing_signal_1d
from tscd_tpu.parallel.mesh import make_mesh
from tscd_tpu.parallel.sharded_eval import (make_sharded_tscd_eval,
                                            make_sharded_yolox_eval)

C, P, HW = 5, 8, 64
L, G = 2, 6
F = L + G


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_frame_sharded_tscd_matches_single_device():
    mesh = make_mesh(num_data=8)
    m = TSCD(num_classes=C, depth=0.33, width=0.125, num_proposals=P,
             heads=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, HW, HW, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, te, L, G)
    st = init_matcher_state(P, int(256 * 0.125), 4 * int(256 * 0.125))

    sharded = make_sharded_tscd_eval(m, mesh, L, G, C)
    (refined_s, original_s), new_st = sharded(vars_, x, te, st)

    out = m.apply(vars_, x, te, L, G, False, st)
    from tscd_tpu.models.tscd import tscd_eval_postprocess
    refined_r, original_r = tscd_eval_postprocess(out, L, C)

    np.testing.assert_allclose(np.asarray(refined_s.boxes),
                               np.asarray(refined_r.boxes),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(refined_s.cls_id),
                                  np.asarray(refined_r.cls_id))
    np.testing.assert_allclose(np.asarray(new_st.out),
                               np.asarray(out["matcher_state"].out),
                               atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batch_sharded_yolox_eval_runs():
    mesh = make_mesh(num_data=8)
    m = YOLOX(num_classes=C, depth=0.33, width=0.125)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (8, HW, HW, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, False, True)
    fwd = make_sharded_yolox_eval(m, mesh, C, conf_thre=0.0)
    dets = fwd(vars_, x)
    assert dets.boxes.shape[0] == 8
    assert np.isfinite(np.asarray(dets.boxes)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_train_step_multi_device_matches_single():
    """DDP semantics (reference tscd_trainer.py:231): one TSCD train step
    over 8 windows computed (a) on one device and (b) data-sharded over
    the 8-device mesh must produce the same gradients (pre-update) and
    parameters (post-update) to fp32 tolerance — the sharded program is
    the same math with GSPMD-inserted all-reduces."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as Pt

    from tscd_tpu.train.ema import ema_update
    from tscd_tpu.train.losses import tscd_loss
    from tscd_tpu.train.optim import build_sgd
    from tscd_tpu.train.step import TrainState, init_train_state

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

    def grads_fn(state, xb, lb, tb):
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

        (loss, bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return loss, grads, bs

    def step_fn(state, xb, lb, tb):
        loss, grads, new_bs = grads_fn(state, xb, lb, tb)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return params, loss

    # single device
    loss1, grads1, _ = jax.jit(grads_fn)(state, x, labels, te)
    params1, _ = jax.jit(step_fn)(state, x, labels, te)

    # 8-device DP: batch axis sharded, state replicated
    mesh = make_mesh(num_data=8)
    dp = NamedSharding(mesh, Pt("data"))
    rep = NamedSharding(mesh, Pt())
    put = lambda t, s: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, s), t)
    state_r = put(state, rep)
    loss8, grads8, _ = jax.jit(grads_fn)(
        state_r, put(x, dp), put(labels, dp), put(te, dp))
    params8, _ = jax.jit(step_fn)(
        state_r, put(x, dp), put(labels, dp), put(te, dp))

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    # tolerance is scaled per tensor: conv-grad reductions sum tens of
    # thousands of near-cancelling fp32 terms, so elementwise error is
    # bounded by a fraction of the tensor's grad magnitude, not an
    # absolute constant
    for (p1, g1), (p8, g8) in zip(
            jax.tree_util.tree_leaves_with_path(grads1),
            jax.tree_util.tree_leaves_with_path(grads8)):
        scale = max(float(np.abs(np.asarray(g1)).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(g8), np.asarray(g1), rtol=2e-3,
            atol=2e-3 * scale,
            err_msg=f"grad {jax.tree_util.keystr(p1)}")
    for (k1, p1), (k8, p8) in zip(
            jax.tree_util.tree_leaves_with_path(params1),
            jax.tree_util.tree_leaves_with_path(params8)):
        scale = max(float(np.abs(np.asarray(p1)).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(p8), np.asarray(p1), rtol=1e-4,
            atol=max(1e-4 * scale, 1e-7),
            err_msg=f"param {jax.tree_util.keystr(k1)}")
