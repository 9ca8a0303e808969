"""remat_backbone: identical forward/gradients, rematerialized backward.

jax.checkpoint over YOLOPAFPN must not change the math — outputs and
parameter gradients of the TSCD train loss match the non-remat model
bitwise-ish; only the backward-pass memory/time trade changes."""

import jax
import jax.numpy as jnp
import numpy as np

from tscd_tpu.models.matching import init_matcher_state
from tscd_tpu.models.tscd import TSCD
from tscd_tpu.ops.position import get_timing_signal_1d


def test_remat_backbone_same_outputs_and_grads():
    L, G, P = 1, 2, 8
    F, H, W = L + G, 64, 64
    kw = dict(num_classes=5, depth=0.33, width=0.125, num_proposals=P,
              heads=2, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)

    base = TSCD(remat_backbone=False, **kw)
    remat = TSCD(remat_backbone=True, **kw)
    variables = base.init(jax.random.PRNGKey(0), x, te, L, G)
    # param trees must interchange
    v2 = remat.init(jax.random.PRNGKey(0), x, te, L, G)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(variables))

    st = init_matcher_state(P, 32, 128, dtype=jnp.float32)

    def loss(m, params):
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      x, te, L, G, False, st)
        return (jnp.sum(out["refined_cls_logits"] ** 2)
                + jnp.sum(out["refined_boxes"] ** 2) * 1e-6)

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(
        variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(
        variables["params"])

    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_stop_backbone_grad_same_updates():
    """With the backbone frozen (optimizer mask), stop_gradient on the
    FPN outputs must not change the updated parameters — it only removes
    the wasted backbone backward (torch skips it via requires_grad=False,
    vid_tscd_large.py:111-143)."""
    import optax

    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.train.losses import tscd_loss
    from tscd_tpu.train.optim import build_sgd

    L, G, P, C, HW = 1, 2, 6, 5, 64
    F = L + G
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, HW, HW, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    labels = np.zeros((F, 6, 5), np.float32)
    labels[:, 0] = [1, 30, 30, 20, 20]
    labels = jnp.asarray(labels)

    kw = dict(num_classes=C, depth=0.33, width=0.125, num_proposals=P,
              heads=2)
    m_plain = TSCD(**kw)
    m_stop = TSCD(**kw, stop_backbone_grad=True)
    variables = m_plain.init(jax.random.PRNGKey(0), x, te, L, G)
    tx = build_sgd(lambda i: 0.01, freeze_prefixes=("backbone",))
    opt_state = tx.init(variables["params"])

    def new_params(model):
        def loss_fn(params):
            out = model.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              x, te, L, G, False)
            return tscd_loss(out, labels, (8, 16, 32), L)["total_loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        updates, _ = tx.update(grads, opt_state, variables["params"])
        return optax.apply_updates(variables["params"], updates), grads

    p1, g1 = jax.jit(lambda: new_params(m_plain))()
    p2, g2 = jax.jit(lambda: new_params(m_stop))()
    # backbone grads: nonzero without the stop, exactly zero with it
    bb1 = float(jnp.abs(jax.tree_util.tree_leaves(
        g1["backbone"])[0]).sum())
    bb2 = sum(float(jnp.abs(l).sum())
              for l in jax.tree_util.tree_leaves(g2["backbone"]))
    assert bb1 > 0 and bb2 == 0.0
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p1),
                              jax.tree_util.tree_leaves_with_path(p2)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5,
            atol=1e-6 * max(float(np.abs(np.asarray(a)).max()), 1.0),
            err_msg=f"param {jax.tree_util.keystr(k)}")
