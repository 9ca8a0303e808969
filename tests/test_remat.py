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
