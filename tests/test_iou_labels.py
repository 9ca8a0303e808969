"""ota_mode=False (IoU-based refined label) semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tscd_tpu.train.losses import iou_based_refined_targets, tscd_loss


def test_fg_bg_ignore_buckets_and_reg_target():
    props = jnp.asarray([[10, 10, 50, 50],      # IoU 1.0 -> fg
                         [200, 200, 240, 240],  # IoU 0   -> bg
                         [10, 10, 50, 33]],     # IoU ~0.57 -> ignore
                        jnp.float32)
    gt = jnp.asarray([[30, 30, 40, 40]], jnp.float32)   # cxcywh
    fg, ignore, cls_t, reg_t = iou_based_refined_targets(
        props, jnp.ones(3, bool), gt, jnp.asarray([2]),
        jnp.ones(1, bool), 5)
    assert list(np.asarray(fg)) == [True, False, False]
    assert list(np.asarray(ignore)) == [False, False, True]
    assert float(cls_t[0, 2]) > 0.99 and float(cls_t[1].sum()) == 0
    # reg target is the best-IoU gt box, not an anchor gather
    np.testing.assert_allclose(np.asarray(reg_t[0]), [30, 30, 40, 40])


def test_invalid_proposals_and_gts_excluded():
    props = jnp.asarray([[10, 10, 50, 50], [10, 10, 50, 50]], jnp.float32)
    gt = jnp.asarray([[30, 30, 40, 40], [30, 30, 40, 40]], jnp.float32)
    fg, ignore, cls_t, _ = iou_based_refined_targets(
        props, jnp.asarray([True, False]), gt, jnp.asarray([1, 3]),
        jnp.asarray([True, False]), 5)
    assert bool(fg[0]) and not bool(fg[1])       # invalid slot never fg
    assert float(cls_t[0, 1]) > 0.99             # matched the VALID gt


def test_tscd_loss_ota_false_runs_and_differs():
    rng = np.random.default_rng(0)
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d
    m = TSCD(num_classes=5, depth=0.33, width=0.125, num_proposals=8,
             heads=2)
    x = jnp.asarray(rng.uniform(0, 255, (4, 64, 64, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(4), 256))
    v = m.init(jax.random.PRNGKey(0), x, te, 1, 3)
    labels = np.zeros((4, 6, 5), np.float32)
    labels[:, 0] = [1, 30, 30, 20, 20]
    out = m.apply(v, x, te, 1, 3)
    l_ota = tscd_loss(out, jnp.asarray(labels), (8, 16, 32), 1,
                      ota_mode=True)
    l_iou = tscd_loss(out, jnp.asarray(labels), (8, 16, 32), 1,
                      ota_mode=False)
    for l in (l_ota, l_iou):
        for k, val in l.items():
            assert np.isfinite(float(val)), k
    # base detector losses identical regardless of refined-label mode
    # (at random init neither mode finds fg proposals, so the refined
    # terms may coincide — the bucket tests above pin the semantics)
    assert np.isclose(float(l_ota["iou_loss"]), float(l_iou["iou_loss"]))
