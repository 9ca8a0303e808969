"""End-to-end shape/finite tests for the TSCD video stack on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.models.matching import (MatcherState, RegMatcher, TaskAligned,
                                      init_matcher_state, dual_match_cost)
from tscd_tpu.models.tscd import TSCD, tscd_eval_postprocess
from tscd_tpu.models.tscd_head import (decode_reg_offsets, encode_reg_targets,
                                       select_frame_proposals)
from tscd_tpu.ops.position import get_timing_signal_1d
from tscd_tpu.ops.wavelets import haar_dwt2d, haar_idwt2d
from tscd_tpu.train.losses import tscd_loss

L, G, P, C = 2, 3, 8, 5
F = L + G
HW = 64


def test_haar_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    ll, lh, hl, hh = haar_dwt2d(x)
    y = haar_idwt2d(ll, lh, hl, hh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_encode_decode_offsets_roundtrip():
    rng = np.random.default_rng(1)
    still = np.stack([rng.uniform(0, 50, 10), rng.uniform(0, 50, 10),
                      rng.uniform(60, 100, 10), rng.uniform(60, 100, 10)], -1)
    gt = np.stack([rng.uniform(20, 80, 10), rng.uniform(20, 80, 10),
                   rng.uniform(5, 40, 10), rng.uniform(5, 40, 10)], -1)
    enc = encode_reg_targets(jnp.asarray(gt, jnp.float32),
                             jnp.asarray(still, jnp.float32))
    dec = decode_reg_offsets(enc, jnp.asarray(still, jnp.float32))
    # decoded xyxy must equal gt cxcywh converted
    gt_xyxy = np.stack([gt[:, 0] - gt[:, 2] / 2, gt[:, 1] - gt[:, 3] / 2,
                        gt[:, 0] + gt[:, 2] / 2, gt[:, 1] + gt[:, 3] / 2], -1)
    np.testing.assert_allclose(np.asarray(dec), gt_xyxy, rtol=1e-4, atol=1e-3)


def test_select_frame_proposals_shapes():
    rng = np.random.default_rng(2)
    dec = rng.uniform(0, 1, (F, 40, 5 + 3)).astype(np.float32)
    dec[..., :4] = rng.uniform(10, 50, (F, 40, 4))
    props = select_frame_proposals(jnp.asarray(dec), 3, P, 0.001, 0.75,
                                   False, P)
    assert props.boxes.shape == (F, P, 4)
    assert props.valid.shape == (F, P)
    assert bool(props.valid.all())  # minimal_limit = P tops everything up


def test_matcher_statefulness():
    rng = np.random.default_rng(3)
    matcher = RegMatcher(num_heads=2, num_layers=1)
    feats = jnp.asarray(rng.normal(size=(L, P, 16)), jnp.float32)
    regs = jnp.asarray(rng.normal(size=(L, P, 32)), jnp.float32)
    clss = jnp.asarray(rng.normal(size=(L, P, 32)), jnp.float32)
    edges = jnp.asarray(rng.normal(size=(L, P, 16)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(L), 256))
    valid = jnp.ones((L, P), bool)
    st = init_matcher_state(P, 16, 32)
    vars_ = matcher.init(jax.random.PRNGKey(0), feats, regs, clss, edges,
                         te, valid, st)
    out1, st1 = matcher.apply(vars_, feats, regs, clss, edges, te, valid, st)
    assert out1.shape == (L, P, 16)
    assert bool(st1.has_state)
    # resuming with state changes the output of the first frame
    out2, _ = matcher.apply(vars_, feats, regs, clss, edges, te, valid, st1)
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))
    assert np.isfinite(np.asarray(out1)).all()


def test_dual_match_cost_identity():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    c = dual_match_cost(x, x, x, x)
    np.testing.assert_allclose(np.asarray(jnp.diag(c)), 0.0, atol=1e-5)


@pytest.fixture(scope="module")
def tscd_setup():
    m = TSCD(num_classes=C, depth=0.33, width=0.125, num_proposals=P,
             heads=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (F, HW, HW, 3)),
                    jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256))
    vars_ = m.init(jax.random.PRNGKey(0), x, te, L, G)
    return m, x, te, vars_


def test_tscd_forward_shapes(tscd_setup):
    m, x, te, vars_ = tscd_setup
    out = m.apply(vars_, x, te, L, G)
    A = (HW // 8) ** 2 + (HW // 16) ** 2 + (HW // 32) ** 2
    assert out["raw_outputs"].shape == (F, A, 5 + C)
    assert out["refined_cls_logits"].shape == (L, P, C)
    assert out["matcher_obj_logits"].shape == (L, P)
    assert out["matcher_reg_offsets"].shape == (L, P, 4)
    assert out["refined_boxes"].shape == (L, P, 4)
    assert np.isfinite(np.asarray(out["refined_boxes"])).all()
    refined, original = tscd_eval_postprocess(out, L, C, out_k=10)
    assert refined.boxes.shape == (L, 10, 4)
    # original keeps best-class rows only -> at most P slots
    # (post_process.py:69-81; parity-tested in test_torch_parity_video)
    assert original.mask.shape == (L, min(10, P))


def test_tscd_loss_and_grads(tscd_setup):
    m, x, te, vars_ = tscd_setup
    labels = np.zeros((F, 6, 5), np.float32)
    for f in range(F):
        labels[f, 0] = [1, 30, 30, 20, 20]
        labels[f, 1] = [3, 48, 16, 16, 12]

    def loss_fn(params):
        out, _ = m.apply({"params": params,
                          "batch_stats": vars_["batch_stats"]},
                         x, te, L, G, True, mutable=["batch_stats"])
        l = tscd_loss(out, jnp.asarray(labels), (8, 16, 32), L)
        return l["total_loss"], l

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        vars_["params"])
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(b ** 2)), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_tscd_localagg_branch():
    """agg_type='localagg' (the head config the reference constructs at
    tscd_head.py:91-96 but whose forward is dead code upstream — see the
    branch comment in tscd_tpu/models/tscd_head.py): forward shapes,
    eval postprocess, loss and grads must all work."""
    m = TSCD(num_classes=C, depth=0.33, width=0.125, num_proposals=P,
             heads=2, agg_type="localagg")
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 255,
                                                     (F, HW, HW, 3)),
                    jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256))
    vars_ = m.init(jax.random.PRNGKey(0), x, te, L, G)
    out = m.apply(vars_, x, te, L, G)
    assert out["refined_cls_logits"].shape == (L, P, C)
    assert out["matcher_obj_logits"].shape == (L, P)
    assert out["refined_boxes"].shape == (L, P, 4)
    refined, _ = tscd_eval_postprocess(out, L, C, out_k=10)
    assert refined.boxes.shape == (L, 10, 4)

    labels = np.zeros((F, 6, 5), np.float32)
    labels[:, 0] = [1, 30, 30, 20, 20]

    def loss_fn(params):
        o, _ = m.apply({"params": params,
                        "batch_stats": vars_["batch_stats"]},
                       x, te, L, G, True, mutable=["batch_stats"])
        l = tscd_loss(o, jnp.asarray(labels), (8, 16, 32), L)
        return l["total_loss"], l

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        vars_["params"])
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(b ** 2)), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
