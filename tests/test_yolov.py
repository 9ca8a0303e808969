"""Shape/finite/grad tests for the YOLOV family heads on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.models.yolov import (YOLOV, YOLOVOnline, YOLOVPlus,
                                   yolov_eval_postprocess)
from tscd_tpu.models.yolov_heads import (LocalAggregation, bank_push,
                                         init_online_bank)
from tscd_tpu.ops.position import get_timing_signal_1d
from tscd_tpu.train.losses import yolov_loss

C, P, HW = 5, 8, 64
G = 4


def _labels(F):
    labels = np.zeros((F, 6, 5), np.float32)
    for f in range(F):
        labels[f, 0] = [1, 30, 30, 20, 20]
        labels[f, 1] = [3, 48, 16, 16, 12]
    return jnp.asarray(labels)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 255, (G, HW, HW, 3)), jnp.float32)


def test_yolov_forward_and_loss(frames):
    m = YOLOV(num_classes=C, depth=0.33, width=0.125, num_proposals=P,
              heads=2, reconf=True)
    vars_ = m.init(jax.random.PRNGKey(0), frames, 0, G)
    out = m.apply(vars_, frames, 0, G)
    assert out["refined_cls_logits"].shape == (G, P, C)
    assert out["refined_obj_logits"].shape == (G, P)
    refined, original = yolov_eval_postprocess(out, G, C, out_k=10)
    assert refined.boxes.shape == (G, 10, 4)

    def loss_fn(params):
        o, _ = m.apply({"params": params,
                        "batch_stats": vars_["batch_stats"]},
                       frames, 0, G, True, mutable=["batch_stats"])
        l = yolov_loss(o, _labels(G), (8, 16, 32), G)
        return l["total_loss"], l

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(vars_["params"])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gn = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(b ** 2)), grads, 0.0)
    assert np.isfinite(gn) and gn > 0


@pytest.mark.parametrize("agg_type", ["mca", "msa", "localagg"])
def test_yolov_plus_agg_types(frames, agg_type):
    m = YOLOVPlus(num_classes=C, depth=0.33, width=0.125,
                  num_proposals=P, heads=2, agg_type=agg_type)
    te = jnp.asarray(get_timing_signal_1d(np.arange(G), 256))
    L = 2
    vars_ = m.init(jax.random.PRNGKey(0), frames, L, G - L, te)
    out = m.apply(vars_, frames, L, G - L, te)
    assert out["refined_cls_logits"].shape == (L, P, C)
    assert np.isfinite(np.asarray(out["refined_cls_logits"])).all()
    if agg_type != "msa" or m.reconf:
        assert out["refined_obj_logits"].shape == (L, P)


def test_yolov_online_streaming(frames):
    """Reference gating (yolov_msa_online.py:281-283 + post_process.py:
    194): the bank participates from the 3rd frame; the local msa bank
    fills from the first frame where the trans ran (frame index 2)."""
    m = YOLOVOnline(num_classes=C, depth=0.33, width=0.125,
                    num_proposals=P, heads=2)
    hidden = int(256 * 0.125)
    bank = init_online_bank(3 * P, hidden)
    x0 = frames[:1]
    vars_ = m.init(jax.random.PRNGKey(0), x0, bank)
    out1 = m.apply(vars_, x0, bank)
    assert out1["refined_cls_logits"].shape == (1, P, C)
    bank1 = out1["bank"]
    assert int(bank1.ptr) == P and int(bank1.frames) == 1
    # pre-NMS may leave fewer than P survivors; at least one slot is real
    assert bool(bank1.valid[:P].any())
    assert not bool(out1["use_refined"])

    out2 = m.apply(vars_, frames[1:2], bank1)
    bank2 = out2["bank"]
    assert not bool(out2["use_refined"])     # still < 2 banked frames
    assert not bool(bank2.l_valid.any())     # msa bank not yet fed

    out3 = m.apply(vars_, frames[2:3], bank2)
    bank3 = out3["bank"]
    assert bool(out3["use_refined"])
    assert bool(bank3.l_valid[:P].any())     # trans ran -> msa banked
    # with the bank gated ON, logits differ from a fresh-bank run
    out3_fresh = m.apply(vars_, frames[2:3], bank)
    assert not np.allclose(np.asarray(out3["refined_cls_logits"]),
                           np.asarray(out3_fresh["refined_cls_logits"]))
    # 4th frame: local_agg memory merge is active and changes outputs
    out4 = m.apply(vars_, frames[3:4], bank3)
    no_local = bank3._replace(l_valid=jnp.zeros_like(bank3.l_valid))
    out4_nl = m.apply(vars_, frames[3:4], no_local)
    assert not np.allclose(np.asarray(out4["refined_cls_logits"]),
                           np.asarray(out4_nl["refined_cls_logits"]))


def test_bank_push_ring_wraps():
    bank = init_online_bank(8, 4)
    f = jnp.ones((6, 4))
    b1 = bank_push(bank, f, f, jnp.ones(6), jnp.ones(6), jnp.ones(6, bool))
    b2 = bank_push(b1, 2 * f, 2 * f, jnp.ones(6), jnp.ones(6),
                   jnp.ones(6, bool))
    assert int(b2.ptr) == (12 % 8)
    assert bool(b2.valid.all())
    # wrap overwrote the oldest slots
    assert float(b2.cls_feat[0, 0]) == 2.0


def test_local_aggregation_shapes():
    # features stay at C dims (post_trans.py:972; parity-tested in
    # test_torch_parity_video.test_local_aggregation_parity)
    rng = np.random.default_rng(0)
    N, Ch, L, P = 12, 16, 3, 4
    m = LocalAggregation(num_heads=2, reconf=True)
    fc = jnp.asarray(rng.normal(size=(N, Ch)), jnp.float32)
    fr = jnp.asarray(rng.normal(size=(N, Ch)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(10, 50, (N, 4)), jnp.float32)
    boxes = boxes.at[:, 2:].add(50)
    v = m.init(jax.random.PRNGKey(0), fc, fr, boxes,
               jnp.ones(N), jnp.ones(N), jnp.ones(N, bool), L, P)
    oc, oo = m.apply(v, fc, fr, boxes, jnp.ones(N), jnp.ones(N),
                     jnp.ones(N, bool), L, P)
    assert oc.shape == (N, Ch) and oo.shape == (N, Ch)
    assert np.isfinite(np.asarray(oc)).all()
