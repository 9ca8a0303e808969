"""Tests for the long-tail components: P6 PAFPN, custom layers, DETR
decoder + set criterion, model utils, VOC eval, loggers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.models.custom_layers import CoordConv, DeformConv2d, DropBlock
from tscd_tpu.models.decoder import (TransformerDecoder, hungarian_match,
                                     set_criterion)
from tscd_tpu.models.pafpn_p6 import YOLOPAFPNP6
from tscd_tpu.utils.model_utils import (count_params, fuse_conv_bn_params,
                                        fused_batch_stats, get_model_info)


def test_pafpn_p6_strides():
    m = YOLOPAFPNP6(depth=0.33, width=0.125)
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    p3, p4, p5, p6 = m.apply(v, x, False)
    assert p3.shape[1] == 16 and p6.shape[1] == 2
    assert p6.shape[-1] == int(1024 * 0.125)


def test_coordconv_dropblock_deform():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    cc = CoordConv(6)
    v = cc.init(jax.random.PRNGKey(0), x)
    assert cc.apply(v, x).shape == (2, 8, 8, 6)

    db = DropBlock(block_size=3, keep_prob=0.8)
    y = db.apply({}, x, True, rngs={"dropout": jax.random.PRNGKey(0)})
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))
    y_eval = db.apply({}, x, False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))

    dc = DeformConv2d(6)
    v = dc.init(jax.random.PRNGKey(0), x)
    out = dc.apply(v, x)
    assert out.shape == (2, 8, 8, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_detr_decoder_and_criterion():
    rng = np.random.default_rng(0)
    C, Q = 5, 16
    m = TransformerDecoder(num_classes=C, dim=32, heads=4, num_layers=2,
                           num_queries=Q)
    mem = jnp.asarray(rng.normal(size=(40, 32)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), mem)
    out = m.apply(v, mem)
    assert out["pred_logits"].shape == (2, Q, C + 1)
    assert out["pred_boxes"].shape == (2, Q, 4)

    gt_boxes = jnp.asarray(rng.uniform(0.2, 0.8, (Q, 4)), jnp.float32)
    gt_classes = jnp.asarray(rng.integers(0, C, Q), jnp.int32)
    gt_valid = jnp.asarray(np.arange(Q) < 3)

    def loss_fn(params):
        o = m.apply({"params": params}, mem)
        l = set_criterion(o, gt_classes, gt_boxes, gt_valid, C)
        return l["total_loss"], l

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    gn = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(b ** 2)), grads, 0.0)
    assert gn > 0


def test_hungarian_match_prefers_identity():
    Q, C = 8, 4
    rng = np.random.default_rng(0)
    gt_boxes = jnp.asarray(rng.uniform(0.2, 0.7, (Q, 4)), jnp.float32)
    logits = jnp.zeros((Q, C + 1))
    # queries predict exactly the gt boxes -> identity matching
    col = hungarian_match(logits, gt_boxes,
                          jnp.zeros(Q, jnp.int32), gt_boxes,
                          jnp.ones(Q, bool))
    np.testing.assert_array_equal(np.asarray(col), np.arange(Q))


def test_fuse_conv_bn_equivalence():
    from tscd_tpu.models.blocks import BaseConv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    m = BaseConv(8, 3, 1)
    v = m.init(jax.random.PRNGKey(0), x, True)
    # give BN non-trivial stats
    _, mut = m.apply(v, x, True, mutable=["batch_stats"])
    v = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    y_ref = m.apply(v, x, False)
    fused_p = fuse_conv_bn_params(v["params"], v["batch_stats"])
    fused_s = fused_batch_stats(v["batch_stats"])
    y_fused = m.apply({"params": fused_p, "batch_stats": fused_s}, x,
                      False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


def test_model_info_and_params():
    from tscd_tpu.models.yolox import YOLOX
    m = YOLOX(num_classes=5, depth=0.33, width=0.125)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, False, False)
    assert count_params(v["params"]) > 1000
    info = get_model_info(m, v, (1, 64, 64, 3), train=False, decode=False)
    assert "Params" in info and "GFLOPs" in info


def test_voc_eval_perfect():
    from tscd_tpu.data.voc import voc_eval
    rng = np.random.default_rng(0)
    dets, gts = {}, {}
    for i in range(4):
        g = np.asarray([[10, 10, 60, 60, 0], [100, 100, 160, 150, 1]],
                       np.float32)
        d = np.concatenate([g[:, :4],
                            np.full((2, 1), 0.9),
                            np.full((2, 1), 0.8),
                            g[:, 4:5]], -1).astype(np.float32)
        gts[f"img{i}"] = g
        dets[f"img{i}"] = d
    r = voc_eval(dets, gts, num_classes=2)
    assert r["mAP"] == pytest.approx(1.0)


def test_metrics_logger(tmp_path):
    from tscd_tpu.utils.logger import MetricsLogger, setup_logger
    lg = setup_logger(str(tmp_path))
    lg.info("hello")
    ml = MetricsLogger(str(tmp_path))
    ml.log({"loss": 1.5}, step=1)
    ml.close()
    assert os.path.exists(tmp_path / "metrics.jsonl")
    assert os.path.exists(tmp_path / "train_log.txt")
