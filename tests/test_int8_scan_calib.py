"""Serving-shape int8 calibration via chunked lax.scan (VERDICT r3 #5).

quantize_int8_scan folds per-chunk activation maxima into one carry
tree. Quantized convs are all per-frame, so the fold must be EXACT:
scan over 2 x (l=1,g=3) chunks == one-shot calibrate on the full
(l=1,g=7) window, layer by layer. Also proves the scan-calibrated tree
serves through int8_eval(static=True).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_scan_calibration_matches_one_shot():
    import jax
    import jax.numpy as jnp

    import tscd_tpu.models.blocks as blocks
    from tscd_tpu.models.blocks import (int8_eval, quantize_int8,
                                        quantize_int8_scan)
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    F, H, W = 8, 96, 128
    model = TSCD(num_classes=30, depth=0.33, width=0.125,
                 num_proposals=8, heads=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, te, 1, F - 1)

    old = (blocks.INT8_MIN_CIN, blocks.INT8_MIN_CIN_STATIC)
    blocks.INT8_MIN_CIN = blocks.INT8_MIN_CIN_STATIC = 16
    try:
        # one-shot calibrate on the full window
        v_full = quantize_int8(
            model.apply, variables, x, te, 1, F - 1, False)

        # chunked: 2 x (l=1, g=3) over the same frames
        Fc = F // 2
        xs = x.reshape(2, Fc, H, W, 3)
        tes = te.reshape(2, Fc, -1)
        v_scan = quantize_int8_scan(
            lambda v, xa, ta: model.apply(v, xa, ta, 1, Fc - 1, False,
                                          mutable=["quant"]),
            variables, xs, tes)

        flat_full = jax.tree_util.tree_leaves_with_path(v_full["quant"])
        flat_scan = dict(
            (jax.tree_util.keystr(p), a) for p, a in
            jax.tree_util.tree_leaves_with_path(v_scan["quant"]))
        assert len(flat_full) == len(flat_scan) > 10
        for p, a in flat_full:
            key = jax.tree_util.keystr(p)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(flat_scan[key]),
                rtol=1e-6, atol=1e-7, err_msg=key)
        # calibration actually recorded something
        assert max(float(np.max(a)) for _, a in flat_full) > 0

        # the scan-calibrated tree serves through the static path
        with int8_eval(static=True):
            out = jax.jit(lambda v, xa, ta: model.apply(
                v, xa, ta, 1, F - 1, False)["refined_boxes"])(
                    v_scan, x, te)
        assert np.isfinite(np.asarray(out)).all()
    finally:
        blocks.INT8_MIN_CIN, blocks.INT8_MIN_CIN_STATIC = old
