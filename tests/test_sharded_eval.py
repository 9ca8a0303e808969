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
