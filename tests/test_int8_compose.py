"""int8 serving composes with the parallelism axes: the quantized
trace must compile and run under (a) frame-sharded eval (SP) and
(b) model-axis tensor parallelism on the virtual 8-device mesh.
Numeric parity of the int8 path itself is covered by
tests/test_int8_eval.py; these assert the GSPMD partitioner accepts
the int8 conv + quant ops with sharded operands."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.models.blocks import int8_eval
from tscd_tpu.models.matching import init_matcher_state
from tscd_tpu.models.tscd import TSCD
from tscd_tpu.ops.position import get_timing_signal_1d
from tscd_tpu.parallel.mesh import make_mesh

C, HW, NP = 5, 64, 6


def _model_and_data(F):
    m = TSCD(num_classes=C, depth=0.33, width=0.25, num_proposals=NP,
             heads=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, HW, HW, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    return m, x, te


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_int8_frame_sharded_eval():
    import tscd_tpu.models.blocks as blocks
    from tscd_tpu.parallel.sharded_eval import make_sharded_tscd_eval

    F = 8
    Lf, Gf = 1, F - 1
    m, x, te = _model_and_data(F)
    variables = m.init(jax.random.PRNGKey(0), x, te, Lf, Gf)
    mesh = make_mesh(num_data=8)
    st = init_matcher_state(NP, 64, 256)
    old = blocks.INT8_MIN_CIN
    blocks.INT8_MIN_CIN = 16
    try:
        with int8_eval():
            eval_fn = make_sharded_tscd_eval(m, mesh, Lf, Gf, C)
            (refined, original), _ = eval_fn(variables, x, te, st)
            jax.block_until_ready(refined.boxes)
    finally:
        blocks.INT8_MIN_CIN = old
    assert np.isfinite(np.asarray(refined.boxes)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_int8_tensor_parallel_eval():
    import tscd_tpu.models.blocks as blocks
    from tscd_tpu.parallel.tensor_parallel import (jit_tp_eval,
                                                   shard_params_tp)

    F = 2
    Lf, Gf = 1, 1
    m, x, te = _model_and_data(F)
    variables = m.init(jax.random.PRNGKey(0), x, te, Lf, Gf)
    mesh = make_mesh(num_data=1, num_model=8)
    var_tp = shard_params_tp(variables, mesh, min_out=16)
    old = blocks.INT8_MIN_CIN
    blocks.INT8_MIN_CIN = 16
    try:
        with int8_eval():
            fwd = jit_tp_eval(
                lambda v, x, te: m.apply(v, x, te, Lf, Gf,
                                         False)["refined_cls_logits"],
                var_tp, mesh, min_out=16, num_data_args=2)
            out = fwd(var_tp, x, te)
            jax.block_until_ready(out)
    finally:
        blocks.INT8_MIN_CIN = old
    assert np.isfinite(np.asarray(out)).all()
