"""int8 (w8a8) serving path: BaseConv lowers its eval forward to an
int8 MXU conv inside the `int8_eval()` context (per-channel weight
scales, dynamic per-tensor activation scale, BN folded). Checks: the
variable tree is unchanged, quantization error is bounded at conv and
model level, and the flag restores cleanly."""

import jax
import jax.numpy as jnp
import numpy as np

from tscd_tpu.models.blocks import (BaseConv, int8_eval,
                                    int8_eval_enabled)
from tscd_tpu.models.yolox import YOLOX


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)


def test_context_restores_flag():
    assert not int8_eval_enabled()
    with int8_eval():
        assert int8_eval_enabled()
        with int8_eval(False):
            assert not int8_eval_enabled()
        assert int8_eval_enabled()
    assert not int8_eval_enabled()


def test_mode_is_thread_local():
    """The mode is a ContextVar: a thread tracing inside int8_eval()
    must not leak the mode into concurrently-running threads (advisor
    r3: module-global lists raced under threaded test runners /
    multi-threaded servers)."""
    import threading

    inside = threading.Event()
    release = threading.Event()
    seen = {}

    def holder():
        with int8_eval():
            inside.set()
            release.wait(timeout=10)

    def observer():
        inside.wait(timeout=10)
        seen["other_thread"] = int8_eval_enabled()
        release.set()

    t1 = threading.Thread(target=holder)
    t2 = threading.Thread(target=observer)
    t1.start(); t2.start()
    t1.join(timeout=15); t2.join(timeout=15)
    assert seen["other_thread"] is False
    assert not int8_eval_enabled()


def test_baseconv_int8_matches_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, (2, 16, 16, 128)), jnp.float32)
    m = BaseConv(128, 3, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    # make BN stats non-trivial so the fold actually matters
    variables = {
        "params": variables["params"],
        "batch_stats": {"bn": {
            "mean": jnp.asarray(rng.normal(0, 0.1, 128), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, 128), jnp.float32),
        }},
    }
    ref = m.apply(variables, x)
    with int8_eval():
        got = m.apply(variables, x)
    assert got.shape == ref.shape
    assert _rel_l2(got, ref) < 0.02


def test_int8_variable_tree_identical():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 128)), jnp.float32)
    m = BaseConv(96, 1, dtype=jnp.float32)
    v_fp = m.init(jax.random.PRNGKey(0), x)
    with int8_eval():
        v_q = m.init(jax.random.PRNGKey(0), x)
    fp_paths = {(jax.tree_util.keystr(k), v.shape) for k, v in
                jax.tree_util.tree_leaves_with_path(v_fp)}
    q_paths = {(jax.tree_util.keystr(k), v.shape) for k, v in
               jax.tree_util.tree_leaves_with_path(v_q)}
    assert fp_paths == q_paths


def test_small_cin_and_train_keep_fp_path():
    """C_in < INT8_MIN_CIN convs (large-spatial early stages) must not
    quantize — identical outputs with the flag on and off."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 64)), jnp.float32)
    m = BaseConv(64, 3, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(variables, x)
    with int8_eval():
        got = m.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_yolox_int8_forward_close():
    """Full YOLOX eval forward fp32 vs int8: decoded outputs stay
    close (random init, realistic 0-255 image)."""
    rng = np.random.default_rng(3)
    m = YOLOX(num_classes=5, depth=0.33, width=0.25, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 96, 96, 3)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(variables, x)["decoded"]
    with int8_eval():
        got = m.apply(variables, x)["decoded"]
    assert np.isfinite(np.asarray(got)).all()
    # boxes (pre-sigmoid geometry) and scores both bounded
    assert _rel_l2(got[..., :4], ref[..., :4]) < 0.05
    assert float(np.max(np.abs(np.asarray(got[..., 4:])
                               - np.asarray(ref[..., 4:])))) < 0.05


def test_int8_static_calibration_flow():
    """quantize_int8 populates per-input-channel scales; the
    static-scale apply (channel scales folded into the weights) stays
    at least as close to fp as the per-tensor dynamic path."""
    from tscd_tpu.models.blocks import quantize_int8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 2, (2, 16, 16, 128)), jnp.float32)
    # channel outliers: per-tensor scales smear these, per-channel not
    x = x.at[..., 7].mul(20.0)
    m = BaseConv(128, 3, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)

    v_q = quantize_int8(m.apply, variables, x)
    scales = jax.tree_util.tree_leaves(v_q["quant"])
    assert scales and all(s.shape == (128,) for s in scales)
    assert all(float(jnp.min(s)) > 0 for s in scales)

    ref = m.apply(variables, x)
    with int8_eval():
        dyn = m.apply(variables, x)
    with int8_eval(static=True):
        st = m.apply(v_q, x)
    err_static, err_dyn = _rel_l2(st, ref), _rel_l2(dyn, ref)
    assert err_static < 0.03
    # equalization must beat per-tensor dynamic on outlier channels
    assert err_static < err_dyn * 0.5


def test_int8_scope_frozen_backbone():
    """Scoped int8 (core/tscd_trainer.py int8_frozen_backbone): only
    modules under the scope prefixes quantize — a non-matching scope
    is bit-identical to fp, a backbone scope changes the loss but
    keeps head gradients finite and nonzero."""
    import tscd_tpu.models.blocks as blocks
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.train.losses import tscd_loss

    L, G = 1, 1
    F, HW = L + G, 64
    m = TSCD(num_classes=3, depth=0.33, width=0.25, num_proposals=4,
             heads=2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 255, (F, HW, HW, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256),
                     jnp.float32)
    labels = np.zeros((F, 4, 5), np.float32)
    labels[:, 0] = [1, 30, 30, 20, 20]
    labels = jnp.asarray(labels)
    variables = m.init(jax.random.PRNGKey(0), x, te, L, G)

    def loss_fn(params):
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      x, te, L, G, False, labels=labels)
        return tscd_loss(out, labels, (8, 16, 32), L)["total_loss"]

    old = blocks.INT8_MIN_CIN
    blocks.INT8_MIN_CIN = 16
    try:
        loss_fp, g_fp = jax.value_and_grad(loss_fn)(variables["params"])
        with int8_eval(scope=(("nonexistent",),)):
            loss_none = loss_fn(variables["params"])
        with int8_eval(scope=(("backbone",),)):
            loss_bb, g_bb = jax.value_and_grad(loss_fn)(
                variables["params"])
    finally:
        blocks.INT8_MIN_CIN = old

    # non-matching scope: int8 never engages -> identical
    np.testing.assert_array_equal(float(loss_none), float(loss_fp))
    # backbone scope engages: loss shifts but stays close and finite
    assert float(loss_bb) != float(loss_fp)
    assert np.isfinite(float(loss_bb))
    assert abs(float(loss_bb) - float(loss_fp)) < 0.2 * abs(
        float(loss_fp))
    head_g = jax.tree_util.tree_leaves(g_bb["head"])
    assert all(np.isfinite(np.asarray(t)).all() for t in head_g)
    assert any(float(jnp.max(jnp.abs(t))) > 0 for t in head_g)


def test_int8_qat_fake_quant():
    """QAT mode (int8_eval(qat=True)): forward equals the real int8
    path bit-for-bit at this size (f32 accumulation is exact below
    2^24), and STE gradients flow — close to the fp-path gradients."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 2, (2, 8, 8, 128)), jnp.float32)
    m = BaseConv(64, 3, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)

    with int8_eval():
        y_int8 = m.apply(variables, x)
    with int8_eval(qat=True):
        y_qat = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_int8),
                               rtol=1e-6, atol=1e-6)

    def loss(params, x, ctx_kwargs):
        with int8_eval(**ctx_kwargs):
            y = m.apply({"params": params,
                         "batch_stats": variables["batch_stats"]}, x)
        return jnp.sum(y ** 2)

    g_fp = jax.grad(loss)(variables["params"], x,
                          {"enable": False})
    g_qat = jax.grad(loss)(variables["params"], x, {"qat": True})
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_qat),
            jax.tree_util.tree_leaves_with_path(g_fp)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.abs(a).max() > 0, f"zero QAT grad {k1}"
        cos = (a * b).sum() / max(
            np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
        assert cos > 0.95, (
            f"QAT grad misaligned with fp grad for "
            f"{jax.tree_util.keystr(k1)}: cos={cos}")
