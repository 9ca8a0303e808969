"""Tests for the deployment path: StableHLO export round-trip and the
native C++ decode+NMS demo op."""

import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.native import load_library


def test_cpp_decode_nms_matches_python():
    lib = load_library("yolox_deploy")
    assert lib is not None, "g++ build of yolox_deploy.cpp failed"
    rng = np.random.default_rng(0)
    hw = [(8, 8), (4, 4), (2, 2)]
    strides = [8, 16, 32]
    C = 5
    A = sum(h * w for h, w in hw)
    raw = rng.normal(0, 1, (A, 5 + C)).astype(np.float32)
    raw[:, 4] -= 1.0

    out = np.zeros((100, 7), np.float32)
    lib.yolox_decode_nms.restype = ctypes.c_int32
    n = lib.yolox_decode_nms(
        raw.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(A),
        ctypes.c_int64(C),
        np.asarray(hw, np.int32).ctypes.data_as(ctypes.c_void_p),
        np.asarray(strides, np.int32).ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(3),
        ctypes.c_float(0.1), ctypes.c_float(0.45), ctypes.c_int32(100),
        out.ctypes.data_as(ctypes.c_void_p))
    assert n > 0
    cpp = out[:n]

    # python reference: decode + dense postprocess
    from tscd_tpu.ops.decode import decode_outputs
    from tscd_tpu.ops.postprocess import postprocess_dense
    dec = decode_outputs(jnp.asarray(raw[None]), hw, strides)
    decoded = jnp.concatenate(
        [dec[..., :4], jax.nn.sigmoid(dec[..., 4:])], -1)[0]
    d = postprocess_dense(decoded, C, 0.1, 0.45, 100)
    m = np.asarray(d.mask)
    py_boxes = np.asarray(d.boxes)[m]
    py_scores = (np.asarray(d.obj) * np.asarray(d.score))[m]
    py_cls = np.asarray(d.cls_id)[m]

    assert n == len(py_boxes)
    order_cpp = np.argsort(-cpp[:, 5])
    order_py = np.argsort(-py_scores)
    np.testing.assert_allclose(cpp[order_cpp, :4], py_boxes[order_py],
                               atol=1e-3)
    np.testing.assert_allclose(cpp[order_cpp, 5], py_scores[order_py],
                               atol=1e-5)
    np.testing.assert_array_equal(cpp[order_cpp, 6].astype(int),
                                  py_cls[order_py])


def test_stablehlo_export_roundtrip():
    from jax import export as jax_export

    from tscd_tpu.models.yolox import YOLOX
    m = YOLOX(num_classes=5, depth=0.33, width=0.125)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, False, True)

    def fwd(img):
        return m.apply(v, img, False, True)["decoded"]

    exported = jax_export.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    blob = exported.serialize()
    assert len(blob) > 1000
    restored = jax_export.deserialize(blob)
    xr = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)),
                     jnp.float32)
    y1 = restored.call(xr)
    y2 = fwd(xr)
    # separate compilations of the same program: tiny fp rounding drift
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-3)


def test_stablehlo_export_int8_roundtrip():
    """The int8 serving forward exports to StableHLO and round-trips:
    dynamic scales + int8 convs are all inside the artifact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jax_export

    import tscd_tpu.models.blocks as blocks
    from tscd_tpu.models.blocks import int8_eval
    from tscd_tpu.models.yolox import YOLOX

    m = YOLOX(num_classes=3, depth=0.33, width=0.25, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)

    def fwd(img):
        return m.apply(variables, img, False, True)["decoded"]

    old = blocks.INT8_MIN_CIN
    blocks.INT8_MIN_CIN = 16
    try:
        with int8_eval():
            exported = jax_export.export(jax.jit(fwd))(
                jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
            want = np.asarray(fwd(x))
    finally:
        blocks.INT8_MIN_CIN = old
    blob = exported.serialize()
    restored = jax_export.deserialize(blob)
    got = np.asarray(restored.call(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # the artifact really contains the int8 lowering
    assert "i8" in str(exported.mlir_module())
