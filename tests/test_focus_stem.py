"""Parity: Pallas Focus-stem kernel (interpret mode on CPU) vs the XLA
6x6-conv reference, and vs the plain s2d + BaseConv formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.ops.pallas import focus_stem as fs


@pytest.mark.parametrize("b,h,w", [(2, 96, 96), (1, 64, 128)])
def test_kernel_matches_xla_reference(b, h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 64)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.5, 64), jnp.float32)

    ref = fs._xla_reference(x, w3, scale, shift, jnp.float32,
                            compute_dtype=jnp.bfloat16)
    got = fs._focus_stem_impl(x, w3, scale, shift, jnp.float32,
                              interpret=True)
    assert got.shape == (b, h // 2, w // 2, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_xla_reference_matches_s2d_formulation():
    """The 6x6 reference itself must equal s2d + 3x3 conv + affine +
    SiLU (the original Focus semantics)."""
    from tscd_tpu.models.blocks import space_to_depth_focus
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 8)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.5, 8), jnp.float32)

    ref = fs._xla_reference(x, w3, scale, shift, jnp.float32)

    xs = space_to_depth_focus(x)
    y = jax.lax.conv_general_dilated(
        xs, w3, (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * scale + shift
    want = y * jax.nn.sigmoid(y)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want),
                               atol=1e-3, rtol=1e-4)


def test_custom_vjp_backward_shapes():
    """The custom backward (reference-vjp) must produce cotangents of
    the primal shapes so value_and_grad through the stem is safe."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 8)), jnp.float32)
    scale = jnp.ones(8, jnp.float32)
    shift = jnp.zeros(8, jnp.float32)
    g = jnp.ones((1, 16, 16, 8), jnp.float32)

    dx, dw, dscale, dshift = fs._bwd(jnp.float32, (x, w3, scale, shift), g)
    assert dx.shape == x.shape and dw.shape == w3.shape
    assert dscale.shape == scale.shape and dshift.shape == shift.shape
    for t in (dx, dw, dscale, dshift):
        assert np.isfinite(np.asarray(t)).all()
