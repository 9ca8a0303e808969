"""Parity: banded-matmul Focus-stem lowering (pure XLA) vs the 6x6-conv
reference and the original s2d + conv formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.ops import banded_stem as bs


@pytest.mark.parametrize("b,h,w", [(2, 96, 96), (1, 64, 128),
                                   (1, 64, 224)])
def test_banded_matches_xla_reference(b, h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 64)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.5, 64), jnp.float32)

    ref = bs._xla_reference(x, w3, scale, shift, jnp.float32,
                            compute_dtype=jnp.bfloat16)
    got = bs.focus_stem_banded(x, w3, scale, shift, jnp.float32)
    assert got.shape == (b, h // 2, w // 2, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_banded_matches_s2d_formulation():
    """End-to-end vs the original Focus semantics (s2d + 3x3 conv +
    affine + SiLU) computed with the SAME bf16 input/weight rounding
    the banded path uses (scale folded into the kernel before the
    cast, fp32 accumulation). The fp32-semantics equivalence of the
    6x6 form itself is covered by test_focus_stem.py."""
    from tscd_tpu.models.blocks import space_to_depth_focus
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 64)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.5, 64), jnp.float32)

    xs = space_to_depth_focus(x.astype(jnp.bfloat16).astype(jnp.float32))
    w_fold = (w3 * scale).astype(jnp.bfloat16).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        xs, w_fold, (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + shift
    want = np.asarray(y * jax.nn.sigmoid(y))

    got = np.asarray(bs.focus_stem_banded(x, w3, scale, shift,
                                          jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_custom_vjp_backward_shapes():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 8)), jnp.float32)
    scale = jnp.ones(8, jnp.float32)
    shift = jnp.zeros(8, jnp.float32)
    g = jnp.ones((1, 16, 16, 8), jnp.float32)

    dx, dw, dscale, dshift = bs._bwd(jnp.float32, (x, w3, scale, shift), g)
    assert dx.shape == x.shape and dw.shape == w3.shape
    assert dscale.shape == scale.shape and dshift.shape == shift.shape
    for t in (dx, dw, dscale, dshift):
        assert np.isfinite(np.asarray(t)).all()
