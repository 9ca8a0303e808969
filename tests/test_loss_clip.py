"""Matched-obj loss clip semantics (reference tscd_head.py:1185-1186).

The reference clips with `loss / float(loss) * 15`; `float()` detaches
the denominator, so the clipped loss VALUE is exactly 15 while the
gradient is the unclipped gradient scaled by 15/loss (direction
preserved, magnitude bounded) — NOT a gradient-killing hard clip.
These tests pin both sides to that behavior.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _repo_clip(loss):
    return jnp.where(
        loss > 15.0,
        loss * jax.lax.stop_gradient(15.0 / loss),
        loss)


def test_repo_clip_value_and_gradient():
    def f(x):
        return _repo_clip(x * x)  # loss = x^2

    x = jnp.float32(10.0)        # loss = 100 > 15
    val, grad = jax.value_and_grad(f)(x)
    assert np.isclose(float(val), 15.0)
    # grad = d(x^2)/dx * (15/100) = 20 * 0.15 = 3
    assert np.isclose(float(grad), 3.0)

    x2 = jnp.float32(2.0)        # loss = 4 <= 15: untouched
    val2, grad2 = jax.value_and_grad(f)(x2)
    assert np.isclose(float(val2), 4.0)
    assert np.isclose(float(grad2), 4.0)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_reference_clip_gradient_matches():
    torch = pytest.importorskip("torch")
    x = torch.tensor(10.0, requires_grad=True)
    loss = x * x
    if loss > 15:
        loss = loss / float(loss) * 15   # verbatim reference expression
    loss.backward()
    assert np.isclose(loss.item(), 15.0)
    assert np.isclose(x.grad.item(), 3.0)  # same scaled gradient as ours
