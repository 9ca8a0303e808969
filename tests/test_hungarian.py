import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment as scipy_lsa

from tscd_tpu.ops.hungarian import (linear_sum_assignment,
                                    masked_linear_sum_assignment)


def test_matches_scipy_random():
    rng = np.random.default_rng(0)
    for n in [2, 5, 16, 30]:
        for _ in range(5):
            c = rng.uniform(0, 2, (n, n)).astype(np.float32)
            ours = np.asarray(linear_sum_assignment(jnp.asarray(c)))
            rows, cols = scipy_lsa(c)
            # optimal total cost must agree (assignment may differ on ties)
            np.testing.assert_allclose(
                c[np.arange(n), ours].sum(), c[rows, cols].sum(), rtol=1e-5)
            assert len(set(ours.tolist())) == n  # valid permutation


def test_identity_cost():
    c = 1.0 - np.eye(4, dtype=np.float32)
    ours = np.asarray(linear_sum_assignment(jnp.asarray(c)))
    assert ours.tolist() == [0, 1, 2, 3]


def test_masked_assignment_valid_to_valid():
    rng = np.random.default_rng(1)
    n = 8
    c = rng.uniform(0, 2, (n, n)).astype(np.float32)
    rv = np.array([True] * 5 + [False] * 3)
    cv = np.array([True] * 5 + [False] * 3)
    ours = np.asarray(masked_linear_sum_assignment(
        jnp.asarray(c), jnp.asarray(rv), jnp.asarray(cv)))
    # valid rows must map to valid cols, invalid to invalid
    assert all(ours[i] < 5 for i in range(5))
    assert all(ours[i] >= 5 for i in range(5, 8))
    # and the valid-valid block is optimal
    sub_rows, sub_cols = scipy_lsa(c[:5, :5])
    np.testing.assert_allclose(c[np.arange(5), ours[:5]].sum(),
                               c[sub_rows, sub_cols].sum(), rtol=1e-5)


def test_pallas_kernel_matches_xla_and_scipy():
    """ops/pallas/hungarian.py (interpret mode on CPU) must be
    bit-identical to the XLA lowering and optimal vs scipy."""
    from tscd_tpu.ops.pallas.hungarian import linear_sum_assignment_pallas
    rng = np.random.default_rng(3)
    for n in (3, 8, 50, 128):
        c = (rng.normal(size=(n, n)).astype(np.float32)
             * rng.uniform(0.5, 20))
        got = np.asarray(linear_sum_assignment_pallas(
            jnp.asarray(c), interpret=True))
        assert np.array_equal(
            got, np.asarray(linear_sum_assignment(jnp.asarray(c))))
        rows, cols = scipy_lsa(c)
        np.testing.assert_allclose(c[np.arange(n), got].sum(),
                                   c[rows, cols].sum(), rtol=1e-5)
        assert len(set(got.tolist())) == n


def test_assignment_is_grad_transparent():
    """jax.grad through a matched loss must work: the assignment is a
    discrete (stop_gradient'ed) decision, but gradients flow through the
    costs gathered AT the assignment — the TSCD matched losses depend on
    this (and the pallas kernel cannot be linearized at all without the
    stop; caught on TPU in round 2)."""
    import jax
    import jax.numpy as jnp

    from tscd_tpu.ops.hungarian import linear_sum_assignment

    w0 = jnp.asarray(np.random.default_rng(3).normal(size=(5, 5)),
                     jnp.float32)

    def loss(w):
        cost = w * w + 0.1 * w
        perm = linear_sum_assignment(cost)
        return jnp.sum(cost[jnp.arange(5), perm])

    g = jax.grad(loss)(w0)
    assert np.isfinite(np.asarray(g)).all()
    # gradient equals d(cost)/dw at the assigned entries only
    perm = np.asarray(linear_sum_assignment(w0 * w0 + 0.1 * w0))
    manual = np.zeros((5, 5), np.float32)
    manual[np.arange(5), perm] = np.asarray(2 * w0 + 0.1)[
        np.arange(5), perm]
    np.testing.assert_allclose(np.asarray(g), manual, rtol=1e-5)
