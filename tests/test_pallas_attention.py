"""Parity test: Pallas fused dual attention (interpret mode on CPU) vs
the pure-jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.ops.pallas.fused_attention import (dual_attention_reference,
                                                 fused_dual_attention)


@pytest.mark.parametrize("h,q,k,d", [(2, 8, 48, 16), (4, 50, 200, 64)])
def test_fused_matches_reference(h, q, k, d):
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    qc, qr = mk(h, q, d), mk(h, q, d)
    kc, kr, vc, vr = mk(h, k, d), mk(h, k, d), mk(h, k, d), mk(h, k, d)
    score = jnp.asarray(rng.uniform(0, 1, k), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=k) > 0.2)

    ref = dual_attention_reference(qc, kc, vc, qr, kr, vr, score, valid)
    got = fused_dual_attention(qc, kc, vc, qr, kr, vr, score, valid,
                               interpret=True)
    for r, g, name in zip(ref, got, ("out_cls", "out_reg", "attn")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_fused_all_keys_invalid_is_finite():
    h, q, k, d = 2, 8, 32, 16
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    out = fused_dual_attention(mk(h, q, d), mk(h, k, d), mk(h, k, d),
                               mk(h, q, d), mk(h, k, d), mk(h, k, d),
                               jnp.ones(k), jnp.zeros(k, bool),
                               interpret=True)
    for o in out:
        assert np.isfinite(np.asarray(o)).all()
