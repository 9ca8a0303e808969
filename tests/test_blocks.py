import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.models.blocks import (BaseConv, CSPLayer, Focus, SPPBottleneck,
                                    space_to_depth_focus)
from tscd_tpu.models.darknet import CSPDarknet
from tscd_tpu.models.pafpn import YOLOPAFPN, upsample2x
from tscd_tpu.models.yolox import YOLOX


def test_space_to_depth_order():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = space_to_depth_focus(x)
    assert y.shape == (1, 2, 2, 4)
    # channel order: tl, bl, tr, br
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), [0, 4, 1, 5])


def test_upsample2x():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    y = upsample2x(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :, :, 0]),
                               [[0, 0, 1, 1], [0, 0, 1, 1],
                                [2, 2, 3, 3], [2, 2, 3, 3]])


def test_baseconv_shapes():
    m = BaseConv(out_channels=16, ksize=3, stride=2)
    x = jnp.ones((2, 8, 8, 4))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 4, 4, 16)
    assert "batch_stats" in vars_


def test_cspdarknet_feature_shapes():
    m = CSPDarknet(dep_mul=0.33, wid_mul=0.25)
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert set(out) == {"dark3", "dark4", "dark5"}
    assert out["dark3"].shape == (1, 8, 8, 64)
    assert out["dark4"].shape == (1, 4, 4, 128)
    assert out["dark5"].shape == (1, 2, 2, 256)


def test_pafpn_output_shapes():
    m = YOLOPAFPN(depth=0.33, width=0.25)
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    p2, p1, p0 = m.apply(vars_, x)
    assert p2.shape == (1, 8, 8, 64)
    assert p1.shape == (1, 4, 4, 128)
    assert p0.shape == (1, 2, 2, 256)


def test_yolox_forward_decoded():
    m = YOLOX(num_classes=30, depth=0.33, width=0.25)
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    a = 8 * 8 + 4 * 4 + 2 * 2
    assert out["outputs"].shape == (1, a, 35)
    assert out["decoded"].shape == (1, a, 35)
    dec = np.asarray(out["decoded"])
    # obj/cls are probabilities
    assert (dec[..., 4:] >= 0).all() and (dec[..., 4:] <= 1).all()
    # wh positive
    assert (dec[..., 2:4] > 0).all()
