"""Shape/finite tests for the alternate backbone families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tscd_tpu.models.elan import ELANFPN, YOLOv7
from tscd_tpu.models.focalnet import build_focalnet
from tscd_tpu.models.pafpn_variants import (YOLOFPN, YOLOPAFPN_Focal,
                                            YOLOPAFPN_ResNet,
                                            YOLOPAFPN_Swin)
from tscd_tpu.models.resnet import ResNet
from tscd_tpu.models.swin import swin_tiny
from tscd_tpu.models.yolov8 import YOLOv8

HW = 64


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, HW, HW, 3)),
        jnp.float32)


def _strides_ok(feats, hw=HW):
    assert feats["dark3"].shape[1] == hw // 8
    assert feats["dark4"].shape[1] == hw // 16
    assert feats["dark5"].shape[1] == hw // 32
    for v in feats.values():
        assert np.isfinite(np.asarray(v)).all()


def test_swin_tiny_strides(x):
    m = swin_tiny()
    v = m.init(jax.random.PRNGKey(0), x)
    _strides_ok(m.apply(v, x))


def test_focalnet_strides(x):
    m = build_focalnet("focalnet_tiny")
    v = m.init(jax.random.PRNGKey(0), x)
    _strides_ok(m.apply(v, x))


def test_resnet50_strides(x):
    m = ResNet(50)
    v = m.init(jax.random.PRNGKey(0), x, False)
    _strides_ok(m.apply(v, x, False))


@pytest.mark.parametrize("cls,kw", [
    (YOLOPAFPN_Swin, dict(variant="tiny", width=0.25)),
    (YOLOPAFPN_Focal, dict(variant="focalnet_tiny", width=0.25)),
    (YOLOPAFPN_ResNet, dict(res_depth=50, width=0.25)),
])
def test_pafpn_variants(x, cls, kw):
    m = cls(depth=0.33, **kw)
    v = m.init(jax.random.PRNGKey(0), x, False)
    p3, p4, p5 = m.apply(v, x, False)
    assert p3.shape == (1, HW // 8, HW // 8, int(256 * 0.25))
    assert p4.shape == (1, HW // 16, HW // 16, int(512 * 0.25))
    assert p5.shape == (1, HW // 32, HW // 32, int(1024 * 0.25))
    assert np.isfinite(np.asarray(p3)).all()


def test_yolofpn_legacy(x):
    m = YOLOFPN(depth=21)
    v = m.init(jax.random.PRNGKey(0), x, False)
    o2, o1, o0 = m.apply(v, x, False)
    assert o2.shape[1] == HW // 8 and o0.shape[1] == HW // 32


def test_elan_backbone_fpn_tiny(x):
    from tscd_tpu.models.elan import ELANNet
    bb = ELANNet(arch="tiny")
    vb = bb.init(jax.random.PRNGKey(0), x, False)
    c3, c4, c5 = bb.apply(vb, x, False)
    assert c3.shape == (1, HW // 8, HW // 8, 128)
    assert c5.shape == (1, HW // 32, HW // 32, 256)  # SPPELAN halves 512
    m = ELANFPN(arch="tiny", in_channels=(128, 256, 256))
    v = m.init(jax.random.PRNGKey(0), (c3, c4, c5), False)
    p3, p4, p5 = m.apply(v, (c3, c4, c5), False)
    assert p3.shape == (1, HW // 8, HW // 8, 128)
    assert p5.shape == (1, HW // 32, HW // 32, 512)


def test_elan_fpn_p6_w6(x):
    from tscd_tpu.models.elan import ELANFPNP6, ELANNet
    bb = ELANNet(arch="W6", return_idx=(2, 3, 4, 5))
    vb = bb.init(jax.random.PRNGKey(0), x, False)
    feats = bb.apply(vb, x, False)
    assert [f.shape[1] for f in feats] == [HW // 8, HW // 16, HW // 32,
                                          HW // 64]
    assert feats[3].shape[-1] == 512  # SPPCSPC halves 1024
    m = ELANFPNP6(arch="W6", in_channels=(256, 512, 768, 512))
    v = m.init(jax.random.PRNGKey(0), feats, False)
    outs = m.apply(v, feats, False)
    assert [o.shape[-1] for o in outs] == [256, 512, 768, 1024]
    assert [o.shape[1] for o in outs] == [HW // 8, HW // 16, HW // 32,
                                         HW // 64]


def test_yolov7_model(x):
    m = YOLOv7(num_classes=5, arch="tiny")
    v = m.init(jax.random.PRNGKey(0), x, False, True)
    out = m.apply(v, x, False, True)
    A = (HW // 8) ** 2 + (HW // 16) ** 2 + (HW // 32) ** 2
    assert out["decoded"].shape == (1, A, 10)


def test_yolov8_dfl_decode(x):
    m = YOLOv8(num_classes=5, depth=0.33, width=0.25)
    v = m.init(jax.random.PRNGKey(0), x, False, True)
    out = m.apply(v, x, False, True)
    A = (HW // 8) ** 2 + (HW // 16) ** 2 + (HW // 32) ** 2
    assert out["decoded"].shape == (1, A, 9)   # 4 + C, no obj (v8 style)
    d = np.asarray(out["decoded"])
    assert np.isfinite(d).all()
    assert (d[..., 2] >= 0).all() and (d[..., 3] >= 0).all()  # w,h >= 0
