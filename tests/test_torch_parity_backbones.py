"""Numerical torch parity for the alternate backbones (VERDICT r4
next #2): Swin, FocalNet, ResNet vs the reference modules
(yolox/models/swin_transfomer.py:457, focal.py:336, resnet.py:11),
random reference weights pushed through
tscd_tpu.utils.convert.backbone_to_flax, plus one composed
Swin->PAFPN neck forward (yolo_pafpn.py:120 YOLOPAFPN_Swin).

Small configs keep CPU time sane while still exercising every parity
risk: shifted-window attention + mask, relative-position tables,
PatchMerging, per-out-index norms (swin); conv-embed stem, postln,
layerscale, gated focal aggregation (focalnet); the reference's
act-before-add bottleneck + BaseConv stem (resnet).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

REF = "/root/reference/yolox/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")

TOL = dict(rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def ref():
    import refpkg

    class Mods:
        swin = refpkg.load("yolox.models.swin_transfomer")
        focal = refpkg.load("yolox.models.focal")
        resnet = refpkg.load("yolox.models.resnet")
        pafpn = refpkg.load("yolox.models.yolo_pafpn")

    return Mods


def t2n(x):
    return x.detach().cpu().numpy()


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def sd_np(tm):
    return {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


# --------------------------------------------------------------- swin


def test_swin_parity(ref, rng):
    """Small Swin (window 4, 4 stages) so stage-3 hits the exact-window
    + shifted-mask path on CPU-sized inputs."""
    import jax.numpy as jnp

    from tscd_tpu.models.swin import SwinTransformer
    from tscd_tpu.utils.convert import backbone_to_flax

    tm = ref.swin.SwinTransformer(
        embed_dim=32, depths=[2, 2, 2, 2], num_heads=[2, 2, 4, 4],
        window_size=4, out_indices=(1, 2, 3), drop_path_rate=0.0)
    tm.init_weights()
    tm.eval()

    x = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(nchw(x))

    fm = SwinTransformer(embed_dim=32, depths=(2, 2, 2, 2),
                         num_heads=(2, 2, 4, 4), window_size=4)
    variables = backbone_to_flax(sd_np(tm), "swin")
    got = fm.apply({"params": variables["params"]}, jnp.asarray(x))

    for i, name in ((1, "dark3"), (2, "dark4"), (3, "dark5")):
        w = t2n(want[i]).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got[name]), w, **TOL)


def test_swin_window7_shift_parity(ref, rng):
    """The production window size (7) with non-divisible maps, so the
    pad-to-window + shift-mask math is pinned at reference config."""
    import jax.numpy as jnp

    from tscd_tpu.models.swin import SwinTransformer
    from tscd_tpu.utils.convert import backbone_to_flax

    tm = ref.swin.SwinTransformer(
        embed_dim=32, depths=[2, 2], num_heads=[2, 4],
        window_size=7, out_indices=(0, 1), drop_path_rate=0.0)
    tm.init_weights()
    tm.eval()

    x = rng.uniform(0, 255, (1, 96, 96, 3)).astype(np.float32)  # 24x24, 12x12
    with torch.no_grad():
        want = tm(nchw(x))

    fm = SwinTransformer(embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                         window_size=7, out_indices=(0, 1))
    variables = backbone_to_flax(sd_np(tm), "swin")
    got = fm.apply({"params": variables["params"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got["dark2"]),
                               t2n(want[0]).transpose(0, 2, 3, 1), **TOL)
    np.testing.assert_allclose(np.asarray(got["dark3"]),
                               t2n(want[1]).transpose(0, 2, 3, 1), **TOL)


# ----------------------------------------------------------- focalnet


def test_focalnet_parity(ref, rng):
    """Reference TSCD focal config options: conv-embed stem, postln,
    layerscale, focal_levels=4 / windows=3 (ovis_tscd_base.py:85-99)."""
    import jax.numpy as jnp

    from tscd_tpu.models.focalnet import FocalNet
    from tscd_tpu.utils.convert import backbone_to_flax

    kw = dict(embed_dim=32, depths=[1, 1, 2, 1],
              focal_levels=[4, 4, 4, 4], focal_windows=[3, 3, 3, 3],
              use_conv_embed=True, use_postln=True, use_layerscale=True,
              out_indices=(1, 2, 3))
    tm = ref.focal.FocalNet(drop_path_rate=0.0, **kw)
    tm.init_weights()
    # layerscale gammas init at 1e-4, which crushes the signal on random
    # weights; bump them so a wrong gamma wiring is actually visible
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if "gamma" in n:
                p.copy_(torch.rand_like(p))
    tm.eval()

    x = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(nchw(x))

    fm = FocalNet(**{k: tuple(v) if isinstance(v, list) else v
                     for k, v in kw.items()})
    variables = backbone_to_flax(sd_np(tm), "focalnet")
    got = fm.apply({"params": variables["params"]}, jnp.asarray(x))
    for i, name in ((1, "dark3"), (2, "dark4"), (3, "dark5")):
        w = t2n(want[i]).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got[name]), w, **TOL)


def test_focalnet_default_config_parity(ref, rng):
    """The reference class defaults (plain 4x4 patch embed, pre-LN,
    no layerscale, levels 3/windows 3)."""
    import jax.numpy as jnp

    from tscd_tpu.models.focalnet import FocalNet
    from tscd_tpu.utils.convert import backbone_to_flax

    tm = ref.focal.FocalNet(embed_dim=32, depths=[1, 1, 1, 1],
                            drop_path_rate=0.0, out_indices=(1, 2, 3))
    tm.init_weights()
    tm.eval()
    x = rng.uniform(0, 255, (1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(nchw(x))
    fm = FocalNet(embed_dim=32, depths=(1, 1, 1, 1))
    variables = backbone_to_flax(sd_np(tm), "focalnet")
    got = fm.apply({"params": variables["params"]}, jnp.asarray(x))
    for i, name in ((1, "dark3"), (2, "dark4"), (3, "dark5")):
        w = t2n(want[i]).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got[name]), w, **TOL)


# ------------------------------------------------------------- resnet


def test_resnet50_parity(ref, rng):
    import jax.numpy as jnp

    from tscd_tpu.models.resnet import ResNet
    from tscd_tpu.utils.convert import backbone_to_flax

    tm = ref.resnet.ResNet(depth=50,
                           out_features=("stage3", "stage4", "stage5"))
    tm.eval()
    # randomize BN running stats so eval-mode normalization is actually
    # checked (fresh stats are mean 0 / var 1 == identity-ish)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.75)

    x = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(nchw(x))

    fm = ResNet(50)
    variables = backbone_to_flax(sd_np(tm), "resnet")
    got = fm.apply(variables, jnp.asarray(x), False)
    for tname, name in (("stage3", "dark3"), ("stage4", "dark4"),
                        ("stage5", "dark5")):
        w = t2n(want[tname]).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got[name]), w, **TOL)


# ----------------------------------------------- composed swin + neck


def test_swin_pafpn_composed_parity(ref, rng):
    """Full YOLOPAFPN_Swin (yolo_pafpn.py:120): swin backbone feeding
    the CSP neck directly (no projections), converted end-to-end."""
    import jax.numpy as jnp
    from flax import linen as nn
    from flax.core import unfreeze

    from tscd_tpu.models.pafpn_variants import PAFPNNeck
    from tscd_tpu.models.swin import SwinTransformer
    from tscd_tpu.utils.convert import backbone_to_flax, torch_to_flax

    tm = ref.pafpn.YOLOPAFPN_Swin(
        width=1.0, depth=0.34, swin_width=1.0, in_features=(1, 2, 3),
        in_channels=[64, 128, 256], out_channels=[64, 128, 256],
        swin_depth=[2, 2, 2, 2], num_heads=[2, 2, 4, 4], base_dim=32,
        window_size=4, act="silu")
    tm.backbone.init_weights()
    tm.eval()

    x = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = [t2n(o).transpose(0, 2, 3, 1) for o in tm(nchw(x))]

    class Composed(nn.Module):
        @nn.compact
        def __call__(self, xx, train=False):
            feats = SwinTransformer(embed_dim=32, depths=(2, 2, 2, 2),
                                    num_heads=(2, 2, 4, 4), window_size=4,
                                    name="backbone")(xx, train)
            return PAFPNNeck([64, 128, 256], depth=0.34, act="silu",
                             name="neck")(feats["dark3"], feats["dark4"],
                                          feats["dark5"], train)

    sd = sd_np(tm)
    back = backbone_to_flax(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, "swin", prefix=("backbone",))
    neck = torch_to_flax({f"neck.{k}": v for k, v in sd.items()
                          if not k.startswith("backbone.")})
    params = {**unfreeze(back["params"]), **unfreeze(neck["params"])}
    variables = {"params": params, "batch_stats": neck["batch_stats"]}

    got = Composed().apply(variables, jnp.asarray(x), False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, **TOL)
