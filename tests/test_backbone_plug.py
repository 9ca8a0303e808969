"""Pluggable backbones for the video models (reference wiring:
exps/TSCD_OVIS/ovis_tscd_base.py:55-99 backbone_name -> MCSP / Swin /
Focal): the factory mapping, an end-to-end TSCD-on-Swin forward, and
the exp knob reaching the model."""

import numpy as np
import pytest

from tscd_tpu.models.pafpn_variants import (YOLOPAFPN_Focal,
                                            YOLOPAFPN_Swin,
                                            build_pafpn_backbone)


def test_factory_mapping():
    from tscd_tpu.models.pafpn import YOLOPAFPN

    m = build_pafpn_backbone("MCSP", 0.33, 0.25)
    assert isinstance(m, YOLOPAFPN)
    m = build_pafpn_backbone("Swin_Tiny", 0.33, 1.0)
    assert isinstance(m, YOLOPAFPN_Swin)
    assert m.variant == "tiny" and tuple(m.out_channels) == (192, 384, 768)
    m = build_pafpn_backbone("Swin_Base", 0.33, 1.0)
    assert m.variant == "base" and tuple(m.out_channels) == (256, 512, 1024)
    m = build_pafpn_backbone("Focal", 0.33, 1.0)
    assert isinstance(m, YOLOPAFPN_Focal)
    assert m.variant == "focalnet_tscd"
    with pytest.raises(ValueError):
        build_pafpn_backbone("ViT", 1.0, 1.0)


@pytest.mark.slow
def test_tscd_on_swin_forward(rng):
    """Full TSCD video forward with a Swin backbone (the reference's
    Swin_Tiny TSCD wiring), small head width for CPU time."""
    import jax
    import jax.numpy as jnp

    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    F, H, W = 2, 64, 64
    model = TSCD(num_classes=5, depth=0.33, width=0.25, num_proposals=8,
                 heads=2, backbone_name="Swin_Tiny")
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, te, 1, F - 1)
    out = model.apply(variables, x, te, 1, F - 1, False)
    assert out["refined_boxes"].shape[-2:] == (8, 4)
    assert np.isfinite(np.asarray(out["refined_cls_logits"])).all()
    # the swin tree is really under the backbone
    assert "backbone" in variables["params"]["backbone"]
    assert any(k.startswith("layer0_block")
               for k in variables["params"]["backbone"]["backbone"])


def test_exp_knob_reaches_model(tmp_path):
    exp_file = tmp_path / "swin_exp.py"
    exp_file.write_text("""
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.backbone_name = "Swin_Tiny"
        self.depth, self.width = 0.33, 0.25
        self.minimal_limit = 8
        self.heads = 2
""")
    from tscd_tpu.exp import get_exp

    exp = get_exp(str(exp_file))
    model = exp.get_model()
    assert model.backbone_name == "Swin_Tiny"
    # CLI-style override path too (argparse opts)
    exp2 = get_exp(str(exp_file))
    exp2.merge(["backbone_name", "Focal"])
    assert exp2.get_model().backbone_name == "Focal"
