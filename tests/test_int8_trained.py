"""int8 serving accuracy on TRAINED weights — the strongest accuracy
evidence available in this environment (no real checkpoints): train the
tiny synthetic-COCO YOLOX to AP50 ~1.0, then evaluate the SAME weights
through the int8 w8a8 path (dynamic and static-calibrated scales) and
bound the mAP drop.

INT8_MIN_CIN is lowered for the tiny (width 0.125) model so its convs
actually quantize; production models hit the default gate at C>=128.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from test_e2e_still import _make_coco


@pytest.mark.slow
def test_int8_map_on_trained_weights(tmp_path):
    import jax
    import jax.numpy as jnp

    import tscd_tpu.models.blocks as blocks
    from tscd_tpu.exp import get_exp
    from tscd_tpu.models.blocks import int8_eval

    root = _make_coco(str(tmp_path / "coco"))
    exp_file = tmp_path / "tiny_int8_exp.py"
    exp_file.write_text(f"""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 2
        self.input_size = self.test_size = (96, 128)
        self.batch_size = 8
        self.max_epoch = 150
        self.no_aug_epochs = 100
        self.eval_interval = 1000
        self.basic_lr_per_img = 0.25 / 64
        self.warmup_epochs = 5
        self.data_dir = {root!r}
        self.train_name = self.val_name = "train2017"
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_int8_e2e"
        self.enable_mixup = False
        self.mosaic_prob = 0.0
        self.flip_prob = 0.0
        self.seed = 0
""")
    exp = get_exp(str(exp_file))
    trainer = exp.get_trainer(None)
    state = trainer.train()
    variables = {"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats}
    evaluator = exp.get_evaluator()

    res_fp = evaluator.evaluate(trainer.make_predict_fn(variables))
    assert res_fp["AP50"] > 0.85, "training failed; bound would be vacuous"

    old = (blocks.INT8_MIN_CIN, blocks.INT8_MIN_CIN_STATIC)
    blocks.INT8_MIN_CIN = blocks.INT8_MIN_CIN_STATIC = 16
    try:
        with int8_eval():
            res_dyn = evaluator.evaluate(
                trainer.make_predict_fn(variables))

        # static path: calibrate on two in-distribution images
        calib_imgs = np.full((2, 96, 128, 3), 80, np.float32)
        calib_imgs[0, 10:40, 15:55] = 255
        calib_imgs[1, 20:50, 30:70] = 255
        model = trainer.model

        @jax.jit
        def calib(v, x):
            _, muts = model.apply(v, x, False, True, mutable=["quant"])
            return muts

        with int8_eval(calibrate=True):
            muts = calib(variables, jnp.asarray(calib_imgs))
        vq = {**variables, "quant": muts["quant"]}
        with int8_eval(static=True):
            res_st = evaluator.evaluate(trainer.make_predict_fn(vq))
    finally:
        blocks.INT8_MIN_CIN, blocks.INT8_MIN_CIN_STATIC = old

    for name, res in (("dynamic", res_dyn), ("static", res_st)):
        assert res["AP50"] >= res_fp["AP50"] - 0.05, (
            f"int8 {name} AP50 {res['AP50']} vs fp {res_fp['AP50']}")
        assert abs(res["mAP"] - res_fp["mAP"]) < 0.05, (
            f"int8 {name} mAP {res['mAP']} vs fp {res_fp['mAP']}")
