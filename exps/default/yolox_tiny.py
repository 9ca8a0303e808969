"""YOLOX-Tiny on COCO (reference: exps/default/yolox_tiny.py)."""

import os

from tscd_tpu.exp.yolox_base import Exp as BaseExp


class Exp(BaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.375
        self.input_size = (416, 416)
        self.test_size = (416, 416)
        self.mosaic_scale = (0.5, 1.5)
        self.enable_mixup = False
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
