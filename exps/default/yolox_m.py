"""YOLOX-M on COCO (reference: exps/default/yolox_m.py)."""

import os

from tscd_tpu.exp.yolox_base import Exp as BaseExp


class Exp(BaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.67
        self.width = 0.75
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
