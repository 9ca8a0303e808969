"""YOLOX-X on COCO (reference: exps/default/yolox_x.py)."""

import os

from tscd_tpu.exp.yolox_base import Exp as BaseExp


class Exp(BaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.33
        self.width = 1.25
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
