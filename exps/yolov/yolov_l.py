"""YOLOV-L on ImageNet VID (reference: exps/yolov/yolov_l.py)."""

import os

from tscd_tpu.exp.yolov_base import Exp as YolovBaseExp


class Exp(YolovBaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
