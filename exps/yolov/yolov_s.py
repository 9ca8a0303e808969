"""YOLOV-S on ImageNet VID (reference: exps/yolov/yolov_s.py)."""

import os

from tscd_tpu.exp.yolov_base import Exp as YolovBaseExp


class Exp(YolovBaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
