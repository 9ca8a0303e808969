"""YOLOV++-Large on ImageNet VID (reference: exps/yolov++ decoupleReg
variants): MCA aggregation, decoupled reg/obj branch, OTA refined
labels."""

import os

from tscd_tpu.exp.yolov_base import Exp as YolovBaseExp


class Exp(YolovBaseExp):
    def __init__(self):
        super().__init__()
        self.model_family = "yolov_plus"
        self.depth = 1.0
        self.width = 1.0
        self.lframe = 4
        self.gframe = 12
        self.lframe_val = 1
        self.gframe_val = 31
        self.reconf = True
        self.decouple_reg = True
        self.agg_type = "mca"
        self.ota_mode = True
        self.minimal_limit = 50
        self.exp_name = "v_plus_large"
