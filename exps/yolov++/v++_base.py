"""YOLOV++-Base on ImageNet VID (reference: exps/yolov++/v++_base.py).

depth 0.33 / width 0.5, gframe-only windows (lframe=0/gframe=16 train,
0/32 eval), OTA refined labels, reconf on, single (non-decoupled)
aggregator with the localagg default (v_plus_head.py:84 kwargs default).
"""

import os

from tscd_tpu.exp.yolov_base import Exp as YolovBaseExp


class Exp(YolovBaseExp):
    def __init__(self):
        super().__init__()
        self.model_family = "yolov_plus"
        self.depth = 0.33
        self.width = 0.5
        self.num_classes = 30
        self.dataset_name = "vid"
        self.lframe = 0
        self.gframe = 16
        self.lframe_val = 0
        self.gframe_val = 32
        self.reconf = True
        self.ota_mode = True
        self.agg_type = "localagg"   # reference kwargs default
        self.decouple_reg = False
        self.warmup_epochs = 0
        self.no_aug_epochs = 2
        self.eval_interval = 1
        self.stem_lr_ratio = 0.1
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
