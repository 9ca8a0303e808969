"""YOLOV++-Base decoupleReg on ImageNet VID (reference:
exps/yolov++/v++_base_decoupleReg.py).

MSA aggregation with a second decoupled aggregator for the obj branch.
The reference sets minimal_limit=0 (unbounded); fixed-shape keeps the
defualt_p=30 slots (see tscd_tpu/exp/yolov_base.py num_p fallback).
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
        self.use_pre_nms = False
        self.cat_ota_fg = False
        self.agg_type = "msa"
        self.decouple_reg = True
        self.minimal_limit = 0       # ref :31 — slots fall back to defualt_p
        self.warmup_epochs = 0
        self.no_aug_epochs = 2
        self.eval_interval = 1
        self.stem_lr_ratio = 0.1
        self.seed = 2024
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
