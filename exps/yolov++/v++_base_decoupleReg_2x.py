"""YOLOV++-Base decoupleReg, 2x schedule (reference:
exps/yolov++/v++_base_decoupleReg_2x.py — same config with
max_epoch=14 and maximal_limit=0)."""

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
        self.minimal_limit = 0       # slots fall back to defualt_p
        self.maximal_limit = 0
        self.max_epoch = 14          # the 2x schedule
        self.warmup_epochs = 0
        self.no_aug_epochs = 2
        self.eval_interval = 1
        self.stem_lr_ratio = 0.1
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
