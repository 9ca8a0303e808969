"""YOLOV++-Large decoupleReg on OVIS (reference:
exps/ovis_yolov_plus/ovis_v++_large_decoupleReg.py — the base
decoupleReg OVIS config at depth/width 1.0)."""

import os

from tscd_tpu.exp.yolov_base import Exp as YolovBaseExp


class Exp(YolovBaseExp):
    def __init__(self):
        super().__init__()
        self.model_family = "yolov_plus"
        self.depth = 1.0
        self.width = 1.0
        self.num_classes = 25
        self.dataset_name = "ovis"
        self.data_dir = "./datasets/OVIS"
        self.ovis_train_json = "./datasets/OVIS/annotations_train.json"
        self.ovis_val_json = "./datasets/OVIS/annotations_valid.json"
        self.ovis_name = "train"
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
        self.minimal_limit = 50
        self.maximal_limit = 500     # physical slots for crowded OVIS
        self.conf_sim_thresh = 0.99
        self.warmup_epochs = 0
        self.no_aug_epochs = 2
        self.eval_interval = 1
        self.stem_lr_ratio = 0.1
        self.seed = 2024
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
