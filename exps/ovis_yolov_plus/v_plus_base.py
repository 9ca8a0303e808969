"""YOLOV++ base config for OVIS (reference:
exps/ovis_yolov_plus/v_plus_base.py — the OVIS v++ base class:
num_classes=25, depth/width 1.0, gframe-only windows, the standard
proposal knobs defualt_p=30 / sim_thresh=0.75 / pre_nms=0.75 /
defualt_pre=750)."""

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
        self.agg_type = "localagg"
        self.decouple_reg = False
        self.defualt_p = 30
        self.sim_thresh = 0.75
        self.pre_nms = 0.75
        self.defualt_pre = 750
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
