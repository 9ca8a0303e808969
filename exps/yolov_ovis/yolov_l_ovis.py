"""YOLOV-L on OVIS (reference: exps/yolov_ovis)."""

import os

from tscd_tpu.exp.yolov_base import Exp as YolovBaseExp


class Exp(YolovBaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.num_classes = 25
        self.dataset_name = "ovis"
        self.data_dir = "./datasets/OVIS"
        self.ovis_train_json = "./datasets/OVIS/annotations_train.json"
        self.ovis_val_json = "./datasets/OVIS/annotations_valid.json"
        self.ovis_name = "train"
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
