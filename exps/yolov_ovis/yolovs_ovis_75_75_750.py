"""YOLOV-S on OVIS (reference: exps/yolov_ovis/yolovs_ovis_75_75_750.py
— sim_thresh 0.75 / pre_nms 0.75 / defualt_pre 750, 640x960 input,
lr 0.001/64, nms 0.5)."""

import os

from tscd_tpu.exp.yolov_base import Exp as YolovBaseExp


class Exp(YolovBaseExp):
    def __init__(self):
        super().__init__()
        self.model_family = "yolov"
        self.depth = 0.33
        self.width = 0.5
        self.num_classes = 25
        self.dataset_name = "ovis"
        self.data_dir = "./datasets/OVIS"
        self.ovis_train_json = "./datasets/OVIS/annotations_train.json"
        self.ovis_val_json = "./datasets/OVIS/annotations_valid.json"
        self.ovis_name = "train"
        self.input_size = (640, 960)
        self.test_size = (640, 960)
        self.sim_thresh = 0.75
        self.pre_nms = 0.75
        self.defualt_pre = 750
        self.max_epoch = 7
        self.no_aug_epochs = 2
        self.warmup_epochs = 1
        self.eval_interval = 1
        self.min_lr_ratio = 0.05
        self.basic_lr_per_img = 0.001 / 64.0
        self.test_conf = 0.001
        self.nmsthre = 0.5
        self.perspective = 0.0
        self.drop_rate = 0.0
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
