"""TSCD-Base (S-scale) on OVIS (reference: exps/TSCD_OVIS/tscd_base.py +
ovis_tscd_base.py): depth 0.33 / width 0.5, 25 classes,
lframe=4/gframe=12 train, lframe=8/gframe=24 eval."""

import os

from tscd_tpu.exp.tscd_base import Exp as TSCDBaseExp


class Exp(TSCDBaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.num_classes = 25
        self.dataset_name = "ovis"
        self.lframe = 4
        self.gframe = 12
        self.lframe_val = 8
        self.gframe_val = 24
        self.data_dir = "./datasets/OVIS"
        self.ovis_train_json = "./datasets/OVIS/annotations_train.json"
        self.ovis_val_json = "./datasets/OVIS/annotations_valid.json"
        self.ovis_name = "train"
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
