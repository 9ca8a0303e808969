"""YOLOX-S still-image fine-tune on OVIS frames (reference:
exps/ovis_default/ovis_yolox_s.py — stage 1 of the 2-stage recipe)."""

import os

from tscd_tpu.exp.yolox_base import Exp as BaseExp


class Exp(BaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.5
        self.num_classes = 25
        self.data_dir = "./datasets/OVIS"
        self.train_ann = "annotations_train.json"
        self.val_ann = "annotations_valid.json"
        self.train_name = "train"
        self.val_name = "train"
        self.max_epoch = 7
        self.no_aug_epochs = 2
        self.warmup_epochs = 1
        self.seed = 2024
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]

    def get_dataset(self, cache: bool = False):
        from tscd_tpu.data.coco import COCODataset
        return COCODataset(
            json_file=os.path.join(self.data_dir, self.train_ann),
            data_dir=self.data_dir, name=self.train_name,
            img_size=self.input_size)

    def get_eval_dataset(self):
        from tscd_tpu.data.coco import COCODataset
        return COCODataset(
            json_file=os.path.join(self.data_dir, self.val_ann),
            data_dir=self.data_dir, name=self.val_name,
            img_size=self.test_size)
