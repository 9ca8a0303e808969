"""Still-image YOLOX-L fine-tune on OVIS frames at 640x960 (reference:
exps/yolov_ovis/yoloxl_ovis.py — stage 1 of the OVIS YOLOV recipe)."""

import os

from tscd_tpu.exp.yolox_base import Exp as BaseExp


class Exp(BaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.num_classes = 25
        self.data_dir = "./datasets/OVIS"
        self.train_ann = "annotations_train.json"
        self.val_ann = "annotations_valid.json"
        self.train_name = "train"
        self.val_name = "train"
        self.input_size = (640, 960)
        self.test_size = (640, 960)
        self.max_epoch = 10
        self.no_aug_epochs = 2
        self.warmup_epochs = 1
        self.eval_interval = 1
        self.min_lr_ratio = 0.05
        self.basic_lr_per_img = 0.001 / 64.0
        self.test_conf = 0.001
        self.nmsthre = 0.5
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
