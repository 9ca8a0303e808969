"""YOLOV / YOLOV++ experiment base (reference: exps/yolov/yolov_base.py —
lframe=0/gframe=16 :72-80 — and exps/yolov++ decoupleReg variants)."""

import os
from typing import Optional

from .tscd_base import Exp as TSCDBaseExp


class Exp(TSCDBaseExp):
    def __init__(self):
        super().__init__()
        self.model_family = "yolov"        # 'yolov' | 'yolov_plus'
        self.lframe = 0
        self.gframe = 16
        self.lframe_val = 0
        self.gframe_val = 32
        self.defualt_p = 30
        self.minimal_limit = 30
        self.reconf = False
        self.decouple_reg = False
        self.agg_type = "msa"
        self.ota_mode = False
        # "MCSP" | "Swin_Tiny" | "Swin_Base" | "Focal"
        # (reference ovis_v++ exps wire swin/focal the same way)
        self.backbone_name = "MCSP"
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]

    def get_model(self):
        from ..models.yolov import YOLOV, YOLOVPlus
        # physical proposal slots: maximal_limit cap if set, else the
        # validity floor, else defualt_p (reference keeps ragged counts;
        # fixed-shape uses the cap as the slot count)
        num_p = self.maximal_limit or self.minimal_limit or self.defualt_p
        if self.model_family == "yolov_plus":
            return YOLOVPlus(
                num_classes=self.num_classes, depth=self.depth,
                width=self.width, act=self.act, depthwise=self.depthwise,
                num_proposals=num_p, heads=self.heads,
                reconf=self.reconf, decouple_reg=self.decouple_reg,
                agg_type=self.agg_type, sim_thresh=self.sim_thresh,
                conf_sim_thresh=self.conf_sim_thresh,
                backbone_name=self.backbone_name)
        return YOLOV(
            num_classes=self.num_classes, depth=self.depth,
            width=self.width, act=self.act, depthwise=self.depthwise,
            num_proposals=num_p, heads=self.heads,
            reconf=self.reconf, sim_thresh=self.sim_thresh,
            backbone_name=self.backbone_name)

    def get_trainer(self, args=None):
        from ..core.yolov_trainer import YOLOVTrainer
        return YOLOVTrainer(self, args)
