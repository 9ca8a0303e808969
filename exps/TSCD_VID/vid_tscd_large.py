"""TSCD-Large on ImageNet VID (reference: exps/TSCD_VID/vid_tscd_large.py).

depth/width 1.0, lframe=4/gframe=12 train windows, lframe=1/gframe=31
eval, ota_mode refined labels, MCA aggregation, decoupled reg, fixed
50-slot proposals, seed 2024.
"""

import os

from tscd_tpu.exp.tscd_base import Exp as TSCDBaseExp


class Exp(TSCDBaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.num_classes = 30
        self.dataset_name = "vid"
        self.lframe = 4
        self.gframe = 12
        self.lframe_val = 1
        self.gframe_val = 31
        self.ota_mode = True
        self.reconf = True
        self.agg_type = "mca"
        self.decouple_reg = True
        self.use_pre_nms = False
        self.cat_ota_fg = False
        self.minimal_limit = 50
        self.seed = 2024
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
