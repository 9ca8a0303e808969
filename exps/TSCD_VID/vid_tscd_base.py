"""TSCD-Base on ImageNet VID (reference: exps/TSCD_VID/vid_tscd_base.py).

depth 0.33 / width 0.5, otherwise the TSCD-Large recipe: lframe=4 /
gframe=12 training windows, lframe=1 / gframe=31 eval, ota_mode refined
labels, MCA aggregation, decoupled reg. The reference sets
minimal_limit=0 (unbounded proposal counts, :42); the fixed-shape build
keeps 50 physical slots — the same floor TSCD-Large pins — so crowded
frames cap at 50 (see tscd_tpu/exp/tscd_base.py maximal_limit notes).
"""

import os

from tscd_tpu.exp.tscd_base import Exp as TSCDBaseExp


class Exp(TSCDBaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.5
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
        self.warmup_epochs = 0
        self.no_aug_epochs = 2
        self.eval_interval = 1
        self.stem_lr_ratio = 0.1
        self.seed = 2024
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
