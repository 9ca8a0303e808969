
import os
from tscd_tpu.exp.tscd_base import Exp as B


class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.heads = 4
        self.defualt_p = 6
        self.minimal_limit = 6
        self.maximal_limit = 6
        self.lframe_val, self.gframe_val = 1, 3
        self.input_size = self.test_size = (128, 128)
        self.data_dir = 'YOLOX_outputs/validate_ref/vid'
        self.val_seq_path = os.path.join('YOLOX_outputs/validate_ref/vid', "val_seq.npy")
        self.output_dir = 'YOLOX_outputs/validate_ref/out'
        self.exp_name = "validate_selftest"
        self.fix_bn = False
        self.seed = 0
