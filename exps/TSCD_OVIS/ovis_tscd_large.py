"""TSCD-Large on OVIS (reference: exps/TSCD_OVIS/ovis_tscd_large.py)."""

import os

from ovis_tscd_base import Exp as OvisBaseExp


class Exp(OvisBaseExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
