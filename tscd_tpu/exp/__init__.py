from .base_exp import BaseExp
from .build import get_exp, get_exp_by_file, get_exp_by_name
from .tscd_base import Exp as TSCDExp
from .yolox_base import Exp

__all__ = ["BaseExp", "Exp", "TSCDExp", "get_exp", "get_exp_by_file",
           "get_exp_by_name"]
