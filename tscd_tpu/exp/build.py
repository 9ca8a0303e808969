"""Exp loading by file path or name (reference: yolox/exp/build.py:27)."""

import importlib
import os
import sys


def get_exp_by_file(exp_file: str):
    sys.path.insert(0, os.path.dirname(os.path.abspath(exp_file)))
    module_name = os.path.splitext(os.path.basename(exp_file))[0]
    if module_name in sys.modules:
        del sys.modules[module_name]
    current_exp = importlib.import_module(module_name)
    return current_exp.Exp()


def get_exp_by_name(exp_name: str):
    name = exp_name.replace("-", "_")
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    candidates = {
        "yolox_s": "exps/default/yolox_s.py",
        "yolox_m": "exps/default/yolox_m.py",
        "yolox_l": "exps/default/yolox_l.py",
        "yolox_x": "exps/default/yolox_x.py",
        "yolox_tiny": "exps/default/yolox_tiny.py",
        "yolox_nano": "exps/default/yolox_nano.py",
        "vid_tscd_large": "exps/TSCD_VID/vid_tscd_large.py",
        "ovis_tscd_base": "exps/TSCD_OVIS/ovis_tscd_base.py",
        "ovis_tscd_large": "exps/TSCD_OVIS/ovis_tscd_large.py",
    }
    if name not in candidates:
        raise ValueError(f"unknown exp name {exp_name}")
    return get_exp_by_file(os.path.join(repo, candidates[name]))


def get_exp(exp_file=None, exp_name=None):
    assert exp_file is not None or exp_name is not None, \
        "please provide exp file or exp name"
    if exp_file is not None:
        return get_exp_by_file(exp_file)
    return get_exp_by_name(exp_name)
