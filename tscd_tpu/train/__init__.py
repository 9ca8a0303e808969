from .checkpoint import load_checkpoint, load_tolerant, save_checkpoint
from .ema import ema_init, ema_update
from .losses import bce_with_logits, tscd_loss, yolov_loss, yolox_loss
from .lr import cos_lr, multistep_lr, warm_cos_lr, yolox_warm_cos_lr
from .optim import build_sgd
from .step import (TrainState, init_train_state, jit_sharded_step,
                   make_tscd_train_step, make_yolox_train_step)

__all__ = [
    "load_checkpoint", "load_tolerant", "save_checkpoint", "ema_init",
    "ema_update", "bce_with_logits", "tscd_loss", "yolov_loss",
    "yolox_loss", "cos_lr", "multistep_lr", "warm_cos_lr",
    "yolox_warm_cos_lr", "build_sgd", "TrainState", "init_train_state",
    "jit_sharded_step", "make_tscd_train_step", "make_yolox_train_step",
]
