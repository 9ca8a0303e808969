from .trainer import Trainer
from .tscd_trainer import TSCDTrainer
from .yolov_trainer import YOLOVTrainer

__all__ = ["Trainer", "TSCDTrainer", "YOLOVTrainer"]
