from .trainer import Trainer
from .tscd_trainer import TSCDTrainer

__all__ = ["Trainer", "TSCDTrainer"]
