from .coco_api import COCO
from .coco_evaluator import COCOEvaluator, per_class_table
from .cocoeval import COCOeval
from .fast_cocoeval import COCOeval_opt
from .vid_evaluator import OVIS_CLASSES, OVISEvaluator, VIDEvaluator
from .voc_evaluator import VOCEvaluator

__all__ = ["COCO", "COCOEvaluator", "per_class_table", "COCOeval",
           "COCOeval_opt", "OVIS_CLASSES", "OVISEvaluator",
           "VIDEvaluator", "VOCEvaluator"]
