from .coco import BatchLoader, COCODataset, MosaicDetection
from .transforms import (TrainTransform, ValTransform, VidValTransform,
                         letterbox)
from .vid import (VID_CLASSES, OVISVideoDataset, VIDDataset, WindowLoader,
                  build_sequences, collate_window)
from .voc import VOC_CLASSES, ArgoverseDataset, VOCDetection, voc_eval

__all__ = [
    "BatchLoader", "COCODataset", "MosaicDetection", "TrainTransform",
    "ValTransform", "VidValTransform", "letterbox", "VID_CLASSES",
    "OVISVideoDataset", "VIDDataset", "WindowLoader", "build_sequences",
    "collate_window", "VOC_CLASSES", "ArgoverseDataset", "VOCDetection",
    "voc_eval",
]
