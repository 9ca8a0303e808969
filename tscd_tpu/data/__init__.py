from .coco import BatchLoader, COCODataset, MosaicDetection
from .transforms import (TrainTransform, ValTransform, VidValTransform,
                         letterbox)
from .vid import (VID_CLASSES, ArgoverseVideoDataset, OVISVideoDataset,
                  VIDDataset, WindowLoader, build_sequences,
                  collate_window, multiscale_resize)
from .voc import VOC_CLASSES, ArgoverseDataset, VOCDetection, voc_eval

__all__ = [
    "BatchLoader", "COCODataset", "MosaicDetection", "TrainTransform",
    "ValTransform", "VidValTransform", "letterbox", "VID_CLASSES",
    "OVISVideoDataset", "ArgoverseVideoDataset", "VIDDataset", "WindowLoader", "build_sequences",
    "collate_window", "multiscale_resize", "VOC_CLASSES", "ArgoverseDataset", "VOCDetection",
    "voc_eval",
]
