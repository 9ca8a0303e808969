from .build import create_model, create_yolox_model
from .blocks import BaseConv, Bottleneck, CSPLayer, DWConv, Focus, SPPBottleneck
from .darknet import CSPDarknet, Darknet
from .decoder import TransformerDecoder, set_criterion
from .elan import ELANFPN, ELANNet, RepConv, YOLOv7
from .focalnet import FocalNet, build_focalnet
from .pafpn import YOLOPAFPN
from .pafpn_p6 import CSPDarknetP6, YOLOPAFPNP6
from .pafpn_variants import (YOLOFPN, PAFPNNeck, YOLOPAFPN_Focal,
                             YOLOPAFPN_ResNet, YOLOPAFPN_Swin)
from .resnet import ResNet
from .swin import SwinTransformer, swin_base, swin_small, swin_tiny
from .tscd import TSCD, tscd_eval_postprocess
from .tscd_head import TSCDHead
from .yolo_head import YOLOXHead
from .yolov import YOLOV, YOLOVOnline, YOLOVPlus, yolov_eval_postprocess
from .yolov8 import YOLOv8, YOLOv8Head, YOLOv8PAFPN
from .yolox import YOLOX

__all__ = [
    "create_model", "create_yolox_model",
    "BaseConv", "Bottleneck", "CSPLayer", "DWConv", "Focus",
    "SPPBottleneck", "CSPDarknet", "Darknet", "TransformerDecoder",
    "set_criterion", "ELANFPN", "ELANNet", "RepConv", "YOLOv7",
    "FocalNet", "build_focalnet", "YOLOPAFPN", "CSPDarknetP6",
    "YOLOPAFPNP6", "YOLOFPN", "PAFPNNeck", "YOLOPAFPN_Focal",
    "YOLOPAFPN_ResNet", "YOLOPAFPN_Swin", "ResNet", "SwinTransformer",
    "swin_base", "swin_small", "swin_tiny", "TSCD",
    "tscd_eval_postprocess", "TSCDHead", "YOLOXHead", "YOLOV",
    "YOLOVOnline", "YOLOVPlus", "yolov_eval_postprocess", "YOLOv8",
    "YOLOv8Head", "YOLOv8PAFPN", "YOLOX",
]
