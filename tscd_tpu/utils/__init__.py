from .debug_vis import attention_heatmap, feature_grid, visual_predictions
from .demo_utils import demo_postprocess, multiclass_nms, nms_numpy
from .convert import load_torch_checkpoint, torch_to_flax
from .logger import Logger, MetricsLogger, setup_logger
from .metric import AverageMeter, MeterBuffer, gpu_mem_usage_mb
from .model_utils import (count_params, fuse_conv_bn_params,
                          fused_batch_stats, get_model_info)
from .profiler import annotate, device_timer, sync, trace
from .visualize import vis

__all__ = [
    "attention_heatmap", "feature_grid", "visual_predictions",
    "demo_postprocess", "multiclass_nms", "nms_numpy",
    "load_torch_checkpoint", "torch_to_flax", "Logger", "MetricsLogger",
    "setup_logger", "AverageMeter", "MeterBuffer", "gpu_mem_usage_mb",
    "count_params", "fuse_conv_bn_params", "fused_batch_stats",
    "get_model_info", "annotate", "device_timer", "sync", "trace", "vis",
]
