from .boxes import (
    bboxes_iou,
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    pairwise_iou_xyxy,
    generalized_box_iou,
)
from .nms import nms_fixed, batched_class_aware_nms
