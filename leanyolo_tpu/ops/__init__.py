from .anchors import bbox2dist, dist2bbox, make_anchors
from .boxes import (
    box_area,
    box_ciou_pairwise,
    box_iou,
    box_xywh_to_xyxy,
    box_xyxy_to_xywh,
    nms_fixed,
    scale_coords,
    unletterbox_coords,
)

__all__ = [
    "make_anchors",
    "dist2bbox",
    "bbox2dist",
    "box_xywh_to_xyxy",
    "box_xyxy_to_xywh",
    "box_area",
    "box_iou",
    "box_ciou_pairwise",
    "nms_fixed",
    "scale_coords",
    "unletterbox_coords",
]
