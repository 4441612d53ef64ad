"""Device-side geometry + post-processing ops (the framework's kernel library)."""

from demonet_tpu.ops.boxes import (  # noqa: F401
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
    generalized_box_iou,
    masks_to_boxes,
    remove_small_boxes_mask,
)
from demonet_tpu.ops.nms import batched_nms, nms, nms_mask  # noqa: F401
