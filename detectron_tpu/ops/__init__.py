"""On-device detection ops: box math, anchors, NMS, RoIAlign/RoIPool."""

from detectron_tpu.ops.boxes import (  # noqa: F401
    bbox_overlaps,
    box_area,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    pairwise_iou,
    valid_box_mask,
)
from detectron_tpu.ops.anchors import (  # noqa: F401
    AnchorGenerator,
    generate_base_anchors,
    shift_anchors,
)
from detectron_tpu.ops.nms import class_aware_nms, nms_numpy, nms_padded  # noqa: F401
from detectron_tpu.ops.nms_pallas import nms_pallas  # noqa: F401
from detectron_tpu.ops.ps_roi_pool import ps_roi_pool  # noqa: F401
from detectron_tpu.ops.roi_align import (  # noqa: F401
    multilevel_roi_align,
    roi_align,
    roi_pool,
)
from detectron_tpu.ops.roi_align_pallas import (  # noqa: F401
    multilevel_roi_align_pallas,
    roi_align_fused,
)
