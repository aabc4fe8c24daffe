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
# NB: names equal to submodule names (roi_align, nms_pallas, ps_roi_pool)
# are NOT re-exported here — they would shadow the submodules; import those
# functions from their modules directly.
from detectron_tpu.ops.roi_align import multilevel_roi_align, roi_pool  # noqa: F401
from detectron_tpu.ops.roi_align_pallas import (  # noqa: F401
    multilevel_roi_align_pallas,
    roi_align_fused,
)
