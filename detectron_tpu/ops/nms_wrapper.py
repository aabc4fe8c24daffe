"""NMS dispatch (reference: libs/boxes/nms_wrapper.py).

The reference dispatched between cpu_nms and gpu_nms by config/device; here
one padded contract is served by two interchangeable implementations:

  * ``impl="jnp"``   — ops/nms.py, pure XLA (any backend, exact oracle)
  * ``impl="pallas"``— ops/nms_pallas.py, tiled TPU kernel (production path)

plus the host-side ``nms_numpy`` used for tests and host-side tooling.
"""

from __future__ import annotations

from detectron_tpu.ops.nms import nms_numpy, nms_padded  # noqa: F401
from detectron_tpu.ops.nms_pallas import nms_pallas


def nms(boxes, scores, iou_threshold, max_out, valid=None, offset=0.0,
        impl: str = "jnp", interpret: bool = False):
    if impl == "pallas":
        return nms_pallas(boxes, scores, iou_threshold, max_out, valid=valid,
                          offset=offset, interpret=interpret)
    if impl == "jnp":
        return nms_padded(boxes, scores, iou_threshold, max_out, valid=valid,
                          offset=offset)
    raise ValueError(f"unknown nms impl {impl!r}")
