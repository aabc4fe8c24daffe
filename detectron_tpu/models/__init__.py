"""Model zoo: backbones, necks, heads, detectors."""

from detectron_tpu.models.fpn import FPN  # noqa: F401
from detectron_tpu.models.resnet import ResNet, FrozenBatchNorm  # noqa: F401
from detectron_tpu.models.retinanet import (  # noqa: F401
    Detections,
    RetinaNet,
    RetinaNetHead,
    retinanet_anchor_generator,
    retinanet_inference,
    retinanet_loss,
)
