"""Evaluation: self-contained COCO-protocol and VOC-protocol metrics."""

from detectron_tpu.eval.coco_eval import evaluate as evaluate_coco  # noqa: F401
from detectron_tpu.eval.voc_eval import evaluate_voc, voc_ap  # noqa: F401
