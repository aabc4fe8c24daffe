"""Model zoo / detector factory: the config-driven public API.

The reference builds detectors from config names (reference: model factory
pattern across libs/nets/ + cfgs/*.yml; SURVEY.md §2.2 "Base detection
model"). Here ``build_detector(cfg)`` returns a :class:`Detector` exposing
pure, jittable ``loss_fn`` / ``predict_fn`` over a batch dict:

  batch = {
    "image":      [B, H, W, 3] float32 (normalized),
    "image_hw":   [B, 2] float32 true (unpadded) sizes,
    "gt_boxes":   [B, G, 4],
    "gt_classes": [B, G] int32 (0 = padding),
    "gt_masks":   [B, G, M0, M0] float32 (mask models, gt-box frame),
  }

Zoo entries (BASELINE.json configs): faster_rcnn, mask_rcnn, retinanet —
each with resnet50/resnet101 backbones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from detectron_tpu.models import faster_rcnn as frcnn
from detectron_tpu.models import retinanet as retina
from detectron_tpu.models import rfcn as rfcn_mod

MODEL_NAMES = ("faster_rcnn", "mask_rcnn", "retinanet", "rfcn")


class Detector:
    """Bundles a Flax module + config into pure train/eval functions."""

    def __init__(self, cfg):
        if cfg.model.name not in MODEL_NAMES:
            raise ValueError(f"unknown model {cfg.model.name!r}; zoo: {MODEL_NAMES}")
        self.cfg = cfg
        self.name = cfg.model.name
        self.is_two_stage = self.name in ("faster_rcnn", "mask_rcnn")
        self.with_masks = self.name == "mask_rcnn"
        if self.is_two_stage:
            self.module = frcnn.build_two_stage(cfg, include_mask=self.with_masks)
        elif self.name == "rfcn":
            self.module = rfcn_mod.build_rfcn(cfg)
        else:
            self.module = retina.RetinaNet(
                num_classes=cfg.model.num_classes - 1,
                backbone=cfg.model.backbone,
                frozen_stages=cfg.model.frozen_stages,
                channels=cfg.model.fpn_channels,
                num_anchors=len(cfg.anchors.ratios)
                * len(cfg.anchors.retinanet_scales),
                prior_prob=cfg.retinanet.prior_prob,
                norm=cfg.model.get("norm", "frozen_bn"),
                stem=cfg.model.get("stem", "conv"),
                remat=cfg.model.get("remat", False),
                dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32,
            )

    # ------------------------------------------------------------- params
    def init(self, key, image_size=None):
        h, w = image_size or self.cfg.data.image_size
        images = jnp.zeros((1, h, w, 3), jnp.float32)
        if self.is_two_stage or self.name == "rfcn":
            rois = jnp.zeros((1, 4, 4)).at[:, :, 2:].set(64.0)
            return jax.jit(self.module.init)(key, images, rois)
        return jax.jit(self.module.init)(key, images)

    # --------------------------------------------------------------- loss
    def loss_fn(self, params, batch, key):
        """Returns (total_loss, loss_dict). Trace-time anchors from shape."""
        cfg = self.cfg
        if self.is_two_stage:
            loss_dict = frcnn.faster_rcnn_train_forward(
                self.module, params, batch["image"], batch["image_hw"],
                batch["gt_boxes"], batch["gt_classes"], key, cfg,
                gt_masks=batch.get("gt_masks") if self.with_masks else None,
            )
        elif self.name == "rfcn":
            loss_dict = rfcn_mod.rfcn_train_forward(
                self.module, params, batch["image"], batch["image_hw"],
                batch["gt_boxes"], batch["gt_classes"], key, cfg,
            )
        else:
            gen = retina.retinanet_anchor_generator(cfg)
            anchors = gen.all_anchors(batch["image"].shape[1:3])
            outs = self.module.apply(params, batch["image"])
            loss_dict = retina.retinanet_loss(
                outs, anchors, batch["gt_boxes"], batch["gt_classes"], key, cfg
            )
        total = sum(loss_dict.values())
        return total, loss_dict

    # ------------------------------------------------------------ predict
    def predict_fn(self, params, batch):
        """Returns (Detections, mask_probs | None)."""
        cfg = self.cfg
        if self.is_two_stage:
            return frcnn.faster_rcnn_eval_forward(
                self.module, params, batch["image"], batch["image_hw"], cfg,
                with_masks=self.with_masks,
            )
        if self.name == "rfcn":
            return rfcn_mod.rfcn_eval_forward(
                self.module, params, batch["image"], batch["image_hw"], cfg,
            )
        gen = retina.retinanet_anchor_generator(cfg)
        anchors_pl = gen.grid_anchors(batch["image"].shape[1:3])
        outs = self.module.apply(params, batch["image"])
        dets = retina.retinanet_inference(outs, anchors_pl, batch["image_hw"], cfg)
        return dets, None


def build_detector(cfg) -> Detector:
    return Detector(cfg)
