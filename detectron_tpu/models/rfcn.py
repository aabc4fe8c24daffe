"""R-FCN: region-based fully-convolutional detector (position-sensitive).

The reference lineage ships PSRoIPooling for R-FCN (SURVEY.md §2.1
"possible additional native ops"; sibling repos of the same author carry
the CUDA op). The op has lived in ``ops/ps_roi_pool.py`` since round 1;
this module gives it its consumer so the capability is end-to-end:

  backbone C4 (stride 16) -> 3x3 trunk conv -> RPN (single level, 3
  scales x 3 ratios like the paper's 128/256/512-px anchors) ->
  proposals -> two 1x1 convs emit position-sensitive score maps
  (P*P*(K+1) cls channels, P*P*4 class-agnostic box channels) ->
  PSRoIPool -> mean vote over the P*P grid -> per-RoI logits/deltas.

TPU-first notes: everything reuses the static-shape machinery of
faster_rcnn.py (anchor targets, padded proposals, RoI sampling, fused
class-aware NMS) — the whole train/eval forward is one XLA program. The
trunk is configurable: the default stride-16 C4 (lighter), or the paper's
a-trous res5 (``model.dilate_c5=true`` — stride-16 dilated c5, XLA
handles dilated convs natively on the MXU).

Reference: libs/nets/ R-FCN variant + PSRoIPool CUDA op [M]; the R-FCN
paper (Dai et al., 2016) for the published architecture constants.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from detectron_tpu.models import faster_rcnn as frcnn
from detectron_tpu.models.heads import RPNHead
from detectron_tpu.models.resnet import ResNet
from detectron_tpu.ops.anchors import AnchorGenerator
from detectron_tpu.ops.ps_roi_pool import ps_roi_pool

RFCN_STRIDE = 16  # C4 trunk (the paper's effective stride)


def rfcn_anchor_generator(cfg) -> AnchorGenerator:
    """Single-level RPN anchors: scales x ratios on stride 16 (the paper's
    128/256/512-px boxes at the default (8, 16, 32))."""
    scales = tuple(cfg.anchors.rfcn_scales)
    return AnchorGenerator(
        strides=(RFCN_STRIDE,),
        ratios=cfg.anchors.ratios,
        octave_scales=tuple(s / scales[0] for s in scales),
        base_scale=scales[0],
    )


class RFCN(nn.Module):
    """Flax module. Methods (via ``apply(..., method=...)``):
    ``features(images)`` -> stride-16 trunk; ``rpn(feat)`` -> single-level
    score/delta lists; ``box(feat, rois)`` -> (cls logits [B,R,K+1],
    class-agnostic deltas [B,R,1,4])."""

    num_classes: int  # incl. background
    backbone: str = "resnet50"
    stem: str = "conv"
    frozen_stages: int = 1
    channels: int = 512  # trunk conv width
    num_anchors: int = 9
    ps_pool: int = 7
    sampling_ratio: int = 2
    norm: str = "frozen_bn"
    # True = the paper's a-trous res5 trunk (dilated c5 at stride 16);
    # False = the lighter c4 trunk (documented deviation, same stride)
    dilate_c5: bool = False
    # remat non-frozen backbone blocks in the backward (models/resnet.py)
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.body = ResNet(
            depth=self.backbone, frozen_stages=self.frozen_stages,
            norm=self.norm, stem=self.stem, dilate_c5=self.dilate_c5,
            remat=self.remat, dtype=self.dtype, name="backbone",
        )
        self.trunk = nn.Conv(self.channels, (3, 3), padding="SAME",
                             name="trunk", dtype=self.dtype)
        self.rpn_head = RPNHead(num_anchors=self.num_anchors,
                                channels=self.channels, dtype=self.dtype,
                                name="rpn")
        p2 = self.ps_pool * self.ps_pool
        self.ps_cls = nn.Conv(
            p2 * self.num_classes, (1, 1), name="ps_cls", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
        )
        self.ps_box = nn.Conv(
            p2 * 4, (1, 1), name="ps_box", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
        )

    def features(self, images):
        feats = self.body(images)
        # both trunks are stride 16: c4 natively, c5 via the a-trous stage
        x = feats["c5"] if self.dilate_c5 else feats["c4"]
        return nn.relu(self.trunk(x))

    def rpn(self, feat):
        s, d = self.rpn_head(feat)
        return [s], [d]

    def box(self, feat, rois):
        # position-sensitive maps stay fully convolutional (the R-FCN
        # point: no per-RoI fc compute); the per-RoI work is ONLY the
        # pooled vote. f32 pooling keeps the vote exact under bf16 trunks.
        cls_map = self.ps_cls(feat).astype(jnp.float32)
        box_map = self.ps_box(feat).astype(jnp.float32)
        # ONE merged pool over (K+1)+4 channel groups instead of two: the
        # box table alone has 4 channels, and its autodiff backward
        # scatter tiled at 4/128 lanes cost 129 ms of the 328 ms bs=8
        # train step (op profile, DESIGN.md §9) — riding the box channels
        # on the cls table's well-tiled scatter removes that entirely.
        # Exact: pooling is per-channel, so concat/split commutes with it.
        b, h, w, _ = cls_map.shape
        p2 = self.ps_pool * self.ps_pool
        k = self.num_classes
        merged = jnp.concatenate(
            [cls_map.reshape(b, h, w, p2, k),
             box_map.reshape(b, h, w, p2, 4)], axis=-1,
        ).reshape(b, h, w, p2 * (k + 4))
        pooled = ps_roi_pool(
            merged, rois, RFCN_STRIDE, output_size=self.ps_pool,
            sampling_ratio=self.sampling_ratio,
        )  # [B, R, P, P, K+1+4]
        cls_logits = pooled[..., :k].mean(axis=(2, 3))
        reg = pooled[..., k:].mean(axis=(2, 3))[:, :, None, :]  # agnostic
        return cls_logits, reg

    def __call__(self, images, rois):  # init path
        feat = self.features(images)
        rpn_out = self.rpn(feat)
        box_out = self.box(feat, rois)
        return rpn_out, box_out


def build_rfcn(cfg) -> RFCN:
    return RFCN(
        num_classes=cfg.model.num_classes,
        backbone=cfg.model.backbone,
        stem=cfg.model.get("stem", "conv"),
        frozen_stages=cfg.model.frozen_stages,
        channels=cfg.model.fpn_channels,  # trunk width knob (paper: 1024)
        num_anchors=len(cfg.anchors.ratios) * len(cfg.anchors.rfcn_scales),
        ps_pool=cfg.roi.pool_size,
        sampling_ratio=cfg.roi.sampling_ratio,
        norm=cfg.model.get("norm", "frozen_bn"),
        dilate_c5=cfg.model.get("dilate_c5", False),
        remat=cfg.model.get("remat", False),
        dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32,
    )


def rfcn_train_forward(model: RFCN, params, images, image_hw, gt_boxes,
                       gt_classes, key, cfg):
    """One jittable training forward returning the full loss dict.
    Same stage functions as Faster R-CNN — only the head differs."""
    gen = rfcn_anchor_generator(cfg)
    anchors_pl = gen.grid_anchors(images.shape[1:3])
    k_tgt, k_smp = jax.random.split(key)

    feat = model.apply(params, images, method=model.features)
    scores_pl, deltas_pl = model.apply(params, feat, method=model.rpn)
    loss_dict = frcnn.rpn_losses(
        scores_pl, deltas_pl, anchors_pl[0], gt_boxes, gt_classes, k_tgt, cfg
    )
    props = frcnn.proposals_from_rpn(
        [jax.lax.stop_gradient(s) for s in scores_pl],
        [jax.lax.stop_gradient(d) for d in deltas_pl],
        anchors_pl, image_hw, cfg, train=True,
    )
    from detectron_tpu.layers.proposal_target import sample_rois

    tgt = sample_rois(
        props.boxes, props.valid, gt_boxes, gt_classes, k_smp,
        sample_size=cfg.roi.batch_per_image,
        positive_fraction=cfg.roi.positive_fraction,
        positive_iou=cfg.roi.positive_iou,
        negative_iou_hi=cfg.roi.negative_iou_hi,
        negative_iou_lo=cfg.roi.negative_iou_lo,
        box_weights=cfg.roi.bbox_reg_weights,
    )
    cls_logits, reg = model.apply(params, feat, tgt.rois, method=model.box)
    loss_dict.update(frcnn.frcnn_box_losses(cls_logits, reg, tgt, cfg))
    return loss_dict


def rfcn_eval_forward(model: RFCN, params, images, image_hw, cfg):
    """One jittable eval forward returning padded Detections."""
    gen = rfcn_anchor_generator(cfg)
    anchors_pl = gen.grid_anchors(images.shape[1:3])
    feat = model.apply(params, images, method=model.features)
    scores_pl, deltas_pl = model.apply(params, feat, method=model.rpn)
    props = frcnn.proposals_from_rpn(scores_pl, deltas_pl, anchors_pl,
                                     image_hw, cfg, train=False)
    cls_logits, reg = model.apply(params, feat, props.boxes,
                                  method=model.box)
    dets = frcnn.fastrcnn_inference(cls_logits, reg, props.boxes,
                                    props.valid, image_hw, cfg)
    return dets, None
