"""Faster R-CNN (and the shared two-stage skeleton Mask R-CNN extends).

Equivalent of the reference's two-stage wiring (reference:
libs/nets/model.py base class + the Faster R-CNN variant of
libs/nets/maskrcnn.py; SURVEY.md §2.2 / §3.1): backbone + FPN -> RPN per
level -> proposals -> RoIAlign -> 2xFC box head -> softmax cls + per-class
box regression; detection post-processing with per-class NMS.

The entire train forward (incl. anchor targets, proposal generation, RoI
sampling) and the entire eval forward (incl. per-class NMS) are single
jit-able functions of (params, batch) — the reference's ~6 host<->device
crossings per step (SURVEY.md §3.1) are gone.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from detectron_tpu.layers.anchor_target import anchor_target
from detectron_tpu.layers.proposal import Proposals, generate_proposals
from detectron_tpu.layers.proposal_target import RoiTargets, sample_rois
from detectron_tpu.models import losses
from detectron_tpu.models.fpn import FPN
from detectron_tpu.models.heads import BoxHead, MaskHead, RPNHead
from detectron_tpu.models.resnet import ResNet
from detectron_tpu.models.retinanet import Detections
from detectron_tpu.ops import boxes as box_ops
from detectron_tpu.ops.anchors import AnchorGenerator
from detectron_tpu.ops.nms import class_aware_nms
from detectron_tpu.ops.roi_align import multilevel_roi_align

RPN_STRIDES = (4, 8, 16, 32, 64)  # P2..P6
ROI_STRIDES = (4, 8, 16, 32)  # box/mask heads pool from P2..P5


def _resolve_fused(mode: str) -> bool:
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"


def use_fused_nms(cfg) -> bool:
    """Pallas NMS kernel iff configured (auto = on TPU)."""
    return _resolve_fused(cfg.model.get("fused_nms", "auto"))


def use_fused_roi_align(cfg) -> bool:
    """Pallas RoIAlign kernel iff configured."""
    return _resolve_fused(cfg.model.get("fused_roi_align", "off"))


def rpn_anchor_generator(cfg) -> AnchorGenerator:
    scales = tuple(cfg.anchors.rpn_scales)
    return AnchorGenerator(
        strides=RPN_STRIDES,
        ratios=cfg.anchors.ratios,
        # multi-scale RPN configs: express extra scales as octaves of the
        # first so anchors/cell == len(ratios) * len(rpn_scales), matching
        # the head's output channel count in build_two_stage
        octave_scales=tuple(s / scales[0] for s in scales),
        base_scale=scales[0],
    )


class TwoStageDetector(nn.Module):
    """Flax module: backbone + FPN + RPN + box head (+ mask head).

    Exposed methods (use ``apply(..., method=...)``):
      * ``features(images)`` -> P2..P6 list
      * ``rpn(levels)`` -> (scores per level [B,Nl], deltas per level [B,Nl,4])
      * ``box(levels, rois)`` -> (cls logits [B,R,K], deltas [B,R,nreg,4])
      * ``mask(levels, rois)`` -> [B,R,28,28,K-1] logits
      * ``__call__(images, rois)`` -> all outputs (used for init)
    """

    num_classes: int
    backbone: str = "resnet50"
    stem: str = "conv"
    frozen_stages: int = 1
    channels: int = 256
    num_anchors: int = 3
    pool_size: int = 7
    mask_pool_size: int = 14
    sampling_ratio: int = 2
    class_agnostic: bool = False
    include_mask: bool = False
    pool_type: str = "align"  # align | pool (reference ships both ops)
    align_impl: str = "gather"  # gather | window (separable-matmul XLA path)
    # interpolation window of the windowed path (cells; span bound
    # follows). -1/0 = auto per dim: 32 raised to cover the coarsest
    # pooled level (ops/roi_align.py::resolve_window). Smaller explicit
    # values = less gather traffic but more RoIs promoted a level coarser
    # (change FPN routing for band-top RoIs — need real-data mAP evidence).
    roi_window: int = -1
    # RoI chunking of the windowed align (lax.map over chunks of this many
    # RoIs per image): bounds the [B, R, wh, ww, C] window tensor, which at
    # bs=48 was the single 8.8 GB allocation that OOMed inference. 0 = off;
    # -1 = auto from static shapes (ops/roi_align.py docstring).
    roi_chunk: int = -1
    # x-extent of the interpolation window (0 = roi_window + 8). Decoupling
    # the dims lets the gather shrink without changing x-routing (A/B'd on
    # hardware; see DESIGN.md §7).
    roi_window_w: int = 0
    # Pallas scatter-add backward schedule: "sep" (in-kernel matmuls) or
    # "xla" (d_windows precomputed by batched XLA matmuls, kernel = pure
    # DMA read-add-write; trades an HBM tensor for MXU utilization).
    roi_bwd_order: str = "sep"
    # 8-aligned window-gather starts (+8 gather columns of slack); exact,
    # routing unchanged — see ops/roi_align.py::multilevel_roi_align_windowed
    roi_align_x8: bool = False
    norm: str = "frozen_bn"  # frozen_bn | gn (trainable GroupNorm-32)
    # remat non-frozen backbone blocks in the backward (models/resnet.py):
    # trades block recompute for activation HBM at large train batches
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.body = ResNet(
            depth=self.backbone, frozen_stages=self.frozen_stages,
            norm=self.norm, stem=self.stem, remat=self.remat,
            dtype=self.dtype, name="backbone",
        )
        self.neck = FPN(channels=self.channels, levels="p2p6",
                        dtype=self.dtype, name="fpn")
        self.rpn_head = RPNHead(num_anchors=self.num_anchors,
                                channels=self.channels, dtype=self.dtype,
                                name="rpn")
        self.box_head = BoxHead(num_classes=self.num_classes,
                                class_agnostic=self.class_agnostic,
                                dtype=self.dtype, name="box_head")
        if self.include_mask:
            self.mask_head = MaskHead(num_classes=self.num_classes,
                                      dtype=self.dtype, name="mask_head")

    def features(self, images):
        return self.neck(self.body(images))

    def rpn(self, levels):
        outs = [self.rpn_head(p) for p in levels]
        return [o[0] for o in outs], [o[1] for o in outs]

    def _pool(self, levels, rois, size, fused):
        if self.pool_type == "pool":
            # RoIPool parity path (reference: libs/roi_pooling; zoo config
            # 1's "RoI path" knob): exact dynamic-bin max semantics, one
            # windowed pass routing each RoI to its FPN level.
            from detectron_tpu.ops.roi_align import multilevel_roi_pool

            return multilevel_roi_pool(
                levels[: len(ROI_STRIDES)], rois, ROI_STRIDES,
                output_size=size,
            )
        if fused:
            # custom-vjp wrapper: Pallas forward, exact jnp-transpose backward
            # (so the fused path is safe under jax.grad in training too)
            from detectron_tpu.ops.roi_align_pallas import roi_align_fused

            return roi_align_fused(
                tuple(levels[: len(ROI_STRIDES)]), rois, ROI_STRIDES, size,
                self.sampling_ratio,
            )
        if self.align_impl == "window":
            # custom_vjp: windowed matmul forward, Pallas scatter-add
            # backward (the autodiff backward of the windowed forward
            # scatters whole windows and nearly doubles the train step)
            from detectron_tpu.ops.roi_align_pallas import (
                roi_align_window_trainable,
            )

            return roi_align_window_trainable(
                tuple(levels[: len(ROI_STRIDES)]), rois, ROI_STRIDES, size,
                self.sampling_ratio, self.roi_window, self.roi_chunk,
                self.roi_window_w, self.roi_bwd_order, self.roi_align_x8,
            )
        return multilevel_roi_align(
            levels[: len(ROI_STRIDES)], rois, ROI_STRIDES,
            output_size=size, sampling_ratio=self.sampling_ratio,
        )

    def box(self, levels, rois, fused: bool = False):
        return self.box_head(self._pool(levels, rois, self.pool_size, fused))

    def mask(self, levels, rois, fused: bool = False):
        return self.mask_head(
            self._pool(levels, rois, self.mask_pool_size, fused)
        )

    def __call__(self, images, rois):
        levels = self.features(images)
        rpn_out = self.rpn(levels)
        box_out = self.box(levels, rois)
        mask_out = self.mask(levels, rois) if self.include_mask else None
        return rpn_out, box_out, mask_out


def build_two_stage(cfg, include_mask: bool) -> TwoStageDetector:
    return TwoStageDetector(
        num_classes=cfg.model.num_classes,
        backbone=cfg.model.backbone,
        stem=cfg.model.get("stem", "conv"),
        frozen_stages=cfg.model.frozen_stages,
        channels=cfg.model.fpn_channels,
        num_anchors=len(cfg.anchors.ratios) * len(cfg.anchors.rpn_scales),
        pool_size=cfg.roi.pool_size,
        mask_pool_size=cfg.roi.mask_pool_size,
        sampling_ratio=cfg.roi.sampling_ratio,
        class_agnostic=cfg.roi.class_agnostic_regression,
        include_mask=include_mask,
        pool_type=cfg.roi.get("pool_type", "align"),
        align_impl=cfg.roi.get("align_impl", "gather"),
        roi_window=cfg.roi.get("window", -1),
        roi_chunk=cfg.roi.get("chunk", -1),
        roi_window_w=cfg.roi.get("window_w", 0),
        roi_bwd_order=cfg.roi.get("bwd_order", "sep"),
        roi_align_x8=cfg.roi.get("align_x8", False),
        norm=cfg.model.get("norm", "frozen_bn"),
        remat=cfg.model.get("remat", False),
        dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32,
    )


# --------------------------------------------------------------------------
# pure per-stage functions (all shapes static; cfg is trace-time constant)
# --------------------------------------------------------------------------


def rpn_losses(scores_pl, deltas_pl, anchors, gt_boxes, gt_classes, key, cfg):
    """RPN objectness + box losses on a 256-anchor sample per image."""
    scores = jnp.concatenate(scores_pl, axis=1)  # [B, N]
    deltas = jnp.concatenate(deltas_pl, axis=1)  # [B, N, 4]
    tgt = anchor_target(
        jnp.asarray(anchors), gt_boxes, gt_classes, key,
        pos_iou=cfg.rpn.positive_iou, neg_iou=cfg.rpn.negative_iou,
        force_match=True,
        sample_size=cfg.rpn.batch_per_image,
        pos_fraction=cfg.rpn.positive_fraction,
    )
    labels = (tgt.labels > 0).astype(scores.dtype)
    ce = losses.optax_sigmoid_ce(scores, labels)
    norm = jnp.maximum(jnp.sum(tgt.cls_weights), 1.0)
    cls_loss = jnp.sum(ce * tgt.cls_weights) / norm
    box_l = losses.smooth_l1(deltas, tgt.box_targets, sigma=cfg.rpn.smooth_l1_sigma)
    box_loss = jnp.sum(jnp.sum(box_l, -1) * tgt.box_weights) / norm
    return {"loss_rpn_cls": cls_loss, "loss_rpn_box": box_loss}


def resolve_nms_algo(cfg, batch: int, train: bool = False) -> str:
    """Batch-aware ``auto``: at bs<=2 the per-image serial NMS chains
    dominate the program (no batch parallelism to hide them) and the
    fixpoint formulation wins big — measured on v5e 1024² bf16:
    faster_rcnn bs=1 71.6 -> 88.3 img/s, bs=2 110.4 -> 127.5, mask_rcnn
    bs=1 65.6 -> 85.2; bs=4 within noise (+1.8%), bs>=8 tiled wins
    (round-2 A/B). DESIGN.md §9. Inference-only: the cited A/Bs are all
    eval programs (train NMS runs at the larger pre_nms_topk_train
    candidate counts and was not measured), so the train path keeps the
    plain auto until a train-mode A/B lands."""
    algo = cfg.model.get("nms_algo", "auto")
    if algo == "auto" and batch <= 2 and not train:
        return "fixpoint"
    return algo


def proposals_from_rpn(scores_pl, deltas_pl, anchors_pl, image_hw, cfg,
                       train: bool) -> Proposals:
    return generate_proposals(
        scores_pl, deltas_pl, anchors_pl, image_hw,
        pre_nms_topk=cfg.rpn.pre_nms_topk_train if train else cfg.rpn.pre_nms_topk_test,
        post_nms_topk=cfg.rpn.post_nms_topk_train if train else cfg.rpn.post_nms_topk_test,
        nms_thresh=cfg.rpn.nms_thresh,
        min_size=cfg.rpn.min_size,
        nms_impl="pallas" if use_fused_nms(cfg) else "jnp",
        nms_algo=resolve_nms_algo(cfg, scores_pl[0].shape[0], train=train),
        exact_topk=cfg.rpn.get("exact_topk", False),
        topk_recall=cfg.rpn.get("topk_recall", 0.99),
    )


def frcnn_box_losses(cls_logits, reg, roi_targets: RoiTargets, cfg):
    """Softmax CE + class-aware smooth-L1 over the sampled RoIs."""
    b, s = cls_logits.shape[:2]
    norm = jnp.maximum(jnp.sum(roi_targets.weights), 1.0)
    cls_loss = losses.softmax_cross_entropy(
        cls_logits.reshape(b * s, -1),
        roi_targets.labels.reshape(-1),
        weights=roi_targets.weights.reshape(-1),
        normalizer=norm,
    )
    if reg.shape[2] == 1:
        sel = reg[:, :, 0]
    else:
        k = jnp.clip(roi_targets.labels, 0, reg.shape[2] - 1)
        sel = jnp.take_along_axis(reg, k[..., None, None], axis=2)[:, :, 0]
    box_l = losses.smooth_l1(sel, roi_targets.box_targets, sigma=cfg.roi.smooth_l1_sigma)
    box_loss = jnp.sum(jnp.sum(box_l, -1) * roi_targets.box_weights) / norm
    return {"loss_cls": cls_loss, "loss_box": box_loss}


def fastrcnn_inference(cls_logits, reg, rois, roi_valid, image_hw, cfg) -> Detections:
    """Detection post-processing, one fused device pass per image.

    Replaces the reference's host per-class loop (reference:
    libs/nets/model.py::get_final_results; SURVEY.md §3.2): softmax ->
    per-class decode -> score threshold -> class-aware NMS -> top-D.
    """
    kp1 = cls_logits.shape[-1]  # K+1
    k = kp1 - 1
    weights = cfg.roi.bbox_reg_weights
    topk_cand = min(cfg.rpn.post_nms_topk_test * 4, rois.shape[1] * k)

    def per_image(logits, reg_i, rois_i, valid_i, hw):
        probs = jax.nn.softmax(logits, axis=-1)[:, 1:]  # [R, K]
        if reg_i.shape[1] == 1:
            boxes = box_ops.decode_boxes(reg_i[:, 0], rois_i, weights)
            boxes = jnp.broadcast_to(boxes[:, None, :], (boxes.shape[0], k, 4))
        else:
            boxes = box_ops.decode_boxes(
                reg_i[:, 1:], rois_i[:, None, :], weights
            )  # [R, K, 4]
        boxes = box_ops.clip_boxes(boxes, hw[0], hw[1])
        flat_scores = probs.reshape(-1)  # [R*K]
        flat_boxes = boxes.reshape(-1, 4)
        flat_cls = jnp.tile(jnp.arange(1, kp1, dtype=jnp.int32), probs.shape[0])
        flat_valid = (
            jnp.repeat(valid_i, k) & (flat_scores > cfg.test.score_thresh)
        )
        top_s, top_i = jax.lax.top_k(
            jnp.where(flat_valid, flat_scores, -1.0), topk_cand
        )
        cand_valid = top_s > 0.0
        cand_boxes = flat_boxes[top_i]
        cand_cls = flat_cls[top_i]
        idx, keep = class_aware_nms(
            cand_boxes, top_s, cand_cls, cfg.test.nms_thresh,
            cfg.test.detections_per_image, valid=cand_valid,
            impl="pallas" if use_fused_nms(cfg) else "jnp",
            algo=resolve_nms_algo(cfg, cls_logits.shape[0]),
        )
        return Detections(
            boxes=jnp.where(keep[:, None], cand_boxes[idx], 0.0),
            scores=jnp.where(keep, top_s[idx], 0.0),
            classes=jnp.where(keep, cand_cls[idx], 0),
            valid=keep,
        )

    return jax.vmap(per_image)(cls_logits, reg, rois, roi_valid, image_hw)


# --------------------------------------------------------------------------
# full train / eval forwards
# --------------------------------------------------------------------------


def faster_rcnn_train_forward(
    model: TwoStageDetector, params, images, image_hw, gt_boxes, gt_classes,
    key, cfg, anchors_pl=None, gt_masks=None,
):
    """One jittable training forward returning the full loss dict."""
    from detectron_tpu.layers.mask_target import crop_gt_masks_batched

    if anchors_pl is None:
        gen = rpn_anchor_generator(cfg)
        anchors_pl = gen.grid_anchors(images.shape[1:3])
    anchors_all = np.concatenate(anchors_pl, axis=0)
    k_tgt, k_smp = jax.random.split(key)

    fused = use_fused_roi_align(cfg)
    levels = model.apply(params, images, method=model.features)
    scores_pl, deltas_pl = model.apply(params, levels, method=model.rpn)
    loss_dict = rpn_losses(
        scores_pl, deltas_pl, anchors_all, gt_boxes, gt_classes, k_tgt, cfg
    )
    props = proposals_from_rpn(
        [jax.lax.stop_gradient(s) for s in scores_pl],
        [jax.lax.stop_gradient(d) for d in deltas_pl],
        anchors_pl, image_hw, cfg, train=True,
    )
    tgt = sample_rois(
        props.boxes, props.valid, gt_boxes, gt_classes, k_smp,
        sample_size=cfg.roi.batch_per_image,
        positive_fraction=cfg.roi.positive_fraction,
        positive_iou=cfg.roi.positive_iou,
        negative_iou_hi=cfg.roi.negative_iou_hi,
        negative_iou_lo=cfg.roi.negative_iou_lo,
        box_weights=cfg.roi.bbox_reg_weights,
    )
    cls_logits, reg = model.apply(params, levels, tgt.rois, method=model.box,
                                  fused=fused)
    loss_dict.update(frcnn_box_losses(cls_logits, reg, tgt, cfg))

    if model.include_mask and gt_masks is not None:
        # the mask loss only sees fg RoIs (reference semantics), and the
        # sampler compacts selected-fg to the FRONT slots — so the mask
        # branch runs on just the fg capacity (batch*fraction), a 1/4-cost
        # head pass instead of all sampled RoIs
        cap = max(int(cfg.roi.batch_per_image * cfg.roi.positive_fraction), 1)
        rois_m = tgt.rois[:, :cap]
        mask_logits = model.apply(params, levels, rois_m, method=model.mask,
                                  fused=fused)
        mask_targets = crop_gt_masks_batched(
            gt_masks, gt_boxes, rois_m, tgt.matched_idx[:, :cap],
            resolution=cfg.mask.resolution,
        )
        b, s = tgt.labels[:, :cap].shape
        loss_dict["loss_mask"] = losses.mask_bce_loss(
            mask_logits.reshape(b * s, *mask_logits.shape[2:]),
            mask_targets.reshape(b * s, *mask_targets.shape[2:]),
            tgt.labels[:, :cap].reshape(-1),
            tgt.box_weights[:, :cap].reshape(-1),
        )
    return loss_dict


def faster_rcnn_eval_forward(
    model: TwoStageDetector, params, images, image_hw, cfg, anchors_pl=None,
    with_masks: bool = False,
):
    """One jittable eval forward returning padded Detections (+ masks)."""
    if anchors_pl is None:
        gen = rpn_anchor_generator(cfg)
        anchors_pl = gen.grid_anchors(images.shape[1:3])
    levels = model.apply(params, images, method=model.features)
    scores_pl, deltas_pl = model.apply(params, levels, method=model.rpn)
    props = proposals_from_rpn(scores_pl, deltas_pl, anchors_pl, image_hw, cfg,
                               train=False)
    fused = use_fused_roi_align(cfg)
    cls_logits, reg = model.apply(params, levels, props.boxes, method=model.box,
                                  fused=fused)
    dets = fastrcnn_inference(cls_logits, reg, props.boxes, props.valid,
                              image_hw, cfg)
    if not (with_masks and model.include_mask):
        return dets, None
    mask_logits = model.apply(params, levels, dets.boxes, method=model.mask,
                              fused=fused)
    k = jnp.clip(dets.classes - 1, 0, mask_logits.shape[-1] - 1)
    own = jnp.take_along_axis(
        mask_logits, k[:, :, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    return dets, jax.nn.sigmoid(own)  # [B, D, 28, 28]
