"""RetinaNet: dense one-stage detector.

Equivalent of the reference's RetinaNet (reference: libs/nets/retinanet.py +
libs/nets/focal_loss.py, SURVEY.md §2.2 / §3.3): shared 4x-conv-256 class and
box subnets over P3..P7, focal loss (alpha=.25, gamma=2), final cls bias
-log((1-pi)/pi).

TPU redesign: training target assignment and the whole inference
post-process (per-level sigmoid -> top-k over 0.05 -> decode -> merged
class-aware NMS -> top-100) are static-shape device ops inside the same
compiled program — the reference's per-level host loops disappear
(SURVEY.md §3.3).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from detectron_tpu.layers.anchor_target import anchor_target
from detectron_tpu.models import losses
from detectron_tpu.models.fpn import FPN
from detectron_tpu.models.resnet import ResNet
from detectron_tpu.ops import boxes as box_ops
from detectron_tpu.ops.anchors import AnchorGenerator
from detectron_tpu.ops.nms import class_aware_nms

RETINA_STRIDES = (8, 16, 32, 64, 128)


class Detections(NamedTuple):
    """Fixed-size padded detections (per image)."""

    boxes: jnp.ndarray  # [B, D, 4]
    scores: jnp.ndarray  # [B, D]
    classes: jnp.ndarray  # [B, D] int32, 1-based (0 = padding)
    valid: jnp.ndarray  # [B, D] bool


class RetinaNetHead(nn.Module):
    """Shared cls/box subnets; called once per level (params shared)."""

    num_classes: int  # foreground classes (no bg), e.g. 80
    num_anchors: int = 9
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cls, box = x, x
        for i in range(4):
            cls = nn.relu(
                nn.Conv(self.channels, (3, 3), padding="SAME", name=f"cls{i}",
                        dtype=self.dtype)(cls)
            )
            box = nn.relu(
                nn.Conv(self.channels, (3, 3), padding="SAME", name=f"box{i}",
                        dtype=self.dtype)(box)
            )
        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.prior_prob) / self.prior_prob)
        )
        cls_logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            name="cls_score", bias_init=bias_init, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
        )(cls)
        box_deltas = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME", name="box_pred",
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
        )(box)
        return cls_logits, box_deltas


class RetinaNet(nn.Module):
    """Raw forward: images [B,H,W,3] -> per-level (cls_logits, box_deltas)."""

    num_classes: int = 80  # foreground classes
    backbone: str = "resnet50"
    stem: str = "conv"
    frozen_stages: int = 1
    channels: int = 256
    num_anchors: int = 9  # must match the anchor generator's anchors/cell
    prior_prob: float = 0.01
    norm: str = "frozen_bn"  # frozen_bn | gn (trainable GroupNorm-32)
    # remat non-frozen backbone blocks in the backward (models/resnet.py)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(
            depth=self.backbone, frozen_stages=self.frozen_stages,
            norm=self.norm, stem=self.stem, remat=self.remat,
            dtype=self.dtype, name="backbone",
        )(images)
        levels = FPN(
            channels=self.channels, levels="p3p7", dtype=self.dtype, name="fpn"
        )(feats)
        head = RetinaNetHead(
            num_classes=self.num_classes, num_anchors=self.num_anchors,
            channels=self.channels, prior_prob=self.prior_prob,
            dtype=self.dtype, name="head",
        )
        return [head(p) for p in levels]


def retinanet_anchor_generator(cfg) -> AnchorGenerator:
    return AnchorGenerator(
        strides=RETINA_STRIDES,
        ratios=cfg.anchors.ratios,
        octave_scales=cfg.anchors.retinanet_scales,
        base_scale=cfg.anchors.retinanet_base_scale,
    )


def _flatten_outputs(outputs, num_classes):
    """Per-level [(B,H,W,A*K), (B,H,W,A*4)] -> (cls [B,N,K], box [B,N,4])
    with N = sum_l Hl*Wl*A, matching anchor order (y, x, anchor)."""
    cls_all, box_all = [], []
    for cls_l, box_l in outputs:
        b = cls_l.shape[0]
        cls_all.append(cls_l.reshape(b, -1, num_classes))
        box_all.append(box_l.reshape(b, -1, 4))
    return jnp.concatenate(cls_all, 1), jnp.concatenate(box_all, 1)


def retinanet_loss(outputs, anchors, gt_boxes, gt_classes, key, cfg):
    """Focal + smooth-L1 loss dict. anchors: [N,4] trace-time constant."""
    k = cfg.model.num_classes - 1
    cls_logits, box_deltas = _flatten_outputs(outputs, k)
    tgt = anchor_target(
        jnp.asarray(anchors), gt_boxes, gt_classes, key,
        pos_iou=cfg.retinanet.positive_iou,
        neg_iou=cfg.retinanet.negative_iou,
        force_match=True,
        sample_size=0,
    )
    onehot = jax.nn.one_hot(tgt.labels - 1, k, dtype=cls_logits.dtype)
    onehot = jnp.where((tgt.labels > 0)[..., None], onehot, 0.0)
    total_pos = jnp.maximum(jnp.sum(tgt.num_pos), 1.0)
    cls_loss = losses.sigmoid_focal_loss(
        cls_logits, onehot,
        alpha=cfg.retinanet.focal_alpha, gamma=cfg.retinanet.focal_gamma,
        weights=tgt.cls_weights, normalizer=total_pos,
    )
    box_l = losses.smooth_l1_beta(box_deltas, tgt.box_targets,
                                  cfg.retinanet.smooth_l1_beta)
    box_loss = jnp.sum(
        jnp.sum(box_l, -1) * tgt.box_weights
    ) / jnp.maximum(total_pos, 1.0)
    return {"loss_cls": cls_loss, "loss_box": box_loss}


def retinanet_inference(outputs, anchors_per_level, image_hw, cfg):
    """Full post-process on device. anchors_per_level: list of np [Nl, 4].

    image_hw: [B, 2] per-image (unpadded) sizes for clipping.
    Returns padded Detections.
    """
    k = cfg.model.num_classes - 1
    topk_per_level = cfg.retinanet.pre_nms_topk
    score_thresh = cfg.retinanet.score_thresh
    # top-k runs on LOGITS (sigmoid is monotonic): skips materializing a
    # sigmoid over the ~12M-entry P3 score table; the threshold moves to
    # logit space as a trace-time constant.
    logit_thresh = float(np.log(score_thresh / (1.0 - score_thresh)))

    def per_image(outs_flat, hw):
        cand_boxes, cand_logits, cand_cls = [], [], []
        for (cls_l, box_l), anc in zip(outs_flat, anchors_per_level):
            nl = anc.shape[0]
            flat = cls_l.reshape(-1)  # [Nl * k] logits
            t = min(topk_per_level, flat.shape[0])
            if cfg.retinanet.get("exact_topk", False) or flat.shape[0] < 4 * t:
                top_logits, top_idx = jax.lax.top_k(flat, t)
            else:
                top_logits, top_idx = jax.lax.approx_max_k(
                    flat, t,
                    recall_target=cfg.retinanet.get("topk_recall", 0.99),
                )
            a_idx = top_idx // k
            c_idx = top_idx % k
            boxes = box_ops.decode_boxes(
                box_l.reshape(nl, 4)[a_idx], jnp.asarray(anc)[a_idx]
            )
            boxes = box_ops.clip_boxes(boxes, hw[0], hw[1])
            cand_boxes.append(boxes)
            cand_logits.append(top_logits)
            cand_cls.append(c_idx + 1)
        boxes = jnp.concatenate(cand_boxes, 0)
        logits = jnp.concatenate(cand_logits, 0)
        classes = jnp.concatenate(cand_cls, 0)
        # Cross-level cap before NMS: greedy NMS cost is linear in the
        # sequential candidate count (tiles x in-tile recurrence), so
        # shrinking 5 x pre_nms_topk merged candidates to the top
        # `merged_pre_nms_topk` by score directly shortens the serial
        # chain. NOT mAP-neutral on dense scenes — measured AP
        # 0.294 -> 0.119 at maxDets=100 when salient objects' anchor
        # activations fill the cap (tests/test_retinanet_dense.py);
        # 0 = keep all (the default).
        merged_cap = int(cfg.retinanet.get("merged_pre_nms_topk", 0))
        if merged_cap and merged_cap < logits.shape[0]:
            logits, sel = jax.lax.top_k(logits, merged_cap)
            boxes = boxes[sel]
            classes = classes[sel]
        scores = jax.nn.sigmoid(logits)
        valid = logits > logit_thresh
        from detectron_tpu.models.faster_rcnn import use_fused_nms

        algo = cfg.model.get("nms_algo", "auto")
        if algo == "auto":
            # measured on v5e bs=8: the 2000-candidate merged NMS is the
            # one site where the fixpoint formulation wins (132 -> 149
            # img/s); see docs/DESIGN.md round-2 A/Bs
            algo = "fixpoint"
        idx, keep_valid = class_aware_nms(
            boxes, scores, classes, cfg.retinanet.nms_thresh,
            cfg.test.detections_per_image, valid=valid,
            impl="pallas" if use_fused_nms(cfg) else "jnp",
            algo=algo,
        )
        return Detections(
            boxes=jnp.where(keep_valid[:, None], boxes[idx], 0.0),
            scores=jnp.where(keep_valid, scores[idx], 0.0),
            classes=jnp.where(keep_valid, classes[idx], 0).astype(jnp.int32),
            valid=keep_valid,
        )

    # reshape outputs to per-image tuples and vmap
    def batched(hw_all, *flat_outs):
        outs = [(flat_outs[2 * i], flat_outs[2 * i + 1]) for i in range(len(anchors_per_level))]
        return per_image(outs, hw_all)

    flat = []
    for cls_l, box_l in outputs:
        b = cls_l.shape[0]
        flat.extend([cls_l.reshape(b, -1, k), box_l.reshape(b, -1, 4)])
    return jax.vmap(batched)(image_hw, *flat)
