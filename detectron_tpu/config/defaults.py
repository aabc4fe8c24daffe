"""Default configuration.

Equivalent of the reference's global config module (reference:
``libs/configs/config.py`` — py-faster-rcnn-style ``cfg`` with nested
``TRAIN.*`` / ``TEST.*`` namespaces merged from YAML + CLI). We keep the same
config-driven public API (SURVEY.md §5.6) but use ``ml_collections.ConfigDict``
with dotted-key overrides.

All shape-determining knobs here are *static*: they become compile-time
constants of the jitted train / predict steps (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import ml_collections


def base_config() -> ml_collections.ConfigDict:
    cfg = ml_collections.ConfigDict()

    # ------------------------------------------------------------------ model
    cfg.model = ml_collections.ConfigDict()
    cfg.model.name = "faster_rcnn"  # faster_rcnn | mask_rcnn | retinanet
    cfg.model.backbone = "resnet50"  # resnet50 | resnet101
    # stem: "s2d" reformulates the 7x7/2 conv space-to-depth (exact, same
    # params; the 3-channel 7x7 runs the MXU at ~2% occupancy). Measured
    # (bs=8 1024^2 bf16): train 193.4 -> 189.8 ms but inference 122.5 ->
    # 118.5 img/s (the blocked layout propagates into stage 1) — default
    # "conv" optimizes the inference headline; flip for train-heavy runs.
    cfg.model.stem = "conv"
    cfg.model.num_classes = 81  # includes background at index 0 (COCO: 80 + 1)
    cfg.model.fpn_channels = 256
    cfg.model.frozen_stages = 1  # freeze conv1+res2 like the reference fine-tune
    # normalization: "frozen_bn" (the reference's sole mode — affine folded
    # from pretrained stats) or "gn" (trainable GroupNorm-32 backbone, the
    # train-from-scratch variant; GN params stay in the optimizer)
    cfg.model.norm = "frozen_bn"
    # a-trous res5 (R-FCN paper trunk): stage 4 at stride 16 with dilation-2
    # 3x3 convs; R-FCN then votes over the dilated c5 instead of c4. Same
    # weight shapes (torchvision import unchanged). Off = the lighter C4
    # trunk. Only consumed by model.name=rfcn.
    cfg.model.dilate_c5 = False
    # rematerialize non-frozen backbone blocks in the backward pass
    # (jax.checkpoint per bottleneck): cuts backbone activation HBM by
    # ~1.5x block-width at the cost of recomputing each block's convs when
    # grads flow — the knob for train batches past the HBM knee. Exact
    # (same arithmetic, same params); eval/inference programs are
    # unaffected (no cotangents). Off by default: at bs<=16 the step fits
    # and remat only adds FLOPs.
    cfg.model.remat = False
    # pretrained backbone init: path to a torchvision-style ResNet .pth
    # state dict (the reference always fine-tunes from these; reference:
    # load_pretrained in libs/nets/resnet.py). "" = random init.
    cfg.model.weights = ""
    cfg.model.dtype = "float32"  # compute dtype: float32 | bfloat16
    # Pallas kernels on the inference path, per op: auto = when on TPU;
    # on/off force. CLOSED question (measured, r2+r5): standalone the
    # Pallas kernels win big (NMS ~25x, RoIAlign 14x14 ~3x), but in the
    # full program XLA's fusion/pipelining of the jnp versions wins
    # end-to-end at EVERY batch — bs=2 Mask R-CNN 21.6ms all-jnp vs
    # 23.8ms pallas-NMS vs 24.5ms both (r2), and even bs=1 Faster R-CNN,
    # the most serial-NMS-bound program we have (~30% of the step in NMS
    # while-loops), measures 62.6 img/s with fused_nms=on vs 71.6 jnp
    # baseline vs 88.3 jnp+fixpoint (r5, DESIGN.md §9), and the bs=48
    # headline — where the windowed align's HBM window round-trip is ~41%
    # of the program, the Pallas kernel's best case — measures 121.05 with
    # fused_roi_align=on vs 140.4 (r5). The pallas_call fusion barrier +
    # per-RoI sequential grid cost more than the HBM traffic the kernels
    # save; the serial-chain problem is better solved IN XLA by the
    # fixpoint NMS formulation (model.nms_algo auto picks it at bs<=2).
    # Kernels stay available, bit-exact-tested, and off by default.
    cfg.model.fused_nms = "off"
    cfg.model.fused_roi_align = "off"
    # greedy-NMS algorithm for the jnp path: "tiled" (128-box tiles +
    # in-tile sequential recurrence), "fixpoint" (iterated [N,N]
    # self-suppression to the greedy fixpoint, TF-TPU-NMS style — turns the
    # N-step serial chain into ~chain-depth vectorized passes), or "auto"
    # (site-dependent measured winner: fixpoint for RetinaNet's 2000-box
    # merged class NMS [132->149 img/s], tiled for RPN proposal NMS and the
    # R-CNN class NMS where it was neutral-to-negative). All bit-exact
    # greedy; A/Bs in docs/DESIGN.md.
    cfg.model.nms_algo = "auto"

    # ---------------------------------------------------------------- anchors
    cfg.anchors = ml_collections.ConfigDict()
    # Two-stage (RPN over P2..P6): one scale per level, 3 ratios.
    cfg.anchors.ratios = (0.5, 1.0, 2.0)
    cfg.anchors.rpn_scales = (8.0,)  # * stride, per FPN level
    # R-FCN: single-level RPN at stride 16 — the paper's 128/256/512-px
    # anchors (scales * stride)
    cfg.anchors.rfcn_scales = (8.0, 16.0, 32.0)
    # RetinaNet (P3..P7): 3 octave scales x 3 ratios = 9 anchors / cell.
    cfg.anchors.retinanet_scales = (1.0, 1.2599210498948732, 1.5874010519681994)
    cfg.anchors.retinanet_base_scale = 4.0
    # NB the py-faster-rcnn legacy "+1" pixel convention (reference:
    # libs/boxes/cython_bbox.pyx, w = x2 - x1 + 1) is supported at the op
    # level via each op's `offset` parameter (unit-tested with offset=1);
    # zoo configs use the modern offset=0 convention throughout.

    # -------------------------------------------------------------------- rpn
    cfg.rpn = ml_collections.ConfigDict()
    cfg.rpn.pre_nms_topk_train = 2000  # per level
    cfg.rpn.pre_nms_topk_test = 1000
    cfg.rpn.post_nms_topk_train = 1000  # across levels
    cfg.rpn.post_nms_topk_test = 300
    cfg.rpn.nms_thresh = 0.7
    cfg.rpn.min_size = 0.0
    # pre-NMS candidate selection: approx_max_k (recall 0.99) by default —
    # exact top_k over P2's ~800k objectness logits is sort-bound on TPU
    # (same trade as retinanet.exact_topk; measured A/B in docs/DESIGN.md)
    cfg.rpn.exact_topk = False
    # approx_max_k recall target. Sizes the partial-reduction buffer the
    # TPU lowering exact-sorts afterwards: at bs=1 1024² the P2 selection's
    # 128000-wide aggregate sort is 0.80 ms of the 13.0 ms program.
    # MEASURED (r5, DESIGN.md §9): LOWERING it is counterproductive —
    # 0.95 benches 69.4 img/s vs 79.5 default at mask bs=1 (the lowering
    # picks a worse reduction shape at lower recall). Keep 0.99.
    cfg.rpn.topk_recall = 0.99
    cfg.rpn.positive_iou = 0.7
    cfg.rpn.negative_iou = 0.3
    cfg.rpn.batch_per_image = 256
    cfg.rpn.positive_fraction = 0.5
    cfg.rpn.smooth_l1_sigma = 3.0

    # -------------------------------------------------------------------- roi
    cfg.roi = ml_collections.ConfigDict()
    cfg.roi.batch_per_image = 512
    cfg.roi.positive_fraction = 0.25
    cfg.roi.positive_iou = 0.5
    cfg.roi.negative_iou_hi = 0.5
    cfg.roi.negative_iou_lo = 0.0
    cfg.roi.pool_size = 7
    cfg.roi.mask_pool_size = 14
    cfg.roi.sampling_ratio = 2
    cfg.roi.pool_type = "align"  # align (RoIAlign) | pool (max RoIPool)
    # RoIAlign implementation: window (windowed separable interpolation
    # matmuls — the Pallas kernel's algorithm in pure XLA: no fusion
    # barrier, all-MXU, matmul-transpose backward) | gather (flat-table
    # 4-corner gather). Measured e2e v5e 1024² bs=2 bf16 Mask R-CNN:
    # window 25.2 ms vs pallas-kernel 28.1 vs gather 32.0 — window is the
    # default. Exact, with documented border-replicate for >5:1-aspect RoIs;
    # falls back to gather when the coarsest level exceeds the window.
    cfg.roi.align_impl = "window"
    # interpolation window extents (cells). -1/0 = AUTO per dim: the
    # measured-best 32, raised (8-aligned) to cover the coarsest pooled
    # level — 32x32 at 1024² (135.7 img/s at bs=32 vs 133.1 for the old
    # 32x40; 140.3 at bs=48; 20% smaller window tensor, identical op
    # semantics via span-aware routing), 32x48 / 48x32 on the 832x1344
    # orientation-bucket canvases. Windows that do NOT cover the coarsest
    # level silently cost 2x (gather fallback + trace-time warning —
    # measured 65 vs ~130 img/s); auto mode makes that impossible.
    # Explicit ints override for A/Bs (window_w=0 + explicit window =
    # legacy window+8).
    cfg.roi.window = -1
    cfg.roi.window_w = 0
    # windowed-align RoI chunk (lax.map scan): bounds the [B,R,wh,ww,C]
    # window tensor (8.8 GB at bs=48 — the round-2 batch-scaling OOM).
    # 0 = unchunked; -1 = auto (unchunked under 6.5 GB, else ~4 GB chunks
    # — bs<=32 stays unchunked, bs=48 gets the measured 135 img/s plateau)
    cfg.roi.chunk = -1
    # Pallas scatter-add backward schedule: "sep" = interpolation matmuls
    # inside the kernel (default); "xla" = d_windows precomputed by batched
    # XLA dot_generals, kernel is a pure DMA read-add-write pipeline
    # (costs a [B*R, wh, ww, C] HBM tensor; A/B via
    # scripts/bench_roialign_bwd.py / bench.py --mode train).
    cfg.roi.bwd_order = "sep"
    # 8-aligned window-gather starts: widens the gathered window by 8
    # columns and rounds each slice start down to a multiple of 8 so every
    # row slice begins on an (8,128)-tile boundary of the flat feature
    # table. Bit-exact (weights re-base; routing unchanged). Trades +25%
    # gather bytes for aligned DMA starts — measured knob, see DESIGN.md §9.
    cfg.roi.align_x8 = False
    cfg.roi.bbox_reg_weights = (10.0, 10.0, 5.0, 5.0)
    cfg.roi.smooth_l1_sigma = 1.0
    cfg.roi.class_agnostic_regression = False

    # -------------------------------------------------------------- retinanet
    cfg.retinanet = ml_collections.ConfigDict()
    cfg.retinanet.positive_iou = 0.5
    cfg.retinanet.negative_iou = 0.4
    cfg.retinanet.focal_alpha = 0.25
    cfg.retinanet.focal_gamma = 2.0
    cfg.retinanet.prior_prob = 0.01
    cfg.retinanet.pre_nms_topk = 1000  # per level
    # candidate selection over the Nl*K flattened score table: exact top_k
    # is very slow on TPU for ~12M-entry levels; approx_max_k (recall ~0.99,
    # hardware-optimized) is the default (mAP-neutral: only low-score
    # candidates near the cutoff differ)
    cfg.retinanet.exact_topk = False
    # approx_max_k recall target (same latency trade as rpn.topk_recall)
    cfg.retinanet.topk_recall = 0.99
    # cross-level candidate cap before the merged class-aware NMS: greedy
    # NMS cost is linear in the sequential candidate count, so capping
    # 5*pre_nms_topk=5000 to the top N by score shortens the serial
    # suppression chain. OFF by default (0 = no cap): MEASURED mAP damage
    # on a dense 340-object fixture (tests/test_retinanet_dense.py) —
    # when a few salient objects' many above-floor anchor activations
    # fill the top-2000, the cap deletes modest objects before NMS can
    # dedup, costing AP 0.294 -> 0.119 at maxDets=100 (0.983 -> 0.119 at
    # full recall). Opt in for speed on sparse data only
    # (configs/retinanet_fast.yaml uses 2000, ~2.5x shorter chain,
    # 128.8 -> 148.8 img/s at bs=8).
    cfg.retinanet.merged_pre_nms_topk = 0
    cfg.retinanet.score_thresh = 0.05
    cfg.retinanet.nms_thresh = 0.5
    cfg.retinanet.smooth_l1_beta = 0.1111111111111111  # = 1/9, Detectron default

    # ------------------------------------------------------------------- mask
    cfg.mask = ml_collections.ConfigDict()
    cfg.mask.resolution = 28
    cfg.mask.paste_threshold = 0.5

    # ------------------------------------------------------------------- test
    cfg.test = ml_collections.ConfigDict()
    cfg.test.score_thresh = 0.05
    cfg.test.nms_thresh = 0.5
    cfg.test.detections_per_image = 100
    cfg.test.bbox_reg_stds_applied = True

    # ------------------------------------------------------------------ train
    cfg.train = ml_collections.ConfigDict()
    cfg.train.batch_size = 8  # global
    cfg.train.base_lr = 0.01
    cfg.train.momentum = 0.9
    cfg.train.weight_decay = 1e-4
    cfg.train.warmup_steps = 500
    cfg.train.warmup_factor = 1.0 / 3.0
    cfg.train.lr_decay_steps = (60000, 80000)
    cfg.train.lr_decay_factor = 0.1
    cfg.train.max_steps = 90000
    cfg.train.grad_clip_norm = 0.0  # 0 = off
    cfg.train.checkpoint_every = 5000
    cfg.train.log_every = 20
    cfg.train.seed = 0
    cfg.train.max_gt_boxes = 100  # static padded gt capacity / image
    cfg.train.loss_scale = 1.0
    # debug mode: raise on NaN inside jitted code (SURVEY.md §5.2 — XLA is
    # deterministic, so NaN-checking is the rebuild's sanitizer equivalent)
    cfg.train.debug_nans = False

    # ------------------------------------------------------------------- data
    cfg.data = ml_collections.ConfigDict()
    cfg.data.dataset = "coco"  # coco | voc | citypersons | synthetic
    # VOC-2007 11-point interpolated AP (the metric the reference lineage
    # reports for VOC07 test) vs the continuous AUC metric (VOC2010+)
    cfg.data.voc_use_07_metric = False
    cfg.data.root = ""
    cfg.data.train_split = "train2017"
    cfg.data.val_split = "val2017"
    cfg.data.short_side = 800
    # scale-jitter / multi-scale training (reference: TRAIN.SCALES list in
    # libs/configs + blob resize in libs/boxes/blob.py; SURVEY.md §1 L4
    # "flip, scale jitter"): per-example random choice of the short side at
    # train time. Empty = no jitter (always ``short_side``). The padded
    # canvas stays the fixed ``image_size``, so jitter adds ZERO compiled
    # programs — only the valid region inside the canvas varies.
    cfg.data.train_scales = ()
    cfg.data.max_size = 1333
    cfg.data.pad_stride = 128  # pad H,W to a multiple (covers P7 stride)
    cfg.data.hflip_prob = 0.5
    cfg.data.pixel_mean = (123.675, 116.28, 103.53)
    cfg.data.pixel_std = (58.395, 57.12, 57.375)
    cfg.data.num_workers = 8
    # fixed padded image shape buckets (H, W); static shapes for XLA
    cfg.data.image_size = (1024, 1024)
    # two-bucket mode: portrait images use the transposed canvas (bounds
    # recompilation to 2 programs while keeping reference resize semantics)
    cfg.data.orientation_buckets = False

    # --------------------------------------------------------------- parallel
    cfg.parallel = ml_collections.ConfigDict()
    cfg.parallel.data_axis = "data"
    cfg.parallel.num_devices = 0  # 0 = all visible
    # multi-host (SURVEY.md §5.8): set coordinator_address (host:port) plus
    # num_processes/process_id on every host; train.py then calls
    # jax.distributed.initialize and feeds each host its disjoint data shard.
    cfg.parallel.coordinator_address = ""
    cfg.parallel.num_processes = 0
    cfg.parallel.process_id = -1

    # ------------------------------------------------------------------- misc
    cfg.output_dir = "/tmp/detectron_tpu"
    return cfg
