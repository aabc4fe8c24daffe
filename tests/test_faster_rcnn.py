"""Two-stage pipeline tests: proposals, RoI sampling, train/eval forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.config import get_config
from detectron_tpu.layers.proposal import generate_proposals
from detectron_tpu.layers.proposal_target import sample_rois_single
from detectron_tpu.models import faster_rcnn as frcnn


@pytest.fixture(scope="module")
def cfg():
    c = get_config()
    c.model.num_classes = 5
    c.model.fpn_channels = 32
    c.rpn.pre_nms_topk_train = 64
    c.rpn.post_nms_topk_train = 32
    c.rpn.pre_nms_topk_test = 64
    c.rpn.post_nms_topk_test = 16
    c.roi.batch_per_image = 16
    c.train.max_gt_boxes = 8
    c.test.detections_per_image = 10
    return c


def test_generate_proposals_recovers_planted_anchor():
    # one level, plant a high score at a known anchor with zero deltas
    from detectron_tpu.ops.anchors import AnchorGenerator

    gen = AnchorGenerator(strides=(16,), ratios=(1.0,), base_scale=4.0)
    anchors = gen.grid_anchors((128, 128))
    n = anchors[0].shape[0]
    scores = jnp.full((1, n), -10.0).at[0, 20].set(5.0)
    deltas = jnp.zeros((1, n, 4))
    props = generate_proposals(
        [scores], [deltas], anchors, jnp.array([[128.0, 128.0]]),
        pre_nms_topk=32, post_nms_topk=8, nms_thresh=0.7,
    )
    assert props.boxes.shape == (1, 8, 4)
    assert bool(props.valid[0, 0])
    want = np.clip(np.asarray(anchors[0][20]), 0, 128)
    np.testing.assert_allclose(np.asarray(props.boxes[0, 0]), want, atol=1e-3)
    # scores are sigmoid(logit), sorted descending
    s = np.asarray(props.scores[0])
    assert s[0] > 0.99 and np.all(np.diff(s[np.asarray(props.valid[0])]) <= 1e-6)


def test_generate_proposals_exact_vs_approx_topk():
    """RPN approx_max_k candidate selection yields the same proposals as
    exact top_k when real candidates are far from the pre-NMS cutoff
    (mirrors the RetinaNet neutrality test; approx engages when Nl >= 4k)."""
    from detectron_tpu.layers.proposal import generate_proposals
    from detectron_tpu.ops.anchors import AnchorGenerator

    gen = AnchorGenerator(strides=(8,), ratios=(0.5, 1.0, 2.0),
                          octave_scales=(1.0,), base_scale=8.0)
    anchors_pl = gen.grid_anchors((256, 256))  # 32*32*3 = 3072 anchors
    rng = np.random.RandomState(0)
    n = anchors_pl[0].shape[0]
    scores = jnp.asarray(rng.normal(-8, 0.5, (1, n)), jnp.float32)
    scores = scores.at[0, rng.choice(n, 40, replace=False)].set(
        jnp.asarray(rng.uniform(2, 6, 40), jnp.float32))
    deltas = jnp.asarray(rng.normal(0, 0.1, (1, n, 4)), jnp.float32)
    hw = jnp.array([[256.0, 256.0]])

    outs = {}
    for exact in (True, False):
        p = generate_proposals([scores], [deltas], anchors_pl, hw,
                               pre_nms_topk=256, post_nms_topk=64,
                               exact_topk=exact)
        v = np.asarray(p.valid[0])
        order = np.argsort(-np.asarray(p.scores[0])[v])
        outs[exact] = (np.asarray(p.boxes[0])[v][order],
                       np.asarray(p.scores[0])[v][order])
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_sample_rois_composition():
    rng = np.random.RandomState(0)
    # proposals: 30 near gt (fg), 70 far (bg)
    gt = jnp.zeros((4, 4)).at[0].set(jnp.array([100.0, 100.0, 160.0, 160.0]))
    gt_cls = jnp.array([2, 0, 0, 0])
    near = 100 + rng.uniform(-5, 5, (30, 4)).astype(np.float32) + np.array([0, 0, 60, 60], np.float32)
    far = rng.uniform(300, 400, (70, 2)).astype(np.float32)
    far = np.concatenate([far, far + 40], axis=1)
    rois = jnp.asarray(np.concatenate([near, far]))
    valid = jnp.ones((100,), bool)
    out = sample_rois_single(
        rois, valid, gt, gt_cls, jax.random.key(0),
        sample_size=32, positive_fraction=0.25,
    )
    assert out.rois.shape == (32, 4)
    n_fg = int(out.num_fg)
    assert 1 <= n_fg <= 8  # capped at 25% of 32
    labels = np.asarray(out.labels)
    fg_mask = np.asarray(out.box_weights) > 0
    assert np.all(labels[fg_mask] == 2)
    assert int(np.asarray(out.weights).sum()) == 32  # fg + bg fill the sample
    # selected rois are compacted to the front
    w = np.asarray(out.weights)
    assert np.all(w[: int(w.sum())] == 1.0)


def test_sample_rois_includes_gt_as_candidates():
    # no proposal overlaps gt, but gt itself is appended -> at least 1 fg
    gt = jnp.zeros((2, 4)).at[0].set(jnp.array([10.0, 10.0, 50.0, 50.0]))
    gt_cls = jnp.array([1, 0])
    rois = jnp.asarray([[200.0, 200.0, 250.0, 250.0]] * 8)
    out = sample_rois_single(
        rois, jnp.ones((8,), bool), gt, gt_cls, jax.random.key(0),
        sample_size=8,
    )
    assert int(out.num_fg) == 1


@pytest.fixture(scope="module")
def frcnn_setup(cfg):
    model = frcnn.build_two_stage(cfg, include_mask=False)
    images = jnp.ones((1, 128, 128, 3))
    rois = jnp.zeros((1, 4, 4)).at[:, :, 2:].set(32.0)
    params = jax.jit(model.init)(jax.random.key(0), images, rois)
    return model, params, images


def test_train_forward_losses(cfg, frcnn_setup):
    model, params, images = frcnn_setup
    gt_boxes = jnp.zeros((1, 8, 4)).at[0, 0].set(jnp.array([20.0, 20.0, 90.0, 90.0]))
    gt_classes = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(3)
    hw = jnp.array([[128.0, 128.0]])
    ld = frcnn.faster_rcnn_train_forward(
        model, params, images, hw, gt_boxes, gt_classes, jax.random.key(0), cfg
    )
    assert set(ld) == {"loss_rpn_cls", "loss_rpn_box", "loss_cls", "loss_box"}
    for k, v in ld.items():
        assert np.isfinite(float(v)), k
    # cls loss at random init ~ log(num_classes)
    assert 0.2 < float(ld["loss_cls"]) < 10.0


def test_train_forward_grads_flow(cfg, frcnn_setup):
    model, params, images = frcnn_setup
    gt_boxes = jnp.zeros((1, 8, 4)).at[0, 0].set(jnp.array([20.0, 20.0, 90.0, 90.0]))
    gt_classes = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(3)
    hw = jnp.array([[128.0, 128.0]])

    def total(p):
        ld = frcnn.faster_rcnn_train_forward(
            model, p, images, hw, gt_boxes, gt_classes, jax.random.key(0), cfg
        )
        return sum(ld.values())

    g = jax.grad(total)(params)
    # rpn head and box head both receive gradient
    gn_rpn = float(jnp.sum(jnp.abs(g["params"]["rpn"]["conv"]["kernel"])))
    gn_box = float(jnp.sum(jnp.abs(g["params"]["box_head"]["fc1"]["kernel"])))
    assert gn_rpn > 0 and gn_box > 0


def test_eval_forward_shapes_and_validity(cfg, frcnn_setup):
    model, params, images = frcnn_setup
    hw = jnp.array([[128.0, 128.0]])
    dets, masks = frcnn.faster_rcnn_eval_forward(model, params, images, hw, cfg)
    d = cfg.test.detections_per_image
    assert dets.boxes.shape == (1, d, 4)
    assert dets.scores.shape == (1, d)
    assert masks is None
    v = np.asarray(dets.valid[0])
    s = np.asarray(dets.scores[0])
    assert np.all(s[~v] == 0)
    assert np.all(s[v] > cfg.test.score_thresh)
    b = np.asarray(dets.boxes[0])
    assert b.min() >= 0 and b.max() <= 128.0


def test_roi_pool_path_runs(cfg):
    """cfg.roi.pool_type=pool swaps RoIAlign for max RoIPool end-to-end."""
    import ml_collections

    c = ml_collections.ConfigDict(cfg.to_dict())
    c.roi.pool_type = "pool"
    model = frcnn.build_two_stage(c, include_mask=False)
    images = jnp.ones((1, 128, 128, 3))
    rois = jnp.zeros((1, 4, 4)).at[:, :, 2:].set(32.0)
    params = jax.jit(model.init)(jax.random.key(0), images, rois)
    hw = jnp.array([[128.0, 128.0]])
    dets, _ = frcnn.faster_rcnn_eval_forward(model, params, images, hw, c)
    assert dets.boxes.shape[0] == 1
    assert bool(jnp.all(jnp.isfinite(dets.boxes)))


def test_windowed_align_impl_matches_gather_end_to_end(cfg):
    """cfg.roi.align_impl=window gives the same detections as the gather
    path through the full eval forward (the two RoIAlign impls are
    oracle-equal; this pins the model wiring)."""
    import ml_collections

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)), jnp.float32)
    hw = jnp.array([[128.0, 128.0]])
    outs = {}
    for impl in ("gather", "window"):
        c = ml_collections.ConfigDict(cfg.to_dict())
        c.roi.align_impl = impl
        model = frcnn.build_two_stage(c, include_mask=False)
        rois = jnp.zeros((1, 4, 4)).at[:, :, 2:].set(32.0)
        params = jax.jit(model.init)(jax.random.key(0), images, rois)
        dets, _ = frcnn.faster_rcnn_eval_forward(model, params, images, hw, c)
        outs[impl] = dets
    np.testing.assert_allclose(np.asarray(outs["gather"].boxes),
                               np.asarray(outs["window"].boxes), atol=1e-3)
    np.testing.assert_allclose(np.asarray(outs["gather"].scores),
                               np.asarray(outs["window"].scores), atol=1e-4)


def test_sample_rois_zero_gt_yields_background():
    """Images with no valid gt still produce a full background sample
    (regression: padded-gt IoU of -1 used to fail the bg lower bound)."""
    rois = jnp.asarray(np.random.RandomState(0).uniform(0, 100, (20, 4)).astype(np.float32))
    rois = rois.at[:, 2:].set(rois[:, :2] + 30.0)
    out = sample_rois_single(
        rois, jnp.ones((20,), bool), jnp.zeros((4, 4)),
        jnp.zeros((4,), jnp.int32), jax.random.key(0), sample_size=16,
    )
    assert int(out.num_fg) == 0
    assert int(np.asarray(out.weights).sum()) == 16  # all background
    assert np.all(np.asarray(out.labels) == 0)


def test_multiscale_rpn_config_consistent(cfg):
    """len(rpn_scales) > 1: anchors/cell matches the RPN head output size
    (regression: generator used only rpn_scales[0])."""
    import ml_collections

    c = ml_collections.ConfigDict(cfg.to_dict())
    c.anchors.rpn_scales = (8.0, 16.0)
    gen = frcnn.rpn_anchor_generator(c)
    assert gen.num_anchors_per_cell == len(c.anchors.ratios) * 2
    model = frcnn.build_two_stage(c, include_mask=False)
    assert model.num_anchors == gen.num_anchors_per_cell
    # and the anchor count matches the rpn output length
    anchors = gen.grid_anchors((128, 128))
    images = jnp.ones((1, 128, 128, 3))
    rois = jnp.zeros((1, 4, 4)).at[:, :, 2:].set(32.0)
    params = jax.jit(model.init)(jax.random.key(0), images, rois)
    levels = model.apply(params, images, method=model.features)
    scores, _ = model.apply(params, levels, method=model.rpn)
    assert sum(s.shape[1] for s in scores) == sum(a.shape[0] for a in anchors)
