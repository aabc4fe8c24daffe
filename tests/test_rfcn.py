"""R-FCN model family: position-sensitive head end-to-end.

The PSRoIPool op (ops/ps_roi_pool.py, oracle-tested in
tests/test_ps_roi_pool.py) gets its consumer here: single-level RPN ->
proposals -> position-sensitive score maps -> PSRoIPool vote.
Reference: the R-FCN variant of the lineage (SURVEY.md §2.1 PSRoIPool
row); Dai et al. 2016 for architecture constants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron_tpu.config import cfg_from_list, get_config
from detectron_tpu.data.synthetic import make_batch
from detectron_tpu.models.zoo import build_detector


def _cfg():
    cfg = get_config()
    cfg_from_list([
        "model.name=rfcn", "model.num_classes=4", "model.fpn_channels=64",
        "model.frozen_stages=0", "train.max_gt_boxes=8",
        "rpn.pre_nms_topk_train=64", "rpn.post_nms_topk_train=32",
        "rpn.pre_nms_topk_test=64", "rpn.post_nms_topk_test=16",
        "roi.batch_per_image=16", "test.detections_per_image=8",
    ], cfg)
    return cfg


def test_rfcn_builds_and_votes_position_sensitively():
    """Init + loss + grads + predict all run; the cls head must actually be
    position-sensitive: permuting the P*P channel groups of ps_cls changes
    the logits (a plain averaged head would be invariant)."""
    cfg = _cfg()
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))

    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), 2, (128, 128),
                   cfg.model.num_classes, max_gt=8),
    )
    # one value_and_grad program covers both the loss and grad assertions
    # (a separate loss_fn call would compile a near-identical program twice)
    (total, loss_dict), g = jax.value_and_grad(
        lambda p: det.loss_fn(p, batch, jax.random.key(1)), has_aux=True
    )(params)
    assert np.isfinite(float(total)), loss_dict
    assert set(loss_dict) == {"loss_rpn_cls", "loss_rpn_box", "loss_cls",
                              "loss_box"}
    flat = jax.tree.leaves(g)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in flat)
    assert np.isfinite(gn) and gn > 0.0
    # the PS maps themselves receive gradient
    ps_g = g["params"]["ps_cls"]["kernel"]
    assert float(jnp.sum(jnp.abs(ps_g))) > 0.0

    ib = {k: v for k, v in batch.items() if not k.startswith("gt_")}
    dets, masks = det.predict_fn(params, ib)
    assert masks is None
    assert dets.boxes.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(dets.scores, np.float32)).all()

    # position sensitivity: roll the P*P bin groups of the ps_cls kernel.
    # Pooled bin (i,j) reads ONLY its own group, so logits must change.
    k = cfg.model.num_classes
    p2 = cfg.roi.pool_size ** 2
    kern = params["params"]["ps_cls"]["kernel"]  # [1,1,C,P*P*K]
    rolled = kern.reshape(kern.shape[:-1] + (p2, k))
    rolled = jnp.roll(rolled, 1, axis=-2).reshape(kern.shape)
    bias = params["params"]["ps_cls"]["bias"]
    rolled_b = jnp.roll(bias.reshape(p2, k), 1, axis=0).reshape(-1)
    p2params = jax.tree_util.tree_map(lambda x: x, params)
    p2params["params"]["ps_cls"]["kernel"] = rolled
    p2params["params"]["ps_cls"]["bias"] = rolled_b
    feat = det.module.apply(params, ib["image"],
                            method=det.module.features)
    rois = jnp.asarray([[[8.0, 8.0, 96.0, 96.0]]] * 2).reshape(2, 1, 4)
    cls_a, _ = det.module.apply(params, feat, rois, method=det.module.box)
    cls_b, _ = det.module.apply(p2params, feat, rois, method=det.module.box)
    assert not np.allclose(np.asarray(cls_a), np.asarray(cls_b), atol=1e-5)


def test_rfcn_dilated_c5_trunk():
    """model.dilate_c5: the a-trous res5 trunk (the paper's) — c5 comes out
    at stride 16 (c4 resolution) and the detector runs end-to-end on it."""
    from detectron_tpu.models.resnet import ResNet

    net = ResNet(depth="resnet50", dilate_c5=True)
    params = net.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    feats = net.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert feats["c5"].shape[1:3] == feats["c4"].shape[1:3] == (4, 4)
    # weight shapes unchanged vs the strided stage (torchvision import)
    plain = ResNet(depth="resnet50").init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, plain)

    cfg = _cfg()
    cfg_from_list(["model.dilate_c5=True"], cfg)
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), 1, (128, 128),
                   cfg.model.num_classes, max_gt=8),
    )
    total, _ = det.loss_fn(params, batch, jax.random.key(1))
    assert np.isfinite(float(total))


@pytest.mark.slow
def test_rfcn_overfits_synthetic():
    """Loss drops decisively on a fixed tiny batch (the reference lineage's
    de-facto regression test, SURVEY.md §4)."""
    import optax

    cfg = _cfg()
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(1), 2, (128, 128),
                   cfg.model.num_classes, max_gt=8),
    )
    tx = optax.sgd(0.01, momentum=0.9)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, key):
        (loss, _), grads = jax.value_and_grad(
            lambda q: det.loss_fn(q, batch, key), has_aux=True)(p)
        up, o = tx.update(grads, o, p)
        return optax.apply_updates(p, up), o, loss

    losses = []
    for i in range(60):
        params, opt, loss = step(params, opt, jax.random.fold_in(
            jax.random.key(2), i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-10:]) < 0.5 * max(losses[:5]), losses[::10]


def test_rfcn_merged_table_equals_two_pools():
    """Round-5 perf rewrite: cls+box PS maps merge into ONE flat table
    before PSRoIPool (the 4-channel box table's backward scatter tiled at
    4/128 lanes; DESIGN.md §9). Pooling is per-channel, so the merged
    box() must equal pooling the two maps separately — pinned here."""
    from detectron_tpu.models.rfcn import RFCN_STRIDE, build_rfcn
    from detectron_tpu.ops.ps_roi_pool import ps_roi_pool

    cfg = _cfg()
    model = build_rfcn(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    xy1 = rng.rand(1, 5, 2).astype(np.float32) * 24
    wh = 8 + rng.rand(1, 5, 2).astype(np.float32) * 32
    rois = jnp.asarray(np.concatenate([xy1, xy1 + wh], -1))
    variables = model.init(jax.random.key(1), images, rois)

    feat = model.apply(variables, images, method=model.features)
    cls_logits, reg = model.apply(variables, feat, rois, method=model.box)

    # reference: two independent pools of the separate maps
    p = cfg.roi.pool_size
    cls_map = model.apply(variables, feat,
                          method=lambda m, f: m.ps_cls(f)).astype(jnp.float32)
    box_map = model.apply(variables, feat,
                          method=lambda m, f: m.ps_box(f)).astype(jnp.float32)
    ref_cls = ps_roi_pool(cls_map, rois, RFCN_STRIDE, output_size=p,
                          sampling_ratio=cfg.roi.sampling_ratio
                          ).mean(axis=(2, 3))
    ref_reg = ps_roi_pool(box_map, rois, RFCN_STRIDE, output_size=p,
                          sampling_ratio=cfg.roi.sampling_ratio
                          ).mean(axis=(2, 3))[:, :, None, :]
    np.testing.assert_allclose(np.asarray(cls_logits), np.asarray(ref_cls),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(reg), np.asarray(ref_reg),
                               rtol=1e-6, atol=1e-6)
