"""Data-parallel SPMD tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectron_tpu.config import get_config
from detectron_tpu.data.synthetic import make_batch
from detectron_tpu.models.zoo import build_detector
from detectron_tpu.parallel import make_mesh, make_predict_step, make_train_step, shard_batch
from detectron_tpu.train import state as train_state


def small_cfg():
    c = get_config()
    c.model.name = "retinanet"
    c.model.num_classes = 4
    c.model.fpn_channels = 32
    c.model.frozen_stages = 0
    c.data.image_size = (128, 128)
    c.retinanet.pre_nms_topk = 100
    c.test.detections_per_image = 10
    return c


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_train_step_runs_and_replicates():
    cfg = small_cfg()
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    state, tx, _ = train_state.create_train_state(cfg, params)
    mesh = make_mesh()
    step = make_train_step(det, tx, mesh, donate=False)
    batch = shard_batch(
        jax.tree.map(jnp.asarray, make_batch(np.random.RandomState(0), 8, (128, 128), 4)),
        mesh,
    )
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
    # params replicated: every leaf sharding is fully replicated
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device_numerics():
    """The DP gradient step over 8 shards == single-device step on the same
    global batch (SURVEY.md §4 'distributed' test)."""
    cfg = small_cfg()
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    state, tx, _ = train_state.create_train_state(cfg, params)
    np_batch = make_batch(np.random.RandomState(1), 8, (128, 128), 4)
    batch = jax.tree.map(jnp.asarray, np_batch)
    key = jax.random.key(2)

    # single device
    @jax.jit
    def step1(st, b, k):
        def loss(p):
            t, ld = det.loss_fn(p, b, k)
            return t, ld

        (t, ld), g = jax.value_and_grad(loss, has_aux=True)(st.params)
        return train_state.apply_gradients(st, g, tx), t

    s1, t1 = step1(state, batch, key)

    mesh = make_mesh()
    stepn = make_train_step(det, tx, mesh, donate=False)
    sn, metrics = stepn(state, shard_batch(batch, mesh), key)

    assert abs(float(t1) - float(metrics["loss_total"])) < 1e-4
    a = jax.tree.leaves(s1.params)
    b = jax.tree.leaves(sn.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)


def test_dp_predict_step():
    cfg = small_cfg()
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    mesh = make_mesh()
    predict = make_predict_step(det, mesh)
    batch = shard_batch(
        jax.tree.map(jnp.asarray, make_batch(np.random.RandomState(0), 8, (128, 128), 4)),
        mesh,
    )
    dets, _ = predict(params, batch)
    assert dets.boxes.shape == (8, cfg.test.detections_per_image, 4)
    assert bool(jnp.all(jnp.isfinite(dets.boxes)))


@pytest.mark.slow
def test_mask_rcnn_dp_matches_single_device_at_512():
    """VERDICT r3 item 5: the flagship model's windowed-align custom-vjp
    path under a sharded mesh, at a realistic-ish shape — a 2-device DP
    step must match the single-device step on the concatenated batch.
    (The 128² RetinaNet test above can't see the mask/RoI gather+scatter
    semantics; this one runs the full Mask R-CNN train step at 512².)"""
    cfg = get_config()
    cfg.model.name = "mask_rcnn"
    cfg.model.num_classes = 6
    cfg.model.frozen_stages = 0  # grads must flow everywhere we compare
    cfg.data.image_size = (512, 512)
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (512, 512))
    state, tx, _ = train_state.create_train_state(cfg, params)
    np_batch = make_batch(np.random.RandomState(3), 2, (512, 512), 6)
    batch = jax.tree.map(jnp.asarray, np_batch)
    key = jax.random.key(7)

    @jax.jit
    def step1(st, b, k):
        k = jax.random.fold_in(k, st.step)  # mirror make_train_step's fold
        (t, _), g = jax.value_and_grad(
            lambda p: det.loss_fn(p, b, k), has_aux=True)(st.params)
        return train_state.apply_gradients(st, g, tx), t

    s1, t1 = step1(state, batch, key)

    mesh = make_mesh(2)
    stepn = make_train_step(det, tx, mesh, donate=False)
    sn, metrics = stepn(state, shard_batch(batch, mesh), key)

    assert abs(float(t1) - float(metrics["loss_total"])) < 1e-4
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sn.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)
