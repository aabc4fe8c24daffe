"""Training infrastructure tests: schedule, masking, overfit, checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron_tpu.config import get_config
from detectron_tpu.data.synthetic import make_batch
from detectron_tpu.models.zoo import build_detector
from detectron_tpu.train import state as train_state


def small_cfg(name="retinanet"):
    c = get_config()
    c.model.name = name
    c.model.num_classes = 4
    c.model.fpn_channels = 32
    c.model.frozen_stages = 0
    c.data.image_size = (128, 128)
    c.train.base_lr = 0.005
    c.train.grad_clip_norm = 1.0
    c.train.warmup_steps = 10
    c.train.warmup_factor = 0.1
    c.train.lr_decay_steps = (1000,)
    c.train.weight_decay = 1e-4
    c.rpn.pre_nms_topk_train = 64
    c.rpn.post_nms_topk_train = 32
    c.roi.batch_per_image = 16
    c.retinanet.pre_nms_topk = 100
    return c


def test_schedule_warmup_and_decay():
    cfg = small_cfg()
    cfg.train.base_lr = 1.0
    cfg.train.warmup_steps = 100
    cfg.train.warmup_factor = 0.5
    cfg.train.lr_decay_steps = (200, 300)
    cfg.train.lr_decay_factor = 0.1
    s = train_state.warmup_step_decay_schedule(cfg)
    assert abs(float(s(0)) - 0.5) < 1e-6
    assert abs(float(s(100)) - 1.0) < 1e-2
    assert abs(float(s(150)) - 1.0) < 1e-6
    assert abs(float(s(250)) - 0.1) < 1e-6
    assert abs(float(s(350)) - 0.01) < 1e-6


def test_frozen_params_do_not_update():
    cfg = small_cfg()
    cfg.model.frozen_stages = 1
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    state, tx, _ = train_state.create_train_state(cfg, params)
    batch = jax.tree.map(
        jnp.asarray, make_batch(np.random.RandomState(0), 1, (128, 128), 4)
    )
    grads = jax.grad(lambda p: det.loss_fn(p, batch, jax.random.key(1))[0])(
        state.params
    )
    new_state = train_state.apply_gradients(state, grads, tx)
    old = state.params["params"]["backbone"]
    new = new_state.params["params"]["backbone"]
    # frozen: conv1 and layer1 identical; bn params identical everywhere
    np.testing.assert_array_equal(np.asarray(old["conv1"]["kernel"]),
                                  np.asarray(new["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(old["layer1_0"]["conv2"]["kernel"]),
        np.asarray(new["layer1_0"]["conv2"]["kernel"]),
    )
    np.testing.assert_array_equal(np.asarray(old["layer3_0"]["bn2"]["weight"]),
                                  np.asarray(new["layer3_0"]["bn2"]["weight"]))
    # trainable: layer2 conv changed
    assert not np.array_equal(
        np.asarray(old["layer2_0"]["conv2"]["kernel"]),
        np.asarray(new["layer2_0"]["conv2"]["kernel"]),
    )


@pytest.mark.parametrize("name", ["retinanet", "faster_rcnn"])
def test_overfit_loss_decreases(name):
    """SURVEY.md §4 integration test: loss drops markedly on a fixed batch."""
    cfg = small_cfg(name)
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    state, tx, _ = train_state.create_train_state(cfg, params)
    batch = jax.tree.map(
        jnp.asarray, make_batch(np.random.RandomState(3), 2, (128, 128), 4)
    )

    @jax.jit
    def step(st, key):
        (total, ld), grads = jax.value_and_grad(
            lambda p: det.loss_fn(p, batch, key), has_aux=True
        )(st.params)
        return train_state.apply_gradients(st, grads, tx), total

    losses = []
    for i in range(25):
        state, total = step(state, jax.random.key(i))
        losses.append(float(total))
    assert np.isfinite(losses).all()
    early = np.mean(losses[:3])
    late = np.mean(losses[-3:])
    assert late < 0.7 * early, (early, late, losses)


def test_bf16_training_step_fp32_master(monkeypatch):
    """bf16-compute training (cfg.model.dtype=bfloat16 with fp32 master
    params): losses finite and decreasing, params stay fp32 and update —
    the production mixed-precision path (VERDICT r1 item 4)."""
    cfg = small_cfg("mask_rcnn")
    cfg.model.dtype = "bfloat16"
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32  # master copy stays fp32
    state, tx, _ = train_state.create_train_state(cfg, params)
    batch = jax.tree.map(
        jnp.asarray, make_batch(np.random.RandomState(3), 2, (128, 128), 4)
    )

    @jax.jit
    def step(st, key):
        (total, ld), grads = jax.value_and_grad(
            lambda p: det.loss_fn(p, batch, key), has_aux=True
        )(st.params)
        return train_state.apply_gradients(st, grads, tx), total

    losses = []
    for i in range(20):
        state, total = step(state, jax.random.key(i))
        losses.append(float(total))
    assert np.isfinite(losses).all(), losses
    assert np.mean(losses[-3:]) < 0.9 * np.mean(losses[:3]), losses
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_checkpoint_roundtrip(tmp_path):
    import warnings

    warnings.filterwarnings("ignore")
    from detectron_tpu.train import checkpoint as ckpt

    cfg = small_cfg()
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    state, tx, _ = train_state.create_train_state(cfg, params)
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    mgr = ckpt.make_manager(str(tmp_path / "ckpt"))
    ckpt.save(mgr, state)
    mgr.wait_until_finished()
    template = train_state.TrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree.map(jnp.zeros_like, state.params),
        opt_state=jax.tree.map(
            lambda x: jnp.zeros_like(x) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
    )
    restored = ckpt.restore(mgr, template)
    assert int(restored.step) == 7
    orig = jax.tree.leaves(state.params)
    rest = jax.tree.leaves(restored.params)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
