"""Train state: optimizer, LR schedule, gradient transforms.

Equivalent of the reference's training setup (reference: train.py — SGD with
momentum 0.9, weight decay, warmup + step-decay LR, frozen backbone params;
SURVEY.md §2.2 "Train driver").

Implemented with optax; parameters the reference keeps frozen (all
FrozenBatchNorm params, conv1, stages <= frozen_stages) are masked out of
the update entirely (``optax.masked``), mirroring the reference's
requires_grad=False semantics.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from detectron_tpu.models.resnet import resnet_param_is_frozen


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def warmup_step_decay_schedule(cfg) -> optax.Schedule:
    """Linear warmup from base_lr*warmup_factor, then step decay."""
    base = cfg.train.base_lr
    warmup = optax.linear_schedule(
        init_value=base * cfg.train.warmup_factor,
        end_value=base,
        transition_steps=max(cfg.train.warmup_steps, 1),
    )
    boundaries = list(cfg.train.lr_decay_steps)
    decay = optax.piecewise_constant_schedule(
        init_value=base,
        boundaries_and_scales={b: cfg.train.lr_decay_factor for b in boundaries},
    )

    def schedule(step):
        return jnp.where(
            step < cfg.train.warmup_steps, warmup(step), decay(step)
        )

    return schedule


def trainable_mask(params, frozen_stages: int = 1):
    """Pytree of bools: False for params the reference freezes."""
    flat = traverse_util.flatten_dict(params)
    mask = {
        k: not resnet_param_is_frozen(k, frozen_stages)
        if ("backbone" in k)
        else True
        for k in flat
    }
    return traverse_util.unflatten_dict(mask)


def weight_decay_mask(params):
    """Decay only conv/dense kernels (not biases / norm params)."""
    flat = traverse_util.flatten_dict(params)
    mask = {k: k[-1] == "kernel" for k in flat}
    return traverse_util.unflatten_dict(mask)


def make_optimizer(cfg, params):
    schedule = warmup_step_decay_schedule(cfg)
    tx = optax.chain(
        optax.add_decayed_weights(
            cfg.train.weight_decay,
            mask={"params": weight_decay_mask(params["params"])},
        ),
        optax.sgd(learning_rate=schedule, momentum=cfg.train.momentum),
    )
    if cfg.train.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm), tx)
    # NB optax.masked passes masked-out updates through UNCHANGED, so frozen
    # params additionally get their updates zeroed by a second mask.
    t_mask = {"params": trainable_mask(params["params"], cfg.model.frozen_stages)}
    f_mask = jax.tree.map(lambda m: not m, t_mask)
    tx = optax.chain(
        optax.masked(tx, t_mask),
        optax.masked(optax.set_to_zero(), f_mask),
    )
    return tx, schedule


def create_train_state(cfg, params) -> tuple[TrainState, Any, optax.Schedule]:
    tx, schedule = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state), tx, schedule


def apply_gradients(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)
