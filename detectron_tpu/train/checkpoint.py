"""Checkpoint save/restore via orbax.

Equivalent of the reference's ``torch.save({model, optimizer, step})`` +
``--restore`` resume path (reference: snapshot logic in train.py; SURVEY.md
§5.4), upgraded to orbax's async, sharding-aware CheckpointManager.
"""

from __future__ import annotations

import orbax.checkpoint as ocp

from detectron_tpu.train.state import TrainState


def make_manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        ),
    )


def save(manager: ocp.CheckpointManager, state: TrainState):
    manager.save(int(state.step), args=ocp.args.StandardSave(state))


def restore(manager: ocp.CheckpointManager, template: TrainState) -> TrainState:
    """Restore the latest snapshot into the structure of ``template``."""
    step = manager.latest_step()
    if step is None:
        return template
    return manager.restore(step, args=ocp.args.StandardRestore(template))


def restore_params(manager: ocp.CheckpointManager, params):
    """Restore only (params, step) from the latest snapshot.

    Structure-independent of the optimizer the training run used: eval
    must not have to reconstruct the train-time optax chain (caught by
    the fixture train->eval roundtrip test — a grad-clip knob set on the
    train CLI but not the eval CLI changed opt_state's tree structure and
    broke the full-state restore). Returns (params, step) or
    (params, None) when no snapshot exists."""
    step = manager.latest_step()
    if step is None:
        return params, None
    import jax.numpy as jnp

    out = manager.restore(
        step,
        args=ocp.args.PyTreeRestore(
            {"step": jnp.asarray(step), "params": params},
            partial_restore=True,
        ),
    )
    return out["params"], int(out["step"])
