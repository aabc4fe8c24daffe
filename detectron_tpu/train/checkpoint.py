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
