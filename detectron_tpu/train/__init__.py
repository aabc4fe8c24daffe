"""Training: state, optimizer, schedule, checkpointing."""

from detectron_tpu.train.state import (  # noqa: F401
    TrainState,
    apply_gradients,
    create_train_state,
    make_optimizer,
    trainable_mask,
    warmup_step_decay_schedule,
)
