"""Parallelism: device mesh + SPMD data-parallel steps."""

from detectron_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    make_predict_step,
    make_train_step,
    shard_batch,
    shardings,
)
