"""Parallelism: device mesh + SPMD data-parallel steps."""

from detectron_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_predict_step,
    make_train_step,
    shard_batch,
    shardings,
)
