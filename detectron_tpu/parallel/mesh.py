"""Device mesh + sharded train/predict steps (data parallelism over ICI).

TPU-native replacement for the reference's single-process multi-GPU
replicate/scatter/gather data parallelism (reference: nn.DataParallel-style
wrapper in train.py; SURVEY.md §2.3 / §5.8). Instead of host-side
scatter/gather:

  * a 1-D ``jax.sharding.Mesh`` over all devices carries the ``data`` axis;
  * params/optimizer state are replicated, batches are sharded on their
    leading axis via ``NamedSharding``;
  * ``jax.jit`` with these shardings compiles ONE SPMD program whose
    gradient all-reduce rides ICI (XLA inserts the collectives);
  * multi-host extends transparently: each host feeds its local shard
    (jax.distributed + per-host data sharding), collectives ride ICI within
    a slice and DCN across slices.

The same code runs on any device count, including the 8-virtual-CPU test
mesh (SURVEY.md §4) and the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Multi-host init (SURVEY.md §5.8): call once per host before device
    use. No-ops cleanly in single-process runs (the common case here).
    Returns (process_index, process_count)."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shardings(mesh: Mesh, axis: str = "data"):
    """(replicated, batch-sharded) NamedShardings."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch with its leading axis sharded over the mesh.

    Single-process: a plain device_put with the batch sharding. Multi-host:
    each host holds only its slice of the global batch, so the global array
    is assembled from per-process local shards (the leading dim of the
    result is local_batch * process_count)."""
    _, data_sh = shardings(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, data_sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            data_sh, np.asarray(x)
        ),
        batch,
    )


def make_train_step(detector, tx, mesh: Mesh, axis: str = "data", donate: bool = True):
    """Compile a data-parallel train step: (state, batch, key) -> (state, metrics).

    The per-device loss is averaged globally by jnp.mean over the sharded
    batch dimension inside one SPMD program, so gradients are already the
    global average — no explicit pmean needed.
    """
    from detectron_tpu.train.state import TrainState, apply_gradients

    repl, data_sh = shardings(mesh, axis)

    def step(state: TrainState, batch, key):
        key = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            total, ld = detector.loss_fn(params, batch, key)
            return total, ld

        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = apply_gradients(state, grads, tx)
        metrics = dict(ld)
        metrics["loss_total"] = total
        return new_state, metrics

    state_sh = None  # inferred: replicate
    return jax.jit(
        step,
        in_shardings=(repl, data_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_predict_step(detector, mesh: Mesh, axis: str = "data"):
    """Compile a data-parallel predict step: (params, batch) -> outputs."""
    repl, data_sh = shardings(mesh, axis)
    return jax.jit(
        lambda params, batch: detector.predict_fn(params, batch),
        in_shardings=(repl, data_sh),
        out_shardings=data_sh,
    )
