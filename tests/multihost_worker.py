"""Worker process for the 2-process multi-host test (not pytest-collected).

Launched by tests/test_multihost.py as ``python multihost_worker.py PID NPROCS
PORT OUTDIR``. Each worker owns 2 virtual CPU devices; together they form a
2-host x 2-device cluster over a localhost gloo coordinator. This executes the
three code paths that only exist when ``jax.process_count() > 1`` (VERDICT r4
item 1; SURVEY.md §5.8):

  * ``parallel.mesh.initialize_distributed`` with a real coordinator;
  * ``shard_batch``'s ``make_array_from_process_local_data`` branch (each host
    feeds only its slice of the global batch);
  * ``eval.merge_across_processes`` (pickled-bytes allgather of ragged
    per-host detection records).

Results (loss dict, post-step param norm, merged ids) are dumped as JSON for
the parent test to compare against its single-process 4-device run.
"""

import json
import os
import sys

import jax

# Same forcing as tests/conftest.py: a sitecustomize pins a remote TPU plugin
# and overrides JAX_PLATFORMS env vars, so go through jax.config before the
# backend initializes. 2 local devices/process -> 4 global over 2 processes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    sys.path.insert(0, _REPO)

    from detectron_tpu.parallel import (
        initialize_distributed, make_mesh, make_train_step, shard_batch,
        shardings,
    )

    # --- coordinator-based init (mesh.py:32) -----------------------------
    pidx, pcount = initialize_distributed(f"localhost:{port}", nprocs, pid)
    assert (pidx, pcount) == (pid, nprocs), (pidx, pcount)
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert jax.device_count() == 2 * nprocs, jax.device_count()

    from __graft_entry__ import _cfg
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.zoo import build_detector
    from detectron_tpu.train.state import create_train_state

    cfg = _cfg(tiny=True)
    det = build_detector(cfg)
    # Keep state leaves as host numpy (uncommitted): multi-host jit places
    # them per in_shardings; committed single-device arrays would be
    # rejected as incompatible with the global mesh.
    params = jax.tree.map(np.asarray, det.init(jax.random.key(0),
                                               cfg.data.image_size))
    state, tx, _ = create_train_state(cfg, params)
    state = jax.tree.map(np.asarray, state)

    n_global = jax.device_count()
    global_batch = make_batch(
        np.random.RandomState(0), n_global, cfg.data.image_size,
        cfg.model.num_classes, max_gt=cfg.train.max_gt_boxes,
    )

    mesh = make_mesh()
    _, data_sh = shardings(mesh)
    # Rows of the global batch owned by THIS process (robust to device
    # ordering): ask the sharding which global slices land on local devices.
    leaf = next(iter(global_batch.values()))
    imap = data_sh.devices_indices_map(leaf.shape)
    rows = sorted(
        idx[0].start for d, idx in imap.items() if d.process_index == pidx)
    local = {k: np.asarray(v)[np.asarray(rows)] for k, v in
             global_batch.items()}

    # --- shard_batch multi-host branch (mesh.py:71) ----------------------
    batch = shard_batch(local, mesh)
    b_leaf = jax.tree.leaves(batch)[0]
    assert not b_leaf.is_fully_addressable, "expected a multi-host global array"
    assert b_leaf.shape[0] == n_global, b_leaf.shape

    step = make_train_step(det, tx, mesh, donate=False)
    key = np.asarray(jax.random.PRNGKey(1))
    new_state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss_total"])
    loss = {k: float(v) for k, v in metrics.items()}
    pnorm = float(np.sqrt(sum(
        float(np.vdot(np.asarray(x), np.asarray(x)))
        for x in jax.tree.leaves(new_state.params))))

    # --- eval.merge_across_processes (eval.py) ---------------------------
    # Ragged, asymmetric payloads (different count per host) to exercise the
    # padded pickle buffer.
    from eval import merge_across_processes

    n_rec = 2 + pid
    gts = [{"image_id": 100 * pid + i, "boxes": np.full((2, 4), float(pid))}
           for i in range(n_rec)]
    dts = [{"image_id": 100 * pid + i, "scores": np.arange(3.0) + pid,
            "classes": np.array([1, 2, 3])} for i in range(n_rec)]
    mgts, mdts = merge_across_processes(gts, dts)
    assert len(mgts) == len(mdts) == 2 * 2 + 1, (len(mgts), len(mdts))

    out = {
        "pidx": pidx,
        "pcount": pcount,
        "global_devices": n_global,
        "rows": [int(r) for r in rows],
        "loss": loss,
        "pnorm": pnorm,
        "merged_gt_ids": sorted(int(g["image_id"]) for g in mgts),
        "merged_dt_ids": sorted(int(d["image_id"]) for d in mdts),
        "merged_scores_ok": all(
            np.allclose(d["scores"], np.arange(3.0) + d["image_id"] // 100)
            for d in mdts),
    }
    with open(os.path.join(outdir, f"result{pid}.json"), "w") as f:
        json.dump(out, f)
    print("worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()
