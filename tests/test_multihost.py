"""2-process ``jax.distributed`` execution of the multi-host code paths.

VERDICT r4 item 1: ``shard_batch``'s ``make_array_from_process_local_data``
branch, ``eval.merge_across_processes``, and coordinator-based
``initialize_distributed`` only run when ``jax.process_count() > 1`` — so
this launches a real 2-process x 2-device CPU cluster (localhost gloo
coordinator, tests/multihost_worker.py) and asserts:

  (a) the 2-host DP train step's loss/params match a single-process
      4-device run on the identical global batch;
  (b) the cross-process eval merge delivers both hosts' ragged detection
      records everywhere;
  (c) (fast, single-process) the loader's ``process_shard`` striding gives
      each host a disjoint cover of the val split.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=_REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), str(tmp_path)],
            cwd=_REPO, env=env,
            stdout=open(tmp_path / f"w{i}.log", "w"), stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=1200)
    finally:
        for p in procs:
            p.poll() is None and p.kill()
    logs = {i: (tmp_path / f"w{i}.log").read_text() for i in range(2)}
    assert all(p.returncode == 0 for p in procs), logs
    results = [json.load(open(tmp_path / f"result{i}.json")) for i in range(2)]

    # cluster shape + both processes saw the same replicated outputs
    for i, r in enumerate(results):
        assert (r["pidx"], r["pcount"], r["global_devices"]) == (i, 2, 4)
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["pnorm"] == results[1]["pnorm"]
    # the two hosts' batch rows tile the global batch disjointly
    assert sorted(results[0]["rows"] + results[1]["rows"]) == [0, 1, 2, 3]

    # (b) merge: host 0 contributed 2 records (ids 0,1), host 1 contributed
    # 3 (100..102); everyone holds all 5, payloads intact
    for r in results:
        assert r["merged_gt_ids"] == [0, 1, 100, 101, 102]
        assert r["merged_dt_ids"] == [0, 1, 100, 101, 102]
        assert r["merged_scores_ok"]

    # (a) equality with a single-process run: same tiny model, same global
    # batch, same key, 4 of this process's virtual devices
    from __graft_entry__ import _cfg
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.zoo import build_detector
    from detectron_tpu.parallel import make_mesh, make_train_step, shard_batch
    from detectron_tpu.train.state import create_train_state

    cfg = _cfg(tiny=True)
    det = build_detector(cfg)
    params = jax.tree.map(np.asarray, det.init(jax.random.key(0),
                                               cfg.data.image_size))
    state, tx, _ = create_train_state(cfg, params)
    state = jax.tree.map(np.asarray, state)
    batch = make_batch(
        np.random.RandomState(0), 4, cfg.data.image_size,
        cfg.model.num_classes, max_gt=cfg.train.max_gt_boxes,
    )
    mesh = make_mesh(4)
    step = make_train_step(det, tx, mesh, donate=False)
    new_state, metrics = step(state, shard_batch(batch, mesh),
                              np.asarray(jax.random.PRNGKey(1)))
    ref_loss = float(metrics["loss_total"])
    ref_pnorm = float(np.sqrt(sum(
        float(np.vdot(np.asarray(x), np.asarray(x)))
        for x in jax.tree.leaves(new_state.params))))
    assert abs(ref_loss - results[0]["loss"]["loss_total"]) < 1e-5, (
        ref_loss, results[0]["loss"])
    assert abs(ref_pnorm - results[0]["pnorm"]) < 1e-4 * max(1.0, ref_pnorm)


def test_loader_process_shard_strides_disjoint_cover(tmp_path):
    """Each host's eval loader visits a disjoint stride of the val split and
    together they cover it exactly once (eval.py wiring; mesh.py contract)."""
    from detectron_tpu.config import get_config
    from detectron_tpu.data.loader import Loader, get_dataset
    from tests.fixture_coco import make_fixture

    cfg = get_config()
    cfg.data.dataset = "coco"
    cfg.data.root = make_fixture(str(tmp_path / "coco"))
    cfg.data.short_side = 96
    cfg.data.max_size = 128
    cfg.data.image_size = (128, 128)
    cfg.train.batch_size = 4  # global; each of 2 hosts gets 2/batch
    cfg.data.num_workers = 1
    ds = get_dataset(cfg, "val", train=False)  # 6 fixture images
    seen = {}
    for idx in range(2):
        loader = Loader(ds, cfg, train=False, process_shard=(idx, 2))
        assert loader.batch_size == 2
        ids = []
        for batch in loader:
            ids.extend(int(i) for i in batch["_image_id"])
        # tail padded by repetition to a full local batch
        assert len(ids) % 2 == 0
        seen[idx] = set(ids)
        # stride pinned: host idx sees dataset indices idx, idx+2, ...
        expect = {int(ds.example(i)["image_id"])
                  for i in range(idx, len(ds), 2)}
        assert seen[idx] == expect
    assert seen[0] | seen[1] == {
        int(ds.example(i)["image_id"]) for i in range(len(ds))}
    assert not (seen[0] & seen[1])
