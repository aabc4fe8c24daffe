"""Host input pipeline: multi-threaded prefetching loader with fixed-shape
batches.

Equivalent of the reference's multi-worker ``DataLoader`` (reference:
torch DataLoader usage in train.py; SURVEY.md §2.3 "within-node op
parallel"): worker threads decode/resize/augment (cv2 releases the GIL for
the heavy ops), a bounded queue double-buffers batches ahead of the device
step. All batches share one static shape so the compiled step never
retraces.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from detectron_tpu.data.transforms import canvas_for_image, preprocess_example


def get_dataset(cfg, split: str, train: bool):
    """Dataset factory (reference: libs/datasets/factory.py)."""
    name = cfg.data.dataset
    if name == "coco":
        from detectron_tpu.data.coco import CocoDataset

        return CocoDataset(
            cfg.data.root, split, with_masks=cfg.model.name == "mask_rcnn"
        )
    if name == "voc":
        from detectron_tpu.data.voc import VocDataset

        return VocDataset(cfg.data.root, split)
    if name == "citypersons":
        from detectron_tpu.data.citypersons import CityPersonsDataset

        return CityPersonsDataset(cfg.data.root, split)
    if name == "synthetic":
        from detectron_tpu.data.synthetic import make_batch  # noqa: F401

        return None  # synthetic batches are generated directly
    raise ValueError(f"unknown dataset {name!r}")


class Loader:
    """Iterates fixed-shape batch dicts; infinite (shuffled) when train."""

    def __init__(self, dataset, cfg, train: bool = True, seed: int = 0,
                 num_workers: int | None = None, queue_size: int = 4,
                 process_shard: tuple[int, int] | None = None):
        """process_shard=(index, count) gives each host a disjoint slice of
        the dataset and of the global batch (multi-host data parallelism,
        SURVEY.md §5.8); None = single-process (all data, full batch)."""
        self.dataset = dataset
        self.cfg = cfg
        self.train = train
        self.seed = seed
        self.num_workers = num_workers or cfg.data.num_workers
        self.queue_size = queue_size
        idx, count = process_shard or (0, 1)
        self.shard_index, self.shard_count = idx, count
        assert cfg.train.batch_size % count == 0, (
            "global batch must divide across hosts")
        self.batch_size = cfg.train.batch_size // count

    def _example(self, index: int, rng) -> dict:
        ex = self.dataset.example(index)
        canvas = canvas_for_image(ex["image"].shape[:2], self.cfg)
        out = preprocess_example(
            ex["image"], ex["boxes"], ex["classes"], self.cfg,
            rng=rng, train=self.train, gt_masks=ex.get("masks"),
            canvas_hw=canvas,
        )
        out["_image_id"] = ex.get("image_id", index)
        out["_orig_hw"] = np.asarray(ex.get("orig_hw", out["image"].shape[:2]))
        return out

    def _collate(self, examples: list) -> dict:
        keys = examples[0].keys()
        return {k: np.stack([e[k] for e in examples]) for k in keys}

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed)
        if not self.train:
            order = list(range(self.shard_index, n, self.shard_count))
            # pad the tail to a full batch by repeating the last example
            while len(order) % self.batch_size:
                order.append(order[-1])
            indices_iter = iter(order)
        else:
            def infinite():
                while True:
                    # identical permutation on every host (seeded), each
                    # host takes its own stride -> disjoint global batch
                    perm = rng.permutation(n)
                    yield from perm[self.shard_index :: self.shard_count]

            indices_iter = infinite()

        q: queue.Queue = queue.Queue(maxsize=self.queue_size * self.batch_size)
        stop = threading.Event()
        lock = threading.Lock()

        def worker(wid: int):
            wrng = np.random.RandomState(self.seed * 1000 + wid)
            while not stop.is_set():
                with lock:
                    try:
                        idx = next(indices_iter)
                    except StopIteration:
                        q.put(None)
                        return
                try:
                    q.put(self._example(int(idx), wrng))
                except Exception as e:  # surface worker errors
                    q.put(e)
                    return

        threads = [
            threading.Thread(target=worker, args=(i,), daemon=True)
            for i in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            # one partial batch per canvas shape (orientation buckets)
            buckets: dict = {}
            finished_workers = 0
            while True:
                item = q.get()
                if item is None:
                    finished_workers += 1
                    if finished_workers == self.num_workers:
                        break
                    continue
                if isinstance(item, Exception):
                    raise item
                key = item["image"].shape[:2]
                buckets.setdefault(key, []).append(item)
                if len(buckets[key]) == self.batch_size:
                    yield self._collate(buckets.pop(key))
            if not self.train:  # flush partial buckets (pad by repetition)
                for batch in buckets.values():
                    while len(batch) % self.batch_size:
                        batch.append(batch[-1])
                    yield self._collate(batch)
        finally:
            stop.set()
