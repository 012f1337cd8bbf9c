"""Minimal host-side batch loader (numpy, dependency-free).

Replaces torch DataLoader (reference build_geometry_dataloader, denoiser/dataset/dataset.py:277)
for feeding fixed-shape numpy batches into jit-compiled steps. Augmentation runs in ``__getitem__``
on the host exactly like the reference's Dataset; batches are stacked dicts of numpy arrays.

Data-parallel contract: the loader produces *global* batches (per-device batch x mesh size); the
training loop shards the leading dim over the mesh (parallel/mesh.py). Under multi-host, pass
``process_index``/``process_count``: every host builds the SAME global batch list (the shuffle
rng is (seed, epoch)-derived, identical across hosts) and serves a disjoint round-robin shard
of it, truncated to a common per-host count so SPMD hosts always step the same number of times
per epoch (trailing batches beyond ``global_count // process_count`` per host are skipped).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,  # indexable: __len__ + __getitem__(i, rng) -> dict[str, np.ndarray]
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        collate: Callable[[list[dict]], dict] | None = None,
        order: Any | None = None,  # custom serving order (e.g. part-count-sorted bucketing)
        bucket_key: Any | None = None,  # per-sample group id; batches never cross groups
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        self.collate = collate or collate_stack
        self.order = None if order is None else np.asarray(order, np.int64)
        self.bucket_key = None if bucket_key is None else np.asarray(bucket_key, np.int64)

    def __len__(self) -> int:
        # exact: batch membership per bucket is permutation-invariant, so the global batch
        # count is deterministic given (order, bucket_key, batch_size, drop_last)
        order = np.arange(len(self.dataset)) if self.order is None else self.order
        count = len(self._global_batches(order))
        if self.process_count > 1:
            count //= self.process_count
        return count

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n) if self.order is None else self.order
        rng = np.random.default_rng((self.seed, self.epoch))
        if self.shuffle:
            order = order[rng.permutation(len(order))]
        batches = self._global_batches(order, rng)
        if self.process_count > 1:
            per_host = len(batches) // self.process_count
            batches = batches[self.process_index :: self.process_count][:per_host]
        self.epoch += 1
        for idx in batches:
            items = [self.dataset.get(int(i), rng) for i in idx]
            yield self.collate(items)

    def _global_batches(self, order: np.ndarray, rng=None) -> list[np.ndarray]:
        """Split a (possibly shuffled) index order into the global batch list. With
        ``bucket_key``, batches are formed WITHIN each bucket (so every batch can be served
        at its bucket's shape pad, data/bucketing.py) and the batch list is shuffled when an
        rng is given — the standard bucketed-batching scheme: shapes stay homogeneous per
        batch while batch ORDER stays random across buckets."""
        batches = []
        if self.bucket_key is None:
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                if self.drop_last and len(idx) < self.batch_size:
                    break
                batches.append(idx)
            return batches
        for key in np.unique(self.bucket_key[order]):
            members = order[self.bucket_key[order] == key]  # keeps the shuffled order
            for start in range(0, len(members), self.batch_size):
                idx = members[start : start + self.batch_size]
                if self.drop_last and len(idx) < self.batch_size:
                    break
                batches.append(idx)
        if self.shuffle and rng is not None:
            batches = [batches[i] for i in rng.permutation(len(batches))]
        return batches


def prefetch_batches(iterable, depth: int = 2) -> Iterator[Any]:
    """Background-thread prefetch: overlaps host-side augmentation with device steps.

    The torch reference gets this from DataLoader(num_workers=...); here a single daemon
    thread drives the underlying iterator ahead of the consumer (bounded by ``depth``),
    which preserves the loader's rng call order exactly (one producer, same sequence) and
    therefore batch-for-batch determinism. On this 1-core host the augmentation runs while
    the chip computes the previous step — measured to hide most of the stage-1 loader cost
    (VALIDATION.md r3). Exceptions in the producer re-raise at the consumer; early consumer
    exit (max_steps breaks) signals the producer to stop."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 - re-raised at the consumer
            err.append(e)
        finally:
            # The sentinel MUST reach the consumer or it blocks in q.get() forever —
            # put_nowait would silently drop it whenever the queue is full at producer
            # exhaustion (every epoch end with a slow consumer). Keep trying until it
            # lands or the consumer signals exit.
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def collate_stack(items: list[dict[str, Any]]) -> dict[str, np.ndarray]:
    out = {}
    for k in items[0]:
        v0 = items[0][k]
        if isinstance(v0, (np.ndarray, np.generic, int, float, bool)):
            out[k] = np.stack([np.asarray(it[k]) for it in items], axis=0)
        else:  # strings & misc stay as lists (e.g. mesh_file_path)
            out[k] = [it[k] for it in items]
    return out
