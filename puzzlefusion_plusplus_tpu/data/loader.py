"""Minimal host-side batch loader (numpy, dependency-free).

Replaces torch DataLoader (reference build_geometry_dataloader, denoiser/dataset/dataset.py:277)
for feeding fixed-shape numpy batches into jit-compiled steps. Augmentation runs in ``__getitem__``
on the host exactly like the reference's Dataset; batches are stacked dicts of numpy arrays.

Data-parallel contract: the loader produces *global* batches (per-device batch x mesh size); the
training loop shards the leading dim over the mesh (parallel/mesh.py). Under multi-host, pass
``process_index``/``process_count`` to read a disjoint shard of the dataset per host.
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

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n) if self.order is None else self.order
        rng = np.random.default_rng((self.seed, self.epoch))
        if self.shuffle:
            order = order[rng.permutation(len(order))]
        order = order[self.process_index :: self.process_count]
        self.epoch += 1
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            items = [self.dataset.get(int(i), rng) for i in idx]
            yield self.collate(items)


def collate_stack(items: list[dict[str, Any]]) -> dict[str, np.ndarray]:
    out = {}
    for k in items[0]:
        v0 = items[0][k]
        if isinstance(v0, (np.ndarray, np.generic, int, float, bool)):
            out[k] = np.stack([np.asarray(it[k]) for it in items], axis=0)
        else:  # strings & misc stay as lists (e.g. mesh_file_path)
            out[k] = [it[k] for it in items]
    return out
