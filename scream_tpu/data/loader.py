"""Batched, prefetching host->device input pipeline.

The reference iterates a torch DataLoader at batch 1 with synchronous
``.to(device)`` per pair (`/root/reference/train_3d_match.py:19-20,170`).
Here the loader assembles padded batches on the host with a worker thread
pool, keeps a prefetch queue ahead of the device step, and hands out numpy
batches that jit'd step functions consume in a single transfer — the TPU
input-pipeline idiom (device never waits on per-item Python work).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from scream_tpu.data.batching import collate_dem, collate_pairs


class PairLoader:
    """Iterate padded registration batches from any PairDataset-like source."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        src_capacity: int,
        tgt_capacity: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.src_capacity = src_capacity
        self.tgt_capacity = tgt_capacity or src_capacity
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _collate(self, items):
        return collate_pairs(items, self.src_capacity, self.tgt_capacity)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        if self.num_workers <= 0:
            for idxs in batches:
                yield self._collate([self.dataset[int(i)] for i in idxs])
            return

        # Background assembly: a thread pool reads items, a bounded queue keeps
        # `prefetch` ready batches ahead of the consumer.
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(lambda i: self.dataset[int(i)], idxs))
                    q.put(self._collate(items))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def prefetch_to_device(iterator, size: int = 2):
    """Asynchronously stage host batches on the device, ``size`` ahead.

    ``jax.device_put`` is async — dispatching the transfer for batch i+1
    while batch i computes hides the host->device copy (substantial when the
    device link is slow). Yields dicts of device arrays.
    """
    import collections

    import jax
    import jax.numpy as jnp

    queue = collections.deque()

    def stage(batch):
        return {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()}

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(stage(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(stage(next(it)))
        except StopIteration:
            pass
        yield out


class DEMLoader(PairLoader):
    """OpenGF variant: pads dsm/dem/dem_coarse with independent capacities."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        dsm_capacity: int,
        dem_capacity: int,
        coarse_capacity: int,
        **kw,
    ):
        super().__init__(dataset, batch_size, src_capacity=dsm_capacity, **kw)
        self.dsm_capacity = dsm_capacity
        self.dem_capacity = dem_capacity
        self.coarse_capacity = coarse_capacity

    def _collate(self, items):
        return collate_dem(
            items, self.dsm_capacity, self.dem_capacity, self.coarse_capacity
        )
