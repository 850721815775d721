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

        yield from _queue_iter(
            batches,
            lambda pool, idxs: self._collate(
                list(pool.map(lambda i: self.dataset[int(i)], idxs))
            ),
            self.num_workers,
            self.prefetch,
        )


def _queue_iter(work, make_batch, num_workers: int, prefetch: int):
    """Shared producer/queue machinery for the threaded loaders.

    A daemon thread drives a pool that assembles batches ``prefetch`` ahead
    of the consumer; errors are forwarded (a dead producer without a
    sentinel would hang the consumer's ``q.get``), and an abandoned
    iteration winds the producer down instead of leaking it.

    ``work`` is a sequence of work units; ``make_batch(pool, unit)`` builds
    one collated batch.
    """
    # queue.Queue treats maxsize <= 0 as UNBOUNDED: prefetch=0 would let the
    # producer buffer the entire epoch (tens of GB of padded batches on the
    # 3DMatch train split) — clamp to at least one slot.
    q: "queue.Queue" = queue.Queue(maxsize=max(int(prefetch), 1))
    stop = threading.Event()

    def _put(item) -> bool:
        # Bounded put that aborts when the consumer goes away — a plain
        # q.put on a full queue would block forever if iteration is
        # abandoned early (leaking the thread, pool, and queued batches).
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                # Re-check after a successful put: the consumer may have
                # set stop between our is_set check and the put (its drain
                # then empties the queue), in which case continuing to
                # produce would read up to `prefetch` wasted batches.
                return not stop.is_set()
            except queue.Full:
                continue
        return False

    def producer():
        try:
            with ThreadPoolExecutor(num_workers) as pool:
                for unit in work:
                    if stop.is_set():
                        return
                    if not _put(make_batch(pool, unit)):
                        return
            _put(None)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            if isinstance(batch, BaseException):
                raise batch
            yield batch
    finally:
        stop.set()
        # Unblock a producer parked in q.put, then let it exit.
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


class BucketedPairLoader:
    """Pad-to-bucket loader: items grouped by cloud size, one compile per bucket.

    Real 3DMatch fragments span ~2k-20k points after voxel downsampling
    (SURVEY.md §5); a single padding capacity wastes compute on small clouds.
    This loader assigns each pair to the smallest bucket that fits
    ``max(n_src, n_tgt)``, batches within buckets, and interleaves the
    resulting batches — so XLA compiles once per bucket capacity and every
    batch is tightly padded.

    ``size_fn(dataset, i) -> (n_src, n_tgt)`` provides cheap size probing;
    the default reads npy headers via mmap for PairDataset-layout datasets
    and falls back to materializing the item.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        buckets=(1024, 2048, 4096, 8192, 16384),
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        size_fn=None,
        prefetch: int = 2,
    ):
        from scream_tpu.data.batching import bucket_for

        self.dataset = dataset
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.prefetch = prefetch

        size_fn = size_fn or _default_size_fn
        self._assignment = {}
        for i in range(len(dataset)):
            n_src, n_tgt = size_fn(dataset, i)
            cap = bucket_for(max(n_src, n_tgt), self.buckets)
            self._assignment.setdefault(cap, []).append(i)

    def __len__(self):
        total = 0
        for items in self._assignment.values():
            n = len(items)
            total += n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return total

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        plan = []  # (capacity, [indices])
        for cap, items in self._assignment.items():
            idxs = np.asarray(items)
            if self.shuffle:
                self.rng.shuffle(idxs)
            for i in range(0, len(idxs), self.batch_size):
                chunk = idxs[i : i + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    continue
                plan.append((cap, chunk))
        if self.shuffle:
            self.rng.shuffle(plan)

        if self.num_workers <= 0:
            for cap, chunk in plan:
                yield collate_pairs([self.dataset[int(i)] for i in chunk], cap)
            return

        yield from _queue_iter(
            plan,
            lambda pool, unit: collate_pairs(
                list(pool.map(lambda i: self.dataset[int(i)], unit[1])), unit[0]
            ),
            self.num_workers,
            self.prefetch,
        )


def _default_size_fn(dataset, i):
    """Cheap cloud-size probe, never materializing items when avoidable.

    Order: a dataset-provided ``size_hint(i)``; unwrap wrapper datasets
    (``_unwrap(i) -> (inner, inner_i)``: SkipDataset, HostShardDataset,
    ConcatDataset) and retry; npy headers via mmap for the artifact layout;
    finally materialize the item. Materializing matters beyond speed: for an
    augmenting dataset it would consume augmentation RNG draws just to probe
    sizes.
    """
    import os

    while True:
        hint = getattr(dataset, "size_hint", None)
        if hint is not None:
            return hint(i)
        unwrap = getattr(dataset, "_unwrap", None)
        if unwrap is None:
            break
        dataset, i = unwrap(i)

    d = getattr(dataset, "dir", None)
    if d is not None:
        src_path = os.path.join(d, "src%d.npy" % i)
        tgt_path = os.path.join(d, "tgt%d.npy" % i)
        if os.path.exists(src_path):
            n_src = np.load(src_path, mmap_mode="r").shape[0]
            n_tgt = np.load(tgt_path, mmap_mode="r").shape[0]
            cap = getattr(dataset, "max_points", None)
            if cap:
                n_src, n_tgt = min(n_src, cap), min(n_tgt, cap)
            return n_src, n_tgt
    item = dataset[i]
    return len(item["src"]), len(item["tgt"])


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Asynchronously stage host batches on the device, ``size`` ahead.

    ``jax.device_put`` is async — dispatching the transfer for batch i+1
    while batch i computes hides the host->device copy (substantial when the
    device link is slow). Yields dicts of device arrays. ``sharding``: an
    optional per-array placement (e.g. `parallel.batch_sharding(mesh)`) so
    multi-chip batches land sharded straight from the host instead of via a
    device-0 bounce + reshard.
    """
    import collections

    import jax

    staged = collections.deque()

    def stage(batch):
        # One async dispatch per array: device_put on the host array IS the
        # transfer (wrapping it in jnp.asarray would transfer twice).
        if sharding is None:
            return {k: jax.device_put(v) for k, v in batch.items()}
        # A trailing partial batch (drop_last=False loaders) cannot shard on
        # the data axis; place it single-device like the eval paths do.
        mesh = getattr(sharding, "mesh", None)
        if mesh is not None:
            b = len(next(iter(batch.values())))
            if b % dict(mesh.shape).get("data", 1) != 0:
                return {k: jax.device_put(v) for k, v in batch.items()}
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    it = iter(iterator)
    try:
        for _ in range(size):
            staged.append(stage(next(it)))
    except StopIteration:
        pass
    while staged:
        out = staged.popleft()
        try:
            staged.append(stage(next(it)))
        except StopIteration:
            pass
        yield out


class DEMLoader(PairLoader):
    """OpenGF variant: pads dsm/dem/dem_coarse.

    ``dsm_capacity`` and ``dem_capacity`` must be EQUAL: OpenGF tiles pair
    each DEM point with the highest surface point above it
    (`/root/reference/process_open_gf.py:217-231`), so the model's
    per-DSM-point prediction is compared index-for-index against the DEM —
    unequal paddings would misalign the L1 loss and the masks. Only the
    coarse-DEM capacity is independent.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        dsm_capacity: int,
        dem_capacity: int,
        coarse_capacity: int,
        **kw,
    ):
        if dem_capacity != dsm_capacity:
            raise ValueError(
                f"dsm_capacity ({dsm_capacity}) and dem_capacity "
                f"({dem_capacity}) must be equal: DSM and DEM points "
                f"correspond index-for-index in the OpenGF protocol"
            )
        super().__init__(dataset, batch_size, src_capacity=dsm_capacity, **kw)
        self.dsm_capacity = dsm_capacity
        self.dem_capacity = dem_capacity
        self.coarse_capacity = coarse_capacity

    def _collate(self, items):
        return collate_dem(
            items, self.dsm_capacity, self.dem_capacity, self.coarse_capacity
        )


class HostShardDataset:
    """Strided per-host shard of a dataset for multi-host (DCN) sweeps.

    The intra-pod scaling story is the device mesh (`scream_tpu/parallel`);
    across hosts the only coordination the workloads need is disjoint data
    (SURVEY.md §2.5): each process takes items ``shard, shard+count, ...``.
    Defaults read ``jax.process_index()/process_count()`` so the same script
    runs unchanged on one host or many.
    """

    def __init__(self, dataset, shard: int = None, count: int = None):
        if shard is None or count is None:
            import jax

            shard = jax.process_index() if shard is None else shard
            count = jax.process_count() if count is None else count
        assert 0 <= shard < count, (shard, count)
        self.dataset = dataset
        self.shard, self.count = shard, count

    def __len__(self):
        n = len(self.dataset)
        return (n - self.shard + self.count - 1) // self.count

    def __getitem__(self, i):
        if i < 0 or i >= len(self):
            raise IndexError(i)
        return self.dataset[self.shard + i * self.count]

    def _unwrap(self, i):
        return self.dataset, self.shard + i * self.count
