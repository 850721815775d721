"""Pre-collated bucket-shard cache: at-scale eval with zero per-item work.

At real split sizes the eval wall clock on a small host is LOADER-bound:
the device sustains 200+ pairs/s while the CLI streamed ~6-8 — single-core
per-item ``.npy`` reads, normalization, and padding in Python
(docs/EVAL_SNAPSHOT.md round-4 finding). The reference never hits this
because it runs one pair per forward anyway
(`/root/reference/evaluate_3d_match.py:84-100`, batch-1 torch loader); a
batched TPU pipeline starves without a fat input path.

This module does the per-item work ONCE: a build pass routes every item
through the exact same bucket assignment + ``collate_pairs`` padding the
:class:`~scream_tpu.data.loader.BucketedPairLoader` applies, and writes the
padded batches into per-bucket contiguous ``.npy`` memmaps. The streaming
:class:`CollatedPairLoader` then yields batches by SLICING those memmaps —
no per-item Python, no padding, no normalization; the OS page cache feeds
the device directly. Metrics are bit-identical to the bucketed loader: the
same items land in the same-capacity buckets with the same padding, and
every protocol accumulator is order-independent sums.

CLI surface: ``evaluate --cache-dir DIR`` (builds on first use) and
``preprocess collate`` (explicit pre-build).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_META = "collated_meta.json"
_VERSION = 1


def build_collated_cache(
    dataset,
    out_dir: str,
    buckets: Sequence[int] = (1024, 2048, 4096, 8192, 16384),
    num_workers: int = 4,
    verbose: bool = True,
) -> Dict:
    """One-time pass: bucket-assign, pad, and persist every item of
    ``dataset`` into per-bucket memmap shards under ``out_dir``.

    Routes through :class:`BucketedPairLoader` itself (shuffle off) so the
    bucket ladder, padding, and sidecar handling cannot drift from the
    streaming path. Returns the meta dict (also written to
    ``collated_meta.json``).
    """
    from scream_tpu.data.loader import BucketedPairLoader

    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    loader = BucketedPairLoader(dataset, batch_size=16, buckets=buckets,
                                shuffle=False, num_workers=num_workers)
    counts = {int(cap): len(items)
              for cap, items in loader._assignment.items()}

    mm: Dict[int, Dict[str, np.ndarray]] = {}
    fill: Dict[int, int] = {}

    def _open(cap: int, batch: Dict[str, np.ndarray]):
        arrs = {}
        for k, v in batch.items():
            shape = (counts[cap],) + v.shape[1:]
            arrs[k] = np.lib.format.open_memmap(
                os.path.join(out_dir, f"b{cap}_{k}.npy"), mode="w+",
                dtype=v.dtype, shape=shape)
        return arrs

    for batch in loader:
        cap = batch["src"].shape[1]
        if cap not in mm:
            mm[cap] = _open(cap, batch)
            fill[cap] = 0
        o = fill[cap]
        b = len(batch["src"])
        for k, v in batch.items():
            mm[cap][k][o:o + b] = v
        fill[cap] = o + b

    assert fill == counts, (fill, counts)
    for arrs in mm.values():
        for a in arrs.values():
            a.flush()
    meta = {
        "version": _VERSION,
        "ladder": [int(b) for b in sorted(buckets)],
        "buckets": {str(cap): {"n": counts[cap],
                               "keys": sorted(mm[cap].keys())}
                    for cap in sorted(mm)},
        "n_items": int(sum(counts.values())),
        "build_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    if verbose:
        import sys

        print(f"[collate] {meta['n_items']} items -> "
              f"{len(counts)} bucket shard(s) in {meta['build_s']}s "
              f"({out_dir})", file=sys.stderr)
    return meta


def has_collated_cache(cache_dir: str) -> bool:
    return os.path.exists(os.path.join(cache_dir, _META))


class CollatedPairLoader:
    """Stream padded batches by slicing the memmap shards of a built cache.

    Yields the same batch dicts as the bucketed loader (``src``, ``tgt``,
    masks, pose, scale/center, optional info sidecars), bucket by bucket in
    ascending capacity order. Per batch the only host work is one memmap
    slice per key — the reason this exists (see module docstring).
    """

    def __init__(self, cache_dir: str, batch_size: int):
        if not has_collated_cache(cache_dir):
            raise FileNotFoundError(
                f"no collated cache at {cache_dir} (missing {_META}); "
                "build one with preprocess collate / evaluate --cache-dir")
        with open(os.path.join(cache_dir, _META)) as f:
            self.meta = json.load(f)
        if self.meta.get("version") != _VERSION:
            raise ValueError(
                f"collated cache version {self.meta.get('version')} != "
                f"supported {_VERSION}; rebuild the cache")
        self.batch_size = batch_size
        self._parts = []
        for cap_s in sorted(self.meta["buckets"], key=int):
            info = self.meta["buckets"][cap_s]
            arrs = {
                k: np.load(os.path.join(cache_dir, f"b{cap_s}_{k}.npy"),
                           mmap_mode="r")
                for k in info["keys"]
            }
            self._parts.append((int(cap_s), info["n"], arrs))

    def __len__(self) -> int:
        return sum(-(-n // self.batch_size) for _, n, _ in self._parts)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for _cap, n, arrs in self._parts:
            for i in range(0, n, self.batch_size):
                yield {k: a[i:i + self.batch_size] for k, a in arrs.items()}


def collated_or_build(
    dataset,
    cache_dir: str,
    batch_size: int,
    buckets: Optional[Sequence[int]] = None,
) -> CollatedPairLoader:
    """Open the cache at ``cache_dir``, building it from ``dataset`` first
    if absent (the ``evaluate --cache-dir`` entry point)."""
    if not has_collated_cache(cache_dir):
        build_collated_cache(dataset, cache_dir,
                             **({"buckets": tuple(buckets)} if buckets else {}))
    loader = CollatedPairLoader(cache_dir, batch_size)
    if buckets and loader.meta.get("ladder") != [int(b) for b in sorted(buckets)]:
        import sys

        print(f"[collate] WARNING: cache at {cache_dir} was built with "
              f"bucket ladder {loader.meta.get('ladder')} != requested "
              f"{sorted(buckets)} — delete the dir to rebuild",
              file=sys.stderr)
    return loader
