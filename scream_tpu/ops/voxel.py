"""Voxel-grid downsampling as a jittable, fixed-capacity XLA op.

TPU-native replacement for Open3D's C++ ``voxel_down_sample``, which the
reference calls both offline (`/root/reference/process_3d_match.py:31`,
`/root/reference/process_kitti.py:55-56`) and on the per-item path
(`/root/reference/datasets/open_gf.py:22` — the coarse-DEM downsample at
resolution 20 runs inside every ``__getitem__``).

Semantics match Open3D: voxel index = floor((p - min_bound) / voxel_size),
output point = centroid (mean) of all points falling in that voxel. Because
XLA needs static shapes, the op takes a ``capacity`` (max number of output
voxels) and returns ``(points, mask)`` with invalid rows zeroed; voxels beyond
capacity are dropped deterministically in voxel-key order.

Algorithm (sort-based, MXU/VPU friendly — no host, no hash tables):
  1. integer voxel coords per point,
  2. lexicographic sort on the (c0, c1, c2) triple (same order as a
     linearized key, but overflow-proof on fine grids; invalid points get
     sentinel coords that sort last),
  3. run-starts (coords != previous coords) -> cumsum gives a dense segment id,
  4. segment-sum coordinates and counts, divide -> centroids.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_SENTINEL = jnp.iinfo(jnp.int32).max


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(
    points: jnp.ndarray,
    voxel_size: jnp.ndarray | float,
    capacity: int,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel-grid downsample ``(N, 3)`` points -> ``(capacity, 3)`` + bool mask.

    Args:
      points: ``(N, 3)`` float array.
      voxel_size: scalar voxel edge length (may be traced).
      capacity: static max number of output voxels.
      mask: optional ``(N,)`` validity mask for padded inputs.

    Returns:
      ``(centroids, valid)`` with ``centroids[i]`` the mean of the points in
      the i-th occupied voxel (ordered by voxel key) and ``valid[i]`` False
      for unoccupied capacity slots.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)

    pts32 = points.astype(jnp.float32)
    big = jnp.float32(3e38)
    origin = jnp.min(jnp.where(mask[:, None], pts32, big), axis=0)

    coords = jnp.floor((pts32 - origin) / voxel_size).astype(jnp.int32)
    # Sort lexicographically on the (c0, c1, c2) triple — same order as the
    # linearized voxel key but immune to int32 overflow of dims[0]*dims[1]*
    # dims[2] on fine grids (int64 is unavailable without jax x64). Invalid
    # points get int32-max coords: they sort last and are excluded from
    # run-starts/segments via valid_sorted anyway.
    coords = jnp.where(mask[:, None], coords, _SENTINEL)
    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    coords_sorted = coords[order]
    pts_sorted = pts32[order]
    valid_sorted = mask[order]

    prev = jnp.concatenate(
        [jnp.full((1, 3), -1, dtype=coords_sorted.dtype), coords_sorted[:-1]]
    )
    run_start = jnp.any(coords_sorted != prev, axis=1) & valid_sorted
    seg_id = jnp.cumsum(run_start.astype(jnp.int32)) - 1  # dense id per voxel
    seg_id = jnp.where(valid_sorted, seg_id, capacity)  # invalid -> dropped bucket

    sums = jax.ops.segment_sum(pts_sorted, seg_id, num_segments=capacity + 1)[:capacity]
    counts = jax.ops.segment_sum(
        jnp.ones((n,), dtype=jnp.float32), seg_id, num_segments=capacity + 1
    )[:capacity]

    out_valid = counts > 0
    centroids = sums / jnp.clip(counts[:, None], 1.0, None)
    centroids = jnp.where(out_valid[:, None], centroids, 0.0)
    return centroids, out_valid


def voxel_downsample_np(points, voxel_size):
    """Host-side (numpy) reference implementation with identical semantics.

    Used by the offline preprocessors (`scream_tpu/data/preprocess.py`) and as
    the oracle in tests. Returns only the occupied voxels, ordered by key.
    """
    import numpy as np

    pts = np.asarray(points, dtype=np.float64)
    origin = pts.min(axis=0)
    coords = np.floor((pts - origin) / voxel_size).astype(np.int64)
    dims = coords.max(axis=0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    pts_sorted = pts[order]
    starts = np.flatnonzero(np.concatenate([[True], key_sorted[1:] != key_sorted[:-1]]))
    sums = np.add.reduceat(pts_sorted, starts, axis=0)
    counts = np.diff(np.concatenate([starts, [len(pts)]]))
    return (sums / counts[:, None]).astype(np.float32)
