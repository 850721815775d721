"""Pairwise squared distances and masked nearest-neighbor search.

TPU-native counterpart of `/root/reference/utils.py:72-78` (square_distance)
and the Open3D KD-tree searches (`/root/reference/utils.py:94-108`). The
N x M distance matrix is the framework's hot kernel: it is expressed as one
matmul plus rank-1 row/col norms so XLA maps it straight onto the MXU, and all
variable point counts are handled with boolean validity masks instead of
dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e10)


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Batched pairwise squared distances ``(..., N, 3), (..., M, 3) -> (..., N, M)``.

    Same expansion as `/root/reference/utils.py:72-78`:
    ``-2 S D^T + ||s||^2 + ||d||^2``, accumulated in fp32 on the MXU.
    """
    sq_src = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[..., :, None]
    sq_dst = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[..., None, :]
    # HIGHEST precision: the -2ab + a^2 + b^2 expansion catastrophically
    # cancels for nearby points, so the cross term must be exact fp32
    # (the MXU does fp32 via multi-pass; this matmul is cheap, K=3).
    cross = jnp.einsum(
        "...nd,...md->...nm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Clamp: the expansion can go slightly negative for (near-)identical
    # points, which would NaN any downstream sqrt.
    return jnp.maximum(sq_src + sq_dst - 2.0 * cross, 0.0)


def masked_square_distance(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    src_mask: Optional[jnp.ndarray] = None,
    dst_mask: Optional[jnp.ndarray] = None,
    fill: float = BIG,
) -> jnp.ndarray:
    """:func:`square_distance` with invalid rows/cols set to ``fill``.

    Masks are boolean ``(..., N)`` / ``(..., M)``; True = valid point.
    """
    dist = square_distance(src, dst)
    if dst_mask is not None:
        dist = jnp.where(dst_mask[..., None, :], dist, fill)
    if src_mask is not None:
        dist = jnp.where(src_mask[..., :, None], dist, fill)
    return dist


def nearest_neighbor(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each src point, the squared distance and index of its NN in dst.

    Streams over src in ``chunk``-row tiles so the full N x M matrix never
    lives in HBM at once for KITTI-sized clouds (the reference materializes it:
    `/root/reference/models/pointnet.py:71`). Returns ``(min_sq_dist, index)``
    each of shape ``(..., N)``; invalid dst points never win.
    """

    n = src.shape[-2]
    if n <= chunk:
        dist = masked_square_distance(src, dst, dst_mask=dst_mask)
        return jnp.min(dist, axis=-1), jnp.argmin(dist, axis=-1)

    pad = (-n) % chunk
    src_p = jnp.pad(src, [(0, 0)] * (src.ndim - 2) + [(0, pad), (0, 0)])
    n_chunks = src_p.shape[-2] // chunk
    batch_shape = src.shape[:-2]
    # (n_chunks, ..., chunk, 3) so lax.map scans over tiles of src rows.
    src_t = jnp.moveaxis(src_p.reshape(batch_shape + (n_chunks, chunk, 3)), -3, 0)

    def one(tile):
        dist = masked_square_distance(tile, dst, dst_mask=dst_mask)
        return jnp.min(dist, axis=-1), jnp.argmin(dist, axis=-1)

    dists, idxs = jax.lax.map(one, src_t)
    dists = jnp.moveaxis(dists, 0, -2).reshape(batch_shape + (-1,))
    idxs = jnp.moveaxis(idxs, 0, -2).reshape(batch_shape + (-1,))
    return dists[..., :n], idxs[..., :n]


def radius_count(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    radius: float,
    src_mask: Optional[jnp.ndarray] = None,
    dst_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Number of dst points within ``radius`` of each src point: ``(..., N)``.

    On-device replacement for the KD-tree radius search used to derive GT
    correspondences (`/root/reference/utils.py:94-108`).
    """
    dist = masked_square_distance(src, dst, src_mask, dst_mask)
    return jnp.sum(dist < radius * radius, axis=-1)


def radius_correspondence_mask(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    radius: float,
    src_mask: Optional[jnp.ndarray] = None,
    dst_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Boolean ``(..., N, M)`` correspondence matrix ``dist(i,j) < radius``."""
    dist = masked_square_distance(src, dst, src_mask, dst_mask)
    return dist < radius * radius
