"""Point-cloud normal estimation (PCA over k nearest neighbors), on-device.

Counterpart of Open3D's ``estimate_normals``, which the reference calls
before every visualization window (`/root/reference/visualize_3d_match.py:175-177`,
`/root/reference/train_3d_match.py:67-68`) — the one native-surface row that
stayed partial in round 1. Open3D fits a plane to each point's neighborhood
(KNN or hybrid radius search) and takes the plane normal; here the same PCA
runs batched under jit: masked k-NN via top-k on the squared-distance matrix,
neighborhood covariance, smallest eigenvector by ``eigh``.

Orientation: like Open3D without an orientation pass, the sign is arbitrary;
:func:`orient_normals_towards` reproduces
``orient_normals_towards_camera_location``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from scream_tpu.geometry.pairwise import BIG, masked_square_distance


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(
    points: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    k: int = 30,
) -> jnp.ndarray:
    """Per-point unit normals ``(B, N, 3)`` for clouds ``(B, N, 3)``.

    ``k`` matches Open3D's ``KDTreeSearchParamKNN(knn=30)`` default. Padded
    (masked-out) points get a zero normal. The self-point is part of its own
    neighborhood, as in Open3D's KNN search.
    """
    if points.ndim == 2:
        return estimate_normals(points[None], None if mask is None else mask[None], k)[0]
    B, N, _ = points.shape
    if mask is None:
        mask = jnp.ones((B, N), dtype=bool)
    pts = points.astype(jnp.float32)

    d2 = masked_square_distance(pts, pts, dst_mask=mask)  # (B, N, N)
    k_eff = min(k, N)
    # top_k of negated distances = k nearest (incl. self at distance 0).
    neg_d, idx = jax.lax.top_k(-d2, k_eff)  # (B, N, k)
    # Neighbors that are masked-out padding carry +BIG distance and only
    # appear when a row has < k valid candidates; weight them out (the
    # distance arm guards a caller that ever bypasses the mask). Batched
    # index gather — NOT take_along_axis over .repeat'ed inputs, which
    # materializes (B, N, N, 3)/(B, N, N) intermediates.
    bi = jnp.arange(B)[:, None, None]
    nb_valid = (neg_d > -BIG / 2) & mask[bi, idx]
    w = nb_valid.astype(jnp.float32)[..., None]  # (B, N, k, 1)

    nb = pts[bi, idx]  # (B, N, k, 3)
    n_nb = jnp.clip(jnp.sum(w, axis=2), 1.0, None)  # (B, N, 1)
    mean = jnp.sum(nb * w, axis=2) / n_nb  # (B, N, 3)
    centered = (nb - mean[:, :, None, :]) * w
    cov = jnp.einsum("bnkc,bnkd->bncd", centered, centered) / n_nb[..., None]

    # Smallest-eigenvalue eigenvector of each 3x3 covariance.
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    normal = vecs[..., 0]
    normal = normal / jnp.clip(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12, None
    )
    return jnp.where(mask[..., None], normal, 0.0)


def orient_normals_towards(
    normals: jnp.ndarray, points: jnp.ndarray, camera: jnp.ndarray
) -> jnp.ndarray:
    """Flip normals to point toward ``camera`` (Open3D
    ``orient_normals_towards_camera_location`` semantics)."""
    to_cam = camera - points
    sign = jnp.sign(jnp.sum(normals * to_cam, axis=-1, keepdims=True))
    return normals * jnp.where(sign == 0, 1.0, sign)
