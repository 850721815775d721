"""Weighted Kabsch/SVD rigid-pose solver, fully on-device.

TPU-native counterpart of `/root/reference/utils.py:138-178`
(rigid_transform_3d) and `/root/reference/utils.py:112-135` (integrate_trans).

The reference round-trips the 3x3 covariance to the CPU for LAPACK SVD
(`torch.svd(H.cpu())`, utils.py:169). Here the SVD runs on-device with
`jnp.linalg.svd` — the matrix is 3x3 per batch element, so this is a trivially
batched op that removes the host hop entirely. Variable correspondence counts
are handled by passing a 0/1 weight vector (the validity mask), which the
weighted centroids and covariance absorb naturally.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def integrate_trans(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble rotation ``(...,3,3)`` + translation ``(...,3,1)`` -> ``(...,4,4)``.

    Same semantics as `/root/reference/utils.py:112-135`, batched or not.
    """
    batch = R.shape[:-2]
    T = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3:4].set(jnp.reshape(t, batch + (3, 1)))
    return T


def kabsch(
    A: jnp.ndarray,
    B: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    weight_threshold: float = 0.0,
) -> jnp.ndarray:
    """Weighted rigid alignment: find T with B ~ R A + t. Returns ``(...,4,4)``.

    Faithful to `/root/reference/utils.py:138-178`:
      * weights below ``weight_threshold`` are zeroed,
      * weighted centroids with a 1e-6 denominator guard,
      * covariance H = Am^T diag(w) Bm,
      * SVD with determinant correction so R is a proper rotation.

    ``A``/``B`` are ``(..., N, 3)``; ``weights`` is ``(..., N)`` (use the
    correspondence validity mask for padded batches). The SVD runs in fp32 on
    device regardless of input dtype.
    """
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=jnp.float32)
    else:
        weights = weights.astype(jnp.float32)
    weights = jnp.where(weights < weight_threshold, 0.0, weights)

    w_sum = jnp.sum(weights, axis=-1, keepdims=True)[..., None] + 1e-6
    centroid_A = jnp.sum(A * weights[..., None], axis=-2, keepdims=True) / w_sum
    centroid_B = jnp.sum(B * weights[..., None], axis=-2, keepdims=True) / w_sum

    Am = A - centroid_A
    Bm = B - centroid_B

    # H = Am^T diag(w) Bm — one MXU matmul, no diag materialization.
    # NB: runs at true fp32 matmul precision — scream_tpu/__init__.py sets
    # jax_default_matmul_precision="highest" globally, so this einsum does
    # NOT drop to single-pass bf16 on the MXU (the covariance is
    # cancellation-sensitive for de-normalized KITTI-scale coordinates).
    H = jnp.einsum(
        "...nc,...nd->...cd", Am * weights[..., None], Bm,
        preferred_element_type=jnp.float32,
    )

    # torch.svd returns V (not V^T): H = U S V^T, R = V diag(1,1,det) U^T.
    U, _, Vh = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    diag = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (V * diag[..., None, :]) @ jnp.swapaxes(U, -1, -2)

    t = jnp.swapaxes(centroid_B, -1, -2) - R @ jnp.swapaxes(centroid_A, -1, -2)
    return integrate_trans(R, t)


def kabsch_from_correspondence(
    src: jnp.ndarray,
    dst_gathered: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Kabsch over gathered correspondences with a validity mask.

    This is the padded-batch equivalent of the reference's boolean indexing
    ``rigid_transform_3d(src[:, valid_ind], tgt[:, tgt_ind])``
    (`/root/reference/models/pointnet.py:67-74`): instead of compacting the
    valid rows (dynamic shape), every row stays in place and invalid rows get
    weight 0.
    """
    return kabsch(src, dst_gathered, weights=valid.astype(jnp.float32))
