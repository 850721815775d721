"""Registration and generation metrics, batched and jittable.

TPU-native counterparts of:
  * `/root/reference/utils.py:181-189` (transformation_error: RE/TE)
  * `/root/reference/evaluate_3d_match.py:31-50` (redwood RMSE)
  * `/root/reference/evaluate_open_gf.py:25-41` (ChamferDistance)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from scream_tpu.geometry import so3
from scream_tpu.geometry.pairwise import masked_square_distance


def transformation_error(
    pred_trans: jnp.ndarray, gt_trans: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(RE degrees, TE) between ``(...,4,4)`` transforms.

    RE = arccos(clamp((tr(Rp^T Rg) - 1)/2)) * 180/pi, TE = ||tp - tg||,
    exactly as `/root/reference/utils.py:181-189`.
    """
    pred_R = pred_trans[..., :3, :3]
    gt_R = gt_trans[..., :3, :3]
    pred_t = pred_trans[..., :3, 3]
    gt_t = gt_trans[..., :3, 3]
    tr = jnp.einsum("...ij,...ij->...", pred_R, gt_R)
    re = jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)) * (180.0 / jnp.pi)
    te = jnp.linalg.norm(pred_t - gt_t, axis=-1)
    return re, te


def redwood_rmse(trans: jnp.ndarray, info: jnp.ndarray) -> jnp.ndarray:
    """Redwood transformation-error approximation of corresponding-point RMSE.

    ``trans`` is the residual transform gt^-1 @ pred ``(...,4,4)``; ``info`` is
    the 6x6 covariance of the GT parameters. Returns rmse^2 / info[0,0]
    (the caller takes sqrt), matching `/root/reference/evaluate_3d_match.py:31-50`
    where er = [t, q[1:]] with q the (w,x,y,z) quaternion of the rotation.
    """
    t = trans[..., :3, 3]
    q = so3.quat_from_matrix(trans[..., :3, :3])
    # nibabel's mat2quat (the reference's converter, evaluate_3d_match.py:47)
    # canonicalizes to w >= 0; without this the q vs -q ambiguity flips the
    # t-q cross terms of er^T info er for residual rotations beyond ~120 deg.
    q = jnp.where(q[..., 0:1] < 0.0, -q, q)
    er = jnp.concatenate([t, q[..., 1:]], axis=-1)
    p = jnp.einsum("...i,...ij,...j->...", er, info, er) / info[..., 0, 0]
    return p


def registration_recall_rmse(pred_T: jnp.ndarray, gt_T: jnp.ndarray, info: jnp.ndarray) -> jnp.ndarray:
    """sqrt(redwood RMSE) of gt^-1 @ pred — success iff < 0.2 m
    (`/root/reference/evaluate_3d_match.py:122-126`).

    A negative quadratic form (indefinite/near-singular gt.info covariance
    with a float-noise residual) maps to +inf, matching the DECISION the
    reference's unguarded ``np.sqrt`` makes there (NaN < 0.2 is False →
    pair counted failed) while keeping the returned value orderable —
    clipping to 0 would silently count such pairs as successes.
    """
    residual = jnp.linalg.inv(gt_T) @ pred_T
    p = redwood_rmse(residual, info)
    return jnp.where(p < 0.0, jnp.inf, jnp.sqrt(jnp.clip(p, 0.0, None)))


def chamfer_distance(
    f: jnp.ndarray,
    f_: jnp.ndarray,
    mask_f: Optional[jnp.ndarray] = None,
    mask_f_: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Both-direction mean of min squared distances, per batch element.

    Matches `/root/reference/evaluate_open_gf.py:25-41`:
    ``mean_i min_j d(i,j) + mean_j min_i d(i,j)`` (squared distances, no sqrt).
    Masked variant averages only over valid points.
    """
    dist = masked_square_distance(f, f_, mask_f, mask_f_)
    f2f_ = jnp.min(dist, axis=-1)  # (..., N)
    f_2f = jnp.min(dist, axis=-2)  # (..., M)
    if mask_f is not None:
        m = mask_f.astype(f2f_.dtype)
        a = jnp.sum(f2f_ * m, axis=-1) / jnp.clip(jnp.sum(m, axis=-1), 1.0, None)
    else:
        a = jnp.mean(f2f_, axis=-1)
    if mask_f_ is not None:
        m = mask_f_.astype(f_2f.dtype)
        b = jnp.sum(f_2f * m, axis=-1) / jnp.clip(jnp.sum(m, axis=-1), 1.0, None)
    else:
        b = jnp.mean(f_2f, axis=-1)
    return a + b


def height_mae(pred: jnp.ndarray, gt: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean |z_pred - z_gt| (`/root/reference/evaluate_open_gf.py:62-63`)."""
    err = jnp.abs(pred[..., 2] - gt[..., 2])
    if mask is None:
        return jnp.mean(err, axis=-1)
    m = mask.astype(err.dtype)
    return jnp.sum(err * m, axis=-1) / jnp.clip(jnp.sum(m, axis=-1), 1.0, None)


def height_mse(pred: jnp.ndarray, gt: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean (z_pred - z_gt)^2 (`/root/reference/evaluate_open_gf.py:65-66`)."""
    err = (pred[..., 2] - gt[..., 2]) ** 2
    if mask is None:
        return jnp.mean(err, axis=-1)
    m = mask.astype(err.dtype)
    return jnp.sum(err * m, axis=-1) / jnp.clip(jnp.sum(m, axis=-1), 1.0, None)
