"""Host-side (numpy) data transforms: augmentation and normalization.

These run on the CPU inside the input pipeline, ahead of the device step —
the TPU analogue of the reference's per-``__getitem__`` numpy work:

  * :func:`augment_pair` — the SE(3) perturbation + jitter augmentation of
    `/root/reference/datasets/three_d_match.py:129-153` (both-sides variant)
    and `/root/reference/datasets/kitti.py:233-247` (source-only, no jitter).
  * :func:`normalize_unit_sphere` — 3DMatch-style normalization: center on
    the mean of the GT-registered union, scale by the max radius, re-derive
    the translation as ``s * (t - c + R c)``
    (`/root/reference/datasets/three_d_match.py:183-190`).
  * :func:`normalize_unit_cube` — KITTI-style bbox normalization
    (`/root/reference/datasets/kitti.py:268-273` ``norm_pc``).

All functions take an explicit ``numpy.random.Generator`` — no hidden global
RNG state, so the loader is reproducible and shardable across hosts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def uniform_2_sphere(rng: np.random.Generator, size: Optional[int] = None) -> np.ndarray:
    """Uniform unit vectors on S^2 (`/root/reference/lie/numpy/so3_common.py:185-210`)."""
    shape = () if size is None else (size,)
    phi = rng.uniform(0.0, 2 * np.pi, shape)
    cos_theta = rng.uniform(-1.0, 1.0, shape)
    sin_theta = np.sqrt(np.clip(1.0 - cos_theta**2, 0.0, None))
    return np.stack(
        [sin_theta * np.cos(phi), sin_theta * np.sin(phi), cos_theta], axis=-1
    )


def _rodrigues(axis_angle: np.ndarray) -> np.ndarray:
    """exp: so(3) -> SO(3) for a single (3,) axis-angle vector."""
    theta = np.linalg.norm(axis_angle)
    if theta < 1e-12:
        return np.eye(3)
    k = axis_angle / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def sample_small_se3(rng: np.random.Generator, std: float) -> np.ndarray:
    """Small random SE(3) perturbation as a 4x4 matrix.

    Matches ``SE3.sample_small`` (`/root/reference/lie/numpy/se3.py:37-44`,
    `/root/reference/lie/numpy/so3.py:30-38`): rotation axis uniform on S^2
    with angle ~ N(0, (std*pi/sqrt(3))^2); translation ~ N(0, (std/sqrt(3))^2)
    per component.
    """
    axis = uniform_2_sphere(rng)
    theta = rng.standard_normal() * std * np.pi / np.sqrt(3.0)
    R = _rodrigues(axis * theta)
    t = rng.standard_normal(3) * std / np.sqrt(3.0)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def augment_pair(
    rng: np.random.Generator,
    src: np.ndarray,
    tgt: np.ndarray,
    T: np.ndarray,
    perturb_std: float = 0.1,
    jitter_std: float = 0.003,
    perturb_both_sides: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SE(3) perturbation centered on the perturbed cloud's centroid + jitter.

    3DMatch flips a coin between perturbing src or tgt and jitters both clouds
    (`/root/reference/datasets/three_d_match.py:129-153`); KITTI always
    perturbs the source and adds no jitter
    (`/root/reference/datasets/kitti.py:233-247`) — pass
    ``perturb_both_sides=False, jitter_std=0.0``.

    The GT composition is exact: perturbing src by P updates ``T <- T P^-1``;
    perturbing tgt updates ``T <- P T``.
    """
    T = np.concatenate([T[:3], [[0.0, 0.0, 0.0, 1.0]]], axis=0)
    perturb_source = True if not perturb_both_sides else rng.random() > 0.5

    perturb = sample_small_se3(rng, perturb_std)
    centroid = np.mean(src if perturb_source else tgt, axis=0)
    # Conjugate by the centering translation so the rotation pivots on the
    # cloud centroid instead of the origin.
    C = np.eye(4)
    C[:3, 3] = -centroid
    C_inv = np.eye(4)
    C_inv[:3, 3] = centroid
    perturb = C_inv @ perturb @ C

    if perturb_source:
        T = T @ np.linalg.inv(perturb)
        src = src @ perturb[:3, :3].T + perturb[:3, 3]
    else:
        T = perturb @ T
        tgt = tgt @ perturb[:3, :3].T + perturb[:3, 3]

    if jitter_std > 0.0:
        src = src + rng.standard_normal(src.shape) * jitter_std
        tgt = tgt + rng.standard_normal(tgt.shape) * jitter_std
    return src, tgt, T


def derive_normalized_trans(
    s: float, c: np.ndarray, rot: np.ndarray, trans: np.ndarray
) -> np.ndarray:
    """Re-derive the GT translation in the normalized frame: ``s (t - c + R c)``
    (`/root/reference/datasets/three_d_match.py:190`). ``trans`` is (3,) or (3,1)."""
    t = trans.reshape(3)
    return (s * (t - c + rot @ c)).reshape(trans.shape)


def normalize_unit_sphere(
    src: np.ndarray, tgt: np.ndarray, rot: np.ndarray, trans: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float, np.ndarray]:
    """Unit-sphere normalization over the GT-registered union (3DMatch).

    Returns ``(src_n, tgt_n, trans_n, s, c)`` with ``x_n = s (x - c)``; the
    rotation is unchanged.
    """
    registered = np.concatenate([src @ rot.T + trans.reshape(3), tgt], axis=0)
    c = np.mean(registered, axis=0)
    s = 1.0 / np.max(np.linalg.norm(registered - c, axis=1))
    return s * (src - c), s * (tgt - c), derive_normalized_trans(s, c, rot, trans), s, c


def normalize_unit_sphere_raw(
    src: np.ndarray, tgt: np.ndarray, rot: np.ndarray, trans: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float, np.ndarray]:
    """Unit-sphere normalization over the UN-registered union.

    The protocol's :func:`normalize_unit_sphere` centers on the
    GT-registered union — information a GT-free caller does not have.
    ``pipeline.register_pair`` normalizes over the clouds AS GIVEN; training
    a hint-free checkpoint (``center_mode="none"``) with THIS mode matches
    that inference distribution. The trans re-derivation ``s (t - c + R c)``
    is frame-choice independent, so the GT stays exact.
    """
    union = np.concatenate([src, tgt], axis=0)
    c = np.mean(union, axis=0)
    s = 1.0 / max(float(np.max(np.linalg.norm(union - c, axis=1))), 1e-12)
    return s * (src - c), s * (tgt - c), derive_normalized_trans(s, c, rot, trans), s, c


def normalize_unit_cube_raw(
    src: np.ndarray, tgt: np.ndarray, rot: np.ndarray, trans: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float, np.ndarray]:
    """Unit-cube normalization over the UN-registered union — the KITTI-
    convention counterpart of :func:`normalize_unit_sphere_raw` (same
    GT-free rationale; matches ``register_pair(normalize="unit_cube")``)."""
    union = np.concatenate([src, tgt], axis=0)
    lo, hi = union.min(axis=0), union.max(axis=0)
    c = (lo + hi) / 2.0
    s = 2.0 / max(float(np.max(hi - lo)), 1e-12)
    return s * (src - c), s * (tgt - c), derive_normalized_trans(s, c, rot, trans), s, c


def normalize_unit_cube(
    src: np.ndarray, tgt: np.ndarray, rot: np.ndarray, trans: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float, np.ndarray]:
    """Unit-cube (bbox) normalization over the registered union (KITTI).

    ``c`` = bbox center, ``s`` = 2 / longest axis
    (`/root/reference/datasets/kitti.py:268-273`).
    """
    registered = np.concatenate([src @ rot.T + trans.reshape(3), tgt], axis=0)
    lo, hi = registered.min(axis=0), registered.max(axis=0)
    c = (lo + hi) / 2.0
    s = 2.0 / np.max(hi - lo)
    return s * (src - c), s * (tgt - c), derive_normalized_trans(s, c, rot, trans), s, c
