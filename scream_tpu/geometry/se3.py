"""SE(3) rigid transforms as batched, jittable jnp functions.

Functional TPU-native counterpart of `/root/reference/lie/numpy/se3.py`,
`/root/reference/lie/torch/se3.py` and `/root/reference/lie/numpy/utils.py`.

Two representations are used:
  * ``(..., 3, 4)`` compact pose matrices ``[R | t]`` — the working format of
    the reference's data-augmentation helpers (se3_init/cat/inv/transform).
  * ``(..., 6)`` tangent vectors ``[u, w]`` (translation part first, rotation
    part last) for exp/log, matching the reference's vec ordering
    (`/root/reference/lie/numpy/se3.py:99-137`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scream_tpu.geometry import so3

_EPS = 1e-6


# ---------------------------------------------------------------------------
# Compact [R|t] functional ops (the data-augmentation workhorses;
# reference: /root/reference/lie/numpy/utils.py:11-51)
# ---------------------------------------------------------------------------

def se3_init(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Concatenate ``(...,3,3)`` rotation and ``(...,3,1)`` translation -> ``(...,3,4)``."""
    return jnp.concatenate([rot, trans], axis=-1)


def se3_cat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose two ``(...,3,4)`` transforms: result = a . b."""
    rot_a, trans_a = a[..., :3, :3], a[..., :3, 3:4]
    rot_b, trans_b = b[..., :3, :3], b[..., :3, 3:4]
    return se3_init(rot_a @ rot_b, rot_a @ trans_b + trans_a)


def se3_inv(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert a ``(...,3,4)`` transform."""
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    irot = jnp.swapaxes(rot, -1, -2)
    return se3_init(irot, -irot @ trans)


def se3_transform(pose: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Apply ``(...,3,4)`` pose to ``(...,N,3)`` points: R x + t."""
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    return jnp.einsum("...ij,...nj->...ni", rot, xyz) + jnp.swapaxes(trans, -1, -2)


def to_4x4(pose: jnp.ndarray) -> jnp.ndarray:
    """``(...,3,4)`` -> homogeneous ``(...,4,4)``."""
    bottom = jnp.zeros_like(pose[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)


def from_4x4(T: jnp.ndarray) -> jnp.ndarray:
    """``(...,4,4)`` -> ``(...,3,4)``."""
    return T[..., :3, :]


# ---------------------------------------------------------------------------
# Exp / log maps (reference: /root/reference/lie/numpy/se3.py:99-180)
# ---------------------------------------------------------------------------

def _v_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3): V = I + (1-cos t)/t^2 W + (t - sin t)/t^3 W^2."""
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < _EPS * _EPS
    # sqrt of a safe value only — sqrt'(0)=inf poisons grads via where.
    theta_s = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))

    W = so3.hat(w)
    W2 = W @ W
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta_s)) / (theta_s**2))
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta_s - jnp.sin(theta_s)) / (theta_s**3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _v_inv_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of the left Jacobian V."""
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < _EPS * _EPS
    theta_s = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))

    W = so3.hat(w)
    W2 = W @ W
    half = jnp.asarray(0.5, dtype=w.dtype)
    # coefficient: (1 - t/2 * cot(t/2)) / t^2 with Taylor 1/12 + t^2/720 near 0
    cot_term = (theta_s * 0.5) * jnp.cos(theta_s * 0.5) / jnp.sin(theta_s * 0.5)
    coef = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - cot_term) / (theta_s**2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - half * W + coef[..., None, None] * W2


def exp(vec: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: ``(..., 6)`` tangent ``[u, w]`` -> ``(..., 3, 4)`` pose.

    Sophus-style closed form with V matrix
    (`/root/reference/lie/numpy/se3.py:99-137`).
    """
    u, w = vec[..., :3], vec[..., 3:]
    R = so3.exp(w)
    V = _v_matrix(w)
    t = jnp.einsum("...ij,...j->...i", V, u)
    return se3_init(R, t[..., None])


def log(pose: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: ``(..., 3, 4)`` pose -> ``(..., 6)`` tangent ``[u, w]``."""
    R, t = pose[..., :3, :3], pose[..., :3, 3]
    w = so3.log(R)
    Vi = _v_inv_matrix(w)
    u = jnp.einsum("...ij,...j->...i", Vi, t)
    return jnp.concatenate([u, w], axis=-1)


def pexp(vec: jnp.ndarray) -> jnp.ndarray:
    """Pseudo-exponential: rotation via exp, translation taken verbatim.

    Mirrors the torch-only extra `/root/reference/lie/torch/se3.py:113-135`.
    """
    u, w = vec[..., :3], vec[..., 3:]
    return se3_init(so3.exp(w), u[..., None])


def plog(pose: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pexp`."""
    R, t = pose[..., :3, :3], pose[..., :3, 3]
    return jnp.concatenate([t, so3.log(R)], axis=-1)


def boxplus_left(pose: jnp.ndarray, delta: jnp.ndarray, pseudo: bool = False) -> jnp.ndarray:
    """Left-plus: exp(delta) . pose (pseudo-aware like lie/torch/liegroupbase.py:51-66)."""
    d = pexp(delta) if pseudo else exp(delta)
    return se3_cat(d, pose)


def boxplus_right(pose: jnp.ndarray, delta: jnp.ndarray, pseudo: bool = False) -> jnp.ndarray:
    """Right-plus: pose . exp(delta)."""
    d = pexp(delta) if pseudo else exp(delta)
    return se3_cat(pose, d)


# ---------------------------------------------------------------------------
# Sampling (reference: /root/reference/lie/numpy/se3.py:17-44)
# ---------------------------------------------------------------------------

def sample_small(key: jax.Array, std: float, shape=()) -> jnp.ndarray:
    """Small random pose: SO3.sample_small rotation + N(0, std/sqrt(3)) translation.

    Mirrors `/root/reference/lie/numpy/se3.py:38-44`; used by the 3DMatch and
    KITTI data augmentation (`/root/reference/datasets/three_d_match.py:130`).
    """
    k_rot, k_trans = jax.random.split(key)
    R = so3.sample_small(k_rot, std, shape)
    t = jax.random.normal(k_trans, shape + (3, 1)) * (std / jnp.sqrt(3.0))
    return se3_init(R, t)


def sample_uniform(key: jax.Array, shape=(), trans_scale: float = 1.0) -> jnp.ndarray:
    """Uniform rotation + uniform translation in [-scale, scale]^3."""
    k_rot, k_trans = jax.random.split(key)
    R = so3.sample_uniform(k_rot, shape)
    t = jax.random.uniform(k_trans, shape + (3, 1), minval=-trans_scale, maxval=trans_scale)
    return se3_init(R, t)


# ---------------------------------------------------------------------------
# Jacobians (reference: /root/reference/lie/torch/se3.py:183-278, following
# "A micro Lie theory" / Sola et al. section numbering cited there)
# ---------------------------------------------------------------------------

def jacob_expeD_de(D: jnp.ndarray, pseudo: bool = True) -> jnp.ndarray:
    """d(exp(eps) . D)/d(eps) at eps=0 for the pseudo-exp chart: ``(..., 12, 6)``.

    Rows order the flattened 3x4 result row-major ([R|t] rows), columns are
    [u, w]. Matches the semantics of lie/torch/se3.py:183-209 (section 10.3.3).
    """
    R, t = D[..., :3, :3], D[..., :3, 3:4]
    batch = D.shape[:-2]
    out = jnp.zeros(batch + (3, 4, 6), dtype=D.dtype)
    # d/du of translation = I; rotation unaffected by u at eps=0.
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=D.dtype), batch + (3, 3))
    out = out.at[..., :, 3, :3].set(eye3)
    # d/dw: first-order, exp(w) ~ I + hat(w): d(hat(w) R)/dw_k = hat(e_k) R.
    # The exp and pexp charts coincide to first order at eps=0 (pexp differs
    # only in the translation V-matrix, which is I + O(w)), so `pseudo` does
    # not change this jacobian.
    del pseudo
    for k in range(3):
        e = jnp.zeros((3,), dtype=D.dtype).at[k].set(1.0)
        He = so3.hat(e)
        dR = jnp.einsum("ij,...jl->...il", He, R)
        dt = jnp.einsum("ij,...jl->...il", He, t)
        out = out.at[..., :, :3, 3 + k].set(dR)
        out = out.at[..., :, 3, 3 + k].set(dt[..., 0])
    return out.reshape(batch + (12, 6))


def jacob_Dexpe_de(D: jnp.ndarray) -> jnp.ndarray:
    """d(D . exp(eps))/d(eps) at eps=0: ``(..., 12, 6)``.

    Matches lie/torch/se3.py:211-232 (section 10.3.4).
    """
    R = D[..., :3, :3]
    batch = D.shape[:-2]
    out = jnp.zeros(batch + (3, 4, 6), dtype=D.dtype)
    out = out.at[..., :, 3, :3].set(R)  # d t / d u = R
    for k in range(3):
        e = jnp.zeros((3,), dtype=D.dtype).at[k].set(1.0)
        He = so3.hat(e)
        dR = jnp.einsum("...ij,jl->...il", R, He)
        out = out.at[..., :, :3, 3 + k].set(dR)
    return out.reshape(batch + (12, 6))


def jacob_dAexpeD_de(A: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """d(A . exp(eps) . D)/d(eps) at eps=0: ``(..., 12, 6)``.

    Matches lie/numpy/se3.py:185-229 / lie/torch/se3.py:234-278 (10.3.7).
    """
    Ra = A[..., :3, :3]
    Rd, td = D[..., :3, :3], D[..., :3, 3:4]
    batch = jnp.broadcast_shapes(A.shape[:-2], D.shape[:-2])
    out = jnp.zeros(batch + (3, 4, 6), dtype=A.dtype)
    Ra_b = jnp.broadcast_to(Ra, batch + (3, 3))
    out = out.at[..., :, 3, :3].set(Ra_b)  # translation wrt u
    for k in range(3):
        e = jnp.zeros((3,), dtype=A.dtype).at[k].set(1.0)
        He = so3.hat(e)
        dR = jnp.einsum("...ij,jl,...lm->...im", Ra_b, He, jnp.broadcast_to(Rd, batch + (3, 3)))
        dt = jnp.einsum("...ij,jl,...lm->...im", Ra_b, He, jnp.broadcast_to(td, batch + (3, 1)))
        out = out.at[..., :, :3, 3 + k].set(dR)
        out = out.at[..., :, 3, 3 + k].set(dt[..., 0])
    return out.reshape(batch + (12, 6))


def make_valid(pose: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize the rotation block (lie/torch/se3.py:318)."""
    return se3_init(so3.make_valid(pose[..., :3, :3]), pose[..., :3, 3:4])


def as_quat_trans(pose: jnp.ndarray) -> jnp.ndarray:
    """``(...,3,4)`` -> 7-vector [qw qx qy qz tx ty tz] (lie/numpy/se3.py:240-256)."""
    q = so3.quat_from_matrix(pose[..., :3, :3])
    return jnp.concatenate([q, pose[..., :3, 3]], axis=-1)


def from_quat_trans(vec7: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`as_quat_trans`."""
    R = so3.matrix_from_quat(vec7[..., :4])
    return se3_init(R, vec7[..., 4:7][..., None])
