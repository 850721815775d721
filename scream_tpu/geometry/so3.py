"""SO(3) rotations as batched, jittable jnp functions.

Functional TPU-native counterpart of the reference's class-based Lie library
(`/root/reference/lie/numpy/so3.py`, `/root/reference/lie/torch/so3.py`).
Rotations are plain ``(..., 3, 3)`` arrays; tangent vectors are ``(..., 3)``.

All functions are shape-polymorphic over leading batch dims and safe to
differentiate (branches are selected with `jnp.where` on *safe* inputs so no
NaN leaks through the untaken branch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``(..., 3)`` vectors -> ``(..., 3, 3)``.

    Mirrors `/root/reference/lie/numpy/so3_common.py` hat().
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: ``(..., 3, 3)`` skew matrix -> ``(..., 3)``."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector ``(..., 3)`` -> rotation matrix.

    Rodrigues formula with a 2nd-order Taylor expansion near theta=0, matching
    the semantics of `/root/reference/lie/numpy/so3.py:81-101` (exp_and_theta).
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < _EPS * _EPS
    # sqrt only of a safe value: d/dx sqrt(0) = inf would poison gradients
    # through the untaken where-branch otherwise.
    theta_s = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    W = hat(w)
    W2 = W @ W

    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta_s) / theta_s)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta_s)) / (theta_s * theta_s))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: rotation matrix -> rotation vector ``(..., 3)``.

    Three-branch ceres-style implementation matching
    `/root/reference/lie/numpy/so3.py:103-154`:
      * generic:   w = theta / (2 sin theta) * vee(R - R^T)
      * theta~0:   w = 0.5 * vee(R - R^T)           (1st-order)
      * theta~pi:  axis from the dominant diagonal of (R + I)/2
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Safe-input arccos: arccos'(x) is inf at |x|=1, and the zero cotangent
    # of an untaken where-branch still multiplies it (0*inf=NaN), so the
    # derivative would NaN exactly at theta=0/pi without the inner clip
    # (the forward theta shifts by at most ~4.5e-4 rad at the exact
    # endpoints, on par with f32 arccos precision there). Branch predicates
    # use the unclipped value under stop_gradient so exact 0/pi still
    # select their dedicated branches.
    cos_safe = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_safe)
    sin_theta = jnp.sin(theta)
    theta_pred = jax.lax.stop_gradient(jnp.arccos(cos_theta))

    near_zero = theta_pred < _EPS
    near_pi = (jnp.pi - theta_pred) < 1e-4

    # Generic branch (safe denominator).
    denom = jnp.where(near_zero | near_pi, jnp.ones_like(sin_theta), 2.0 * sin_theta)
    w_generic = (theta / denom)[..., None] * vee(R - jnp.swapaxes(R, -1, -2))

    # Near-zero branch.
    w_zero = 0.5 * vee(R - jnp.swapaxes(R, -1, -2))

    # Near-pi branch: R ~ I + 2 W^2/pi^2 -> B = (R + I)/2 has axis outer product.
    B = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    diag = jnp.clip(diag, 0.0, None)
    k = jnp.argmax(diag, axis=-1)
    axis_sq = jnp.clip(diag, 1e-12, None)
    axis_mag = jnp.sqrt(axis_sq)
    # column k of B divided by axis_mag[k] gives the axis
    Bk = jnp.take_along_axis(B, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    mag_k = jnp.take_along_axis(axis_mag, k[..., None], axis=-1)
    axis = Bk / jnp.clip(mag_k, 1e-12, None)
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12, None)
    # Disambiguate sign with the off-diagonal skew part where possible; at
    # exactly pi the sign doesn't matter (exp(w) == exp(-w)).
    skew = vee(R - jnp.swapaxes(R, -1, -2))
    sign = jnp.where(jnp.sum(skew * axis, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign

    w = jnp.where(near_zero[..., None], w_zero, w_generic)
    w = jnp.where(near_pi[..., None], w_pi, w)
    return w


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in radians, matching `/root/reference/lie/numpy/so3.py:175-181`."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def compare(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angular difference (radians) between two rotations."""
    return rotation_angle(R1 @ jnp.swapaxes(R2, -1, -2))


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion ``(..., 4)`` (w, x, y, z).

    Branchless Shepperd-style conversion equivalent to the ceres-style
    rotmat2quat in `/root/reference/lie/numpy/so3_common.py:99-141` (incl. the
    ~180 degree branch) but expressed with jnp.where for XLA.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    qw0 = jnp.sqrt(jnp.clip(1.0 + trace, 1e-12, None)) * 0.5
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) * 0.5
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) * 0.5
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) * 0.5
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    cond0 = trace > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0, jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3))
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix.

    Mirrors quat2rotmat in `/root/reference/lie/numpy/so3_common.py:66-96`.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_zyx_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """*Extrinsic* z-y-x Euler angles ``(..., 3)`` -> rotation matrix.

    Equivalent to ``scipy.spatial.transform.Rotation.from_euler('zyx', e)``,
    which the reference uses for renderer view matrices
    (`/root/reference/models/render.py:67`) and KITTI augmentation. Note
    scipy's lowercase axis string means *extrinsic* rotations: angle[0] about
    the fixed z axis first, then angle[1] about fixed y, then angle[2] about
    fixed x, i.e. R = Rx(x) @ Ry(y) @ Rz(z).
    """
    z, y, x = euler[..., 0], euler[..., 1], euler[..., 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    row0 = jnp.stack([cy * cz, -cy * sz, sy], axis=-1)
    row1 = jnp.stack([sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy], axis=-1)
    row2 = jnp.stack([-cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def uniform_2_sphere(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform samples on S^2, mirroring `/root/reference/lie/numpy/so3_common.py:185-210`."""
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, shape, minval=0.0, maxval=2 * jnp.pi)
    cos_theta = jax.random.uniform(k2, shape, minval=-1.0, maxval=1.0)
    sin_theta = jnp.sqrt(1.0 - cos_theta**2)
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def sample_uniform(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform random rotation matrices via quaternion sampling."""
    q = jax.random.normal(key, shape + (4,))
    return matrix_from_quat(q)


def sample_small(key: jax.Array, std: float, shape=()) -> jnp.ndarray:
    """Small random rotations: uniform axis, angle ~ N(0, (std*pi/sqrt(3))^2).

    Mirrors `/root/reference/lie/numpy/so3.py:30-38` (SO3.sample_small).
    """
    k_axis, k_angle = jax.random.split(key)
    axis = uniform_2_sphere(k_axis, shape)
    theta = jax.random.normal(k_angle, shape) * (std * jnp.pi / jnp.sqrt(3.0))
    return exp(axis * theta[..., None])


def is_valid(R: jnp.ndarray, atol: float = 1e-5) -> jnp.ndarray:
    """det(R)==1 and orthogonality check, as in `/root/reference/lie/numpy/so3_common.py:14-29`."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    orth = jnp.all(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye) < atol, axis=(-2, -1))
    det = jnp.abs(jnp.linalg.det(R) - 1.0) < atol
    return orth & det


def make_valid(R: jnp.ndarray) -> jnp.ndarray:
    """Project onto SO(3) via SVD, as `/root/reference/lie/numpy/so3_common.py:32-40`."""
    U, _, Vh = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vh)
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]], axis=-1
    )
    return (U * fix[..., None, :]) @ Vh


def quat_inv(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit-quaternion inverse (= conjugate), wxyz convention
    (`/root/reference/lie/numpy/so3_common.py:144-149`)."""
    return jnp.concatenate([quat[..., 0:1], -quat[..., 1:]], axis=-1)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``q1 * q2`` (non-commutative), wxyz
    (`/root/reference/lie/numpy/so3_common.py:152-172`)."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rot(quat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate points ``(..., N, 3)`` by unit quaternion(s) ``(..., 4)`` via
    ``q * (0, p) * q^-1`` (`/root/reference/lie/numpy/so3_common.py:175-182`)."""
    v = jnp.concatenate([jnp.zeros_like(pts[..., 0:1]), pts], axis=-1)
    rotated = quat_mul(quat_mul(quat[..., None, :], v), quat_inv(quat[..., None, :]))
    return rotated[..., 1:]
