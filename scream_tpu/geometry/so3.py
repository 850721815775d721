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
    `/root/reference/lie/numpy/so3.py:103-154` *including its numerics*:
    ``sin(theta)`` comes from the skew part (``0.5 * ||vee(R - R^T)||``, the
    same quantity the generic branch divides into) and
    ``theta = arctan2(sin, cos)`` — NOT from ``arccos(trace)``, whose fp32
    quantization near pi (~3.5e-4 rad steps) makes ``theta / sin(theta)``
    inconsistent with the skew magnitude and corrupts rotations within
    ~3e-3 rad of 180 deg by up to ~60 deg equivalent (measured).
      * generic:   w = 0.5 * theta / sin(theta) * vee(R - R^T)
      * theta~0:   w = 0.5 * vee(R - R^T)           (1st-order)
      * sin~0 at pi: |w_i| = theta * sqrt((R_ii - cos)/(1 - cos)), signs
        from the skew components (reference Case 3)
    """
    # k * 2 sin(theta) where k is the rotation axis.
    angle_axis = vee(R - jnp.swapaxes(R, -1, -2))
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    trace = jnp.sum(diag, axis=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)

    # Gradient-safe norm: sqrt'(0) = inf would leak NaN through the untaken
    # where-branches at the identity.
    norm_sq = jnp.sum(angle_axis * angle_axis, axis=-1)
    tiny = norm_sq < 1e-24
    sin_theta = 0.5 * jnp.sqrt(jnp.where(tiny, 1.0, norm_sq))
    sin_theta = jnp.minimum(jnp.where(tiny, 0.0, sin_theta), 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)

    # Reference predicate epsilons (`/root/reference/lie/numpy/so3.py:5`
    # _EPS = 1e-5): Case 3 whenever sin ~ 0 (covers BOTH endpoints), then
    # Case 1 re-selects the theta ~ 0 half.
    near_zero_or_pi = sin_theta < 1e-5
    near_zero = theta < 1e-5

    # Case 2: usual formula, safe denominator.
    denom = jnp.where(near_zero_or_pi, 1.0, sin_theta)
    w_generic = (0.5 * theta / denom)[..., None] * angle_axis

    # Case 1: theta ~ 0 Taylor.
    w_zero = 0.5 * angle_axis

    # Case 3: theta ~ pi. Component magnitudes from the diagonal, signs from
    # the (tiny but sign-carrying) skew components — elementwise, exactly as
    # the reference's ``vec_pi[angle_axis * sin_theta < 0] *= -1``.
    ratio = (diag - cos_theta[..., None]) / jnp.clip(
        (1.0 - cos_theta)[..., None], 1e-6, None
    )
    # Lower clip 1e-12 (forward error <= theta*1e-6): sqrt'(0) = inf would
    # poison gradients of zero axis components in the TAKEN near-pi branch.
    w_pi = theta[..., None] * jnp.sqrt(jnp.clip(ratio, 1e-12, None))
    w_pi = jnp.where(angle_axis * sin_theta[..., None] < 0.0, -w_pi, w_pi)

    # Sub-case: EXACT pi (skew part pure rounding noise). The reference's
    # per-component signs become independently noise-determined there, which
    # can flip a component's sign RELATIVE to the others — (kx, -ky, kz) is
    # a different axis than (kx, ky, kz), an error the overall +-k freedom
    # does not excuse. Recover a sign-coherent axis from a column of
    # B = (R + I)/2 = k k^T at pi (the dominant-diagonal column).
    B = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    b_diag = jnp.clip(jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]],
                                axis=-1), 0.0, None)
    k = jnp.argmax(b_diag, axis=-1)
    Bk = jnp.take_along_axis(
        B, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = Bk / jnp.clip(
        jnp.linalg.norm(Bk, axis=-1, keepdims=True), 1e-12, None)
    w_exact_pi = theta[..., None] * axis
    exact_pi = sin_theta < 1e-7
    w_pi = jnp.where(exact_pi[..., None], w_exact_pi, w_pi)

    w = jnp.where(near_zero_or_pi[..., None], w_pi, w_generic)
    return jnp.where(near_zero[..., None], w_zero, w)


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
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical hemisphere qw >= 0: the reference's generic branch
    # (qw = 0.5*sqrt(1+trace), so3_common.py:113-121) yields qw >= 0 for
    # every rotation except within ~sqrt(1e-10) of exactly 180 deg, where
    # its own sign is rounding-determined anyway; without this flip the
    # Shepperd branch selection returns -q for ~half the rotations above
    # 120 deg and elementwise comparisons against reference outputs fail.
    return q * jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix.

    Mirrors quat2rotmat in `/root/reference/lie/numpy/so3_common.py:66-96`.
    The normalization is where-guarded (not just clipped: sqrt's VJP at 0
    is still NaN through a clip) so a zero/denormal quaternion (e.g. an
    untrained pose-regression head) yields the identity with finite
    gradients instead of an all-NaN matrix.
    """
    nsq = jnp.sum(q * q, axis=-1, keepdims=True)
    degen = nsq < 1e-24
    q = jnp.where(degen, jnp.zeros_like(q).at[..., 0].set(1.0),
                  q / jnp.sqrt(jnp.where(degen, 1.0, nsq)))
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


def is_valid(R: jnp.ndarray, atol: float = 5e-5) -> jnp.ndarray:
    """det(R)==1 and orthogonality check, as in
    `/root/reference/lie/numpy/so3_common.py:14-29` — including its
    deliberately loose atol=5e-5 ("greater tolerance to handle outputs from
    float32 algorithms"): a rotation accumulated through a few fp32
    compositions drifts ~2e-5 off orthogonal and must still validate."""
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
