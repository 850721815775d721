"""Lie-group unit tests: round trips, parity with scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from scream_tpu.geometry import so3, se3


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(rng.integers(1 << 30))).as_matrix()


class TestSO3:
    def test_hat_vee_roundtrip(self, rng):
        w = rng.normal(size=(7, 3)).astype(np.float32)
        W = so3.hat(jnp.asarray(w))
        assert np.allclose(so3.vee(W), w)
        # skew-symmetry
        assert np.allclose(W, -np.swapaxes(np.asarray(W), -1, -2))

    def test_exp_matches_scipy(self, rng):
        w = rng.normal(size=(16, 3)).astype(np.float64) * 2.0
        R_scipy = Rotation.from_rotvec(w).as_matrix()
        R_ours = so3.exp(jnp.asarray(w, dtype=jnp.float32))
        assert np.allclose(R_ours, R_scipy, atol=1e-5)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-8, 0, 0], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        assert np.allclose(R, np.eye(3)[None], atol=1e-6)

    def test_log_exp_roundtrip(self, rng):
        w = rng.normal(size=(32, 3)).astype(np.float32)
        # keep away from the pi boundary for the generic branch
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, size=(32, 1))
        w_rt = so3.log(so3.exp(jnp.asarray(w)))
        assert np.allclose(w_rt, w, atol=1e-4)

    def test_log_near_pi(self, rng):
        axis = rng.normal(size=(8, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        theta = np.pi - 1e-6
        w = axis * theta
        R = Rotation.from_rotvec(w).as_matrix()
        w_log = np.asarray(so3.log(jnp.asarray(R, dtype=jnp.float32)))
        # exp(log(R)) must reproduce R even if the axis sign flips at pi
        R_rt = Rotation.from_rotvec(w_log).as_matrix()
        assert np.allclose(R_rt, R, atol=1e-3)

    def test_log_identity(self):
        assert np.allclose(so3.log(jnp.eye(3)), np.zeros(3), atol=1e-7)

    def test_log_accurate_across_near_pi_band(self, rng):
        """The fp32 arccos(trace) quantization band: rotations within
        ~3e-3 rad of 180 deg were corrupted by up to ~60 deg equivalent
        when theta came from arccos while the axis magnitude came from the
        skew part (inconsistent sin). The reference derives sin(theta) from
        ||vee(R - R^T)|| and theta = arctan2(sin, cos)
        (`/root/reference/lie/numpy/so3.py:119-137`); pin the rebuilt
        formulation across the whole band."""
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            from lie.numpy import SO3 as RefSO3
        finally:
            sys.path.remove("/root/reference")

        axis = rng.normal(size=(6, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        for eps in (3e-3, 1e-3, 3e-4, 2e-4, 1e-4, 5e-5, 1e-5, 0.0):
            w = axis * (np.pi - eps)
            R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
            w_log = np.asarray(so3.log(jnp.asarray(R)))
            # Angle must be right to fp32-matrix precision...
            ang = np.linalg.norm(w_log, axis=-1)
            np.testing.assert_allclose(ang, np.pi - eps, atol=5e-4)
            # ...the rotation must round-trip (residual is the inherent fp32
            # representation error, measured identical for the reference)...
            R_rt = Rotation.from_rotvec(w_log).as_matrix()
            np.testing.assert_allclose(R_rt, R, atol=1e-2)
            if eps > 0.0:
                # ...and the vector must MATCH the reference implementation
                # (direct A/B; at exact pi we deviate deliberately — the
                # reference's per-component noise signs can flip a component
                # relative to the others, ours stay sign-coherent).
                w_ref = RefSO3(R.astype(np.float64)).log()
                np.testing.assert_allclose(w_log, w_ref, atol=1e-5)
            else:
                # Exact pi: exp(log(R)) must still reproduce R tightly —
                # the case the reference gets wrong (its roundtrip error
                # here is ~1.8).
                np.testing.assert_allclose(R_rt, R, atol=1e-5)

    def test_rotation_angle(self, rng):
        w = rng.normal(size=(8, 3))
        theta = np.linalg.norm(w, axis=-1) % (2 * np.pi)
        theta = np.minimum(theta, 2 * np.pi - theta)
        R = Rotation.from_rotvec(w).as_matrix()
        ours = np.asarray(so3.rotation_angle(jnp.asarray(R, dtype=jnp.float32)))
        assert np.allclose(ours, theta, atol=1e-4)

    def test_quat_roundtrip(self, rng):
        R = random_rotations(rng, 32)
        q = so3.quat_from_matrix(jnp.asarray(R, dtype=jnp.float32))
        R_rt = so3.matrix_from_quat(q)
        assert np.allclose(R_rt, R, atol=1e-5)
        # against scipy (scipy uses xyzw ordering)
        q_scipy = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
        q_scipy_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
        sign = np.sign(np.sum(np.asarray(q) * q_scipy_wxyz, axis=-1, keepdims=True))
        assert np.allclose(np.asarray(q), q_scipy_wxyz * sign, atol=1e-5)

    def test_quat_from_matrix_canonical_hemisphere(self, rng):
        """qw >= 0 for every rotation, matching the reference's generic
        branch (qw = 0.5*sqrt(1+trace) >= 0, so3_common.py:113-121) — the
        raw Shepperd branch selection returned -q for ~half the rotations
        above 120 deg, breaking elementwise comparison with reference
        outputs through SO3.as_quaternion / SE3.as_quat_trans."""
        angles = rng.uniform(2.0, np.pi - 1e-3, size=200)  # 115-180 deg band
        axes = rng.normal(size=(200, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        R = Rotation.from_rotvec(axes * angles[:, None]).as_matrix()
        q = np.asarray(so3.quat_from_matrix(jnp.asarray(R, jnp.float32)))
        assert (q[:, 0] >= 0.0).all()
        # Still a faithful representation.
        R_rt = np.asarray(so3.matrix_from_quat(jnp.asarray(q)))
        np.testing.assert_allclose(R_rt, R, atol=1e-5)

    def test_matrix_from_quat_zero_quat_is_finite(self):
        """A zero/denormal quaternion (untrained pose head) must yield a
        finite matrix (identity) and finite gradients, not NaN."""
        R0 = np.asarray(so3.matrix_from_quat(jnp.zeros(4)))
        np.testing.assert_allclose(R0, np.eye(3), atol=1e-6)
        J = jax.jacobian(so3.matrix_from_quat)(jnp.zeros(4))
        assert np.all(np.isfinite(np.asarray(J)))

    def test_euler_zyx_matches_scipy(self, rng):
        e = rng.normal(size=(16, 3))
        ours = so3.euler_zyx_matrix(jnp.asarray(e, dtype=jnp.float32))
        ref = Rotation.from_euler("zyx", e).as_matrix()
        assert np.allclose(ours, ref, atol=1e-5)

    def test_renderer_view_matrices(self):
        # The 6 fixed renderer views (/root/reference/models/render.py:17-25)
        eulers = np.array(
            [
                [0, 0, 0],
                [0, np.pi / 2, 0],
                [0, np.pi, 0],
                [0, np.pi * 3 / 2, 0],
                [0, 0, np.pi / 2],
                [0, 0, np.pi * 3 / 2],
            ]
        )
        ours = so3.euler_zyx_matrix(jnp.asarray(eulers, dtype=jnp.float32))
        ref = Rotation.from_euler("zyx", eulers).as_matrix()
        assert np.allclose(ours, ref, atol=1e-6)

    def test_sample_small_std(self):
        key = jax.random.PRNGKey(0)
        R = so3.sample_small(key, std=0.1, shape=(4096,))
        angles = np.asarray(so3.rotation_angle(R))
        # angle ~ |N(0, (0.1*pi/sqrt(3))^2)| -> std of raw angle
        raw_std = 0.1 * np.pi / np.sqrt(3)
        assert abs(np.mean(angles) - raw_std * np.sqrt(2 / np.pi)) < 0.02
        assert so3.is_valid(R).all()

    def test_sample_uniform_valid(self):
        R = so3.sample_uniform(jax.random.PRNGKey(1), shape=(64,))
        assert so3.is_valid(R).all()

    def test_make_valid(self, rng):
        R = random_rotations(rng, 8) + rng.normal(size=(8, 3, 3)) * 0.01
        R_fixed = so3.make_valid(jnp.asarray(R, dtype=jnp.float32))
        assert so3.is_valid(R_fixed, atol=1e-4).all()


class TestSE3:
    def test_cat_inv_transform(self, rng):
        R1, R2 = random_rotations(rng, 2)
        t1 = rng.normal(size=(3, 1))
        t2 = rng.normal(size=(3, 1))
        a = se3.se3_init(jnp.asarray(R1, jnp.float32), jnp.asarray(t1, jnp.float32))
        b = se3.se3_init(jnp.asarray(R2, jnp.float32), jnp.asarray(t2, jnp.float32))
        ab = se3.se3_cat(a, b)
        # reference semantics: rot = Ra Rb, trans = Ra tb + ta
        assert np.allclose(ab[:3, :3], R1 @ R2, atol=1e-5)
        assert np.allclose(ab[:3, 3:], R1 @ t2 + t1, atol=1e-5)

        # inv . a == identity
        ident = se3.se3_cat(se3.se3_inv(a), a)
        assert np.allclose(ident[:3, :3], np.eye(3), atol=1e-5)
        assert np.allclose(ident[:3, 3:], 0, atol=1e-5)

        pts = jnp.asarray(rng.normal(size=(11, 3)), jnp.float32)
        out = se3.se3_transform(a, pts)
        expected = (R1 @ np.asarray(pts).T + t1).T
        assert np.allclose(out, expected, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        vec = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
        pose = se3.exp(vec)
        vec_rt = se3.log(pose)
        assert np.allclose(vec_rt, vec, atol=1e-3)

    def test_exp_zero(self):
        pose = se3.exp(jnp.zeros(6))
        assert np.allclose(pose[:3, :3], np.eye(3), atol=1e-7)
        assert np.allclose(pose[:3, 3], 0, atol=1e-7)

    def test_exp_pure_translation(self):
        vec = jnp.array([1.0, 2.0, 3.0, 0, 0, 0])
        pose = se3.exp(vec)
        assert np.allclose(pose[:3, 3], [1, 2, 3], atol=1e-6)

    def test_pexp_keeps_translation(self, rng):
        vec = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        pose = se3.pexp(vec)
        assert np.allclose(pose[..., :3, 3], vec[..., :3], atol=1e-6)
        assert np.allclose(se3.plog(pose), vec, atol=1e-4)

    def test_sample_small(self):
        pose = se3.sample_small(jax.random.PRNGKey(0), std=0.1, shape=(1024,))
        assert so3.is_valid(pose[..., :3, :3]).all()
        t_std = np.std(np.asarray(pose[..., :3, 3]))
        assert abs(t_std - 0.1 / np.sqrt(3)) < 0.01

    def test_4x4_roundtrip(self, rng):
        R = random_rotations(rng, 3)
        t = rng.normal(size=(3, 3, 1))
        pose = se3.se3_init(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        T = se3.to_4x4(pose)
        assert T.shape == (3, 4, 4)
        assert np.allclose(T[:, 3], [0, 0, 0, 1])
        assert np.allclose(se3.from_4x4(T), pose)

    def test_quat_trans_roundtrip(self, rng):
        R = random_rotations(rng, 5)
        t = rng.normal(size=(5, 3, 1))
        pose = se3.se3_init(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        v7 = se3.as_quat_trans(pose)
        pose_rt = se3.from_quat_trans(v7)
        assert np.allclose(pose_rt, pose, atol=1e-5)

    def test_jacob_dAexpeD_de_finite_difference(self, rng):
        """Analytic jacobian vs finite differences of A . pexp(eps) . D."""
        R_a, R_d = random_rotations(rng, 2)
        A = se3.se3_init(jnp.asarray(R_a, jnp.float32), jnp.asarray(rng.normal(size=(3, 1)), jnp.float32))
        D = se3.se3_init(jnp.asarray(R_d, jnp.float32), jnp.asarray(rng.normal(size=(3, 1)), jnp.float32))

        def f(eps):
            return se3.se3_cat(se3.se3_cat(A, se3.pexp(eps)), D).reshape(12)

        J_auto = jax.jacobian(f)(jnp.zeros(6))
        J_analytic = se3.jacob_dAexpeD_de(A, D)
        assert np.allclose(J_auto, J_analytic, atol=1e-4)

    def test_jacob_expeD_de_finite_difference(self, rng):
        R_d = random_rotations(rng, 1)[0]
        D = se3.se3_init(jnp.asarray(R_d, jnp.float32), jnp.asarray(rng.normal(size=(3, 1)), jnp.float32))

        def f(eps):
            return se3.se3_cat(se3.pexp(eps), D).reshape(12)

        J_auto = jax.jacobian(f)(jnp.zeros(6))
        assert np.allclose(J_auto, se3.jacob_expeD_de(D), atol=1e-4)

    def test_jacob_Dexpe_de_finite_difference(self, rng):
        R_d = random_rotations(rng, 1)[0]
        D = se3.se3_init(jnp.asarray(R_d, jnp.float32), jnp.asarray(rng.normal(size=(3, 1)), jnp.float32))

        def f(eps):
            return se3.se3_cat(D, se3.pexp(eps)).reshape(12)

        J_auto = jax.jacobian(f)(jnp.zeros(6))
        assert np.allclose(J_auto, se3.jacob_Dexpe_de(D), atol=1e-4)


class TestBoxplus:
    def test_boxplus_left_right_roundtrip(self, rng):
        import jax.numpy as jnp

        v = jnp.asarray(rng.standard_normal((4, 6)) * 0.3, jnp.float32)
        d = jnp.asarray(rng.standard_normal((4, 6)) * 0.1, jnp.float32)
        T = se3.exp(v)  # (B, 3, 4) convention
        L = np.asarray(se3.boxplus_left(T, d))
        R_ = np.asarray(se3.boxplus_right(T, d))
        expL = np.asarray(se3.se3_cat(se3.exp(d), T))
        expR = np.asarray(se3.se3_cat(T, se3.exp(d)))
        np.testing.assert_allclose(L, expL, atol=1e-4)
        np.testing.assert_allclose(R_, expR, atol=1e-4)
        # rotations stay orthonormal
        R = L[:, :3, :3]
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3), R.shape), atol=1e-4)

    def test_boxplus_pseudo_keeps_translation_semantics(self, rng):
        import jax.numpy as jnp

        v = jnp.asarray(rng.standard_normal((2, 6)) * 0.2, jnp.float32)
        d = jnp.asarray(rng.standard_normal((2, 6)) * 0.05, jnp.float32)
        T = se3.exp(v)
        P = np.asarray(se3.boxplus_left(T, d, pseudo=True))
        expP = np.asarray(se3.se3_cat(se3.pexp(d), T))
        np.testing.assert_allclose(P, expP, atol=1e-4)
        # pexp takes the translation verbatim: vec layout is [u, w]
        # (translation first), so t == delta[:, :3]
        np.testing.assert_allclose(np.asarray(se3.pexp(d))[:, :3, 3],
                                   np.asarray(d)[:, :3], atol=1e-6)


class TestQuaternionAlgebra:
    """quat_inv / quat_mul / quat_rot vs scipy oracles
    (reference lie/numpy/so3_common.py:144-182; wxyz convention)."""

    @staticmethod
    def _wxyz(r):
        q = r.as_quat()  # scipy: xyzw
        return np.concatenate([q[..., 3:4], q[..., :3]], axis=-1)

    def test_quat_mul_matches_matrix_product(self, rng):
        from scipy.spatial.transform import Rotation

        r1 = Rotation.random(8, random_state=np.random.RandomState(1))
        r2 = Rotation.random(8, random_state=np.random.RandomState(2))
        got = so3.quat_mul(jnp.asarray(self._wxyz(r1)), jnp.asarray(self._wxyz(r2)))
        want = self._wxyz(r1 * r2)
        # Quaternion double cover: q and -q are the same rotation.
        sign = np.sign(np.sum(np.asarray(got) * want, axis=-1, keepdims=True))
        assert np.allclose(np.asarray(got) * sign, want, atol=1e-6)

    def test_quat_rot_matches_matrix(self, rng):
        from scipy.spatial.transform import Rotation

        r = Rotation.random(5, random_state=np.random.RandomState(3))
        pts = rng.normal(size=(5, 17, 3))
        got = so3.quat_rot(jnp.asarray(self._wxyz(r)), jnp.asarray(pts))
        want = np.einsum("bij,bnj->bni", r.as_matrix(), pts)
        assert np.allclose(np.asarray(got), want, atol=1e-5)

    def test_quat_inv_is_inverse(self, rng):
        from scipy.spatial.transform import Rotation

        r = Rotation.random(6, random_state=np.random.RandomState(4))
        q = jnp.asarray(self._wxyz(r))
        prod = so3.quat_mul(q, so3.quat_inv(q))
        ident = np.zeros((6, 4)); ident[:, 0] = 1.0
        assert np.allclose(np.asarray(prod), ident, atol=1e-6)


class TestLogGradientsSafe:
    def test_log_grad_finite_at_identity_and_pi(self):
        """arccos' is inf at |cos|=1; the safe-input clip must keep
        jacobians finite exactly at theta=0 and theta=pi (a pose loss on
        log(residual) hits theta=0 at convergence)."""
        Ji = jax.jacobian(so3.log)(jnp.eye(3))
        assert np.all(np.isfinite(np.asarray(Ji)))
        R_pi = so3.exp(jnp.asarray([np.pi, 0.0, 0.0], jnp.float32))
        Jp = jax.jacobian(so3.log)(R_pi)
        assert np.all(np.isfinite(np.asarray(Jp)))
        # Forward values unchanged: identity -> 0, pi-rotation magnitude ~pi.
        assert np.allclose(np.asarray(so3.log(jnp.eye(3))), 0.0)
        assert np.linalg.norm(np.asarray(so3.log(R_pi))) == pytest.approx(
            np.pi, abs=1e-3)


class TestRedwoodQuatSign:
    def test_large_residual_matches_nibabel_convention(self, rng):
        """quat canonicalization (w >= 0) for residual rotations beyond
        ~120 deg, where quat_from_matrix may return the -q representative."""
        from scream_tpu.geometry.metrics import redwood_rmse

        w = jnp.asarray([0.0, 0.0, 2.8])  # 160 deg about z
        R = so3.exp(w)
        T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(
            jnp.asarray(rng.standard_normal(3), jnp.float32))
        info = jnp.asarray(rng.standard_normal((6, 6)), jnp.float32)
        info = info @ info.T + 6 * jnp.eye(6)  # SPD with cross terms

        q = np.asarray(so3.quat_from_matrix(R))
        q = q if q[0] >= 0 else -q  # nibabel convention
        er = np.concatenate([np.asarray(T[:3, 3]), q[1:]])
        want = er @ np.asarray(info) @ er / np.asarray(info)[0, 0]
        got = float(redwood_rmse(T, info))
        assert got == pytest.approx(float(want), rel=1e-5)
