"""Kabsch / pairwise-distance / metric unit tests against numpy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from scream_tpu.geometry import (
    square_distance,
    masked_square_distance,
    nearest_neighbor,
    radius_count,
    kabsch,
    integrate_trans,
    transformation_error,
    chamfer_distance,
)
from scream_tpu.geometry.metrics import redwood_rmse, registration_recall_rmse, height_mae, height_mse


def np_square_distance(src, dst):
    return ((src[:, None, :] - dst[None, :, :]) ** 2).sum(-1)


class TestPairwise:
    def test_square_distance(self, rng):
        src = rng.normal(size=(1, 50, 3)).astype(np.float32)
        dst = rng.normal(size=(1, 70, 3)).astype(np.float32)
        ours = np.asarray(square_distance(jnp.asarray(src), jnp.asarray(dst)))
        ref = np_square_distance(src[0], dst[0])
        assert np.allclose(ours[0], ref, atol=1e-4)

    def test_masked_square_distance(self, rng):
        src = rng.normal(size=(2, 10, 3)).astype(np.float32)
        dst = rng.normal(size=(2, 12, 3)).astype(np.float32)
        src_mask = np.ones((2, 10), dtype=bool)
        dst_mask = np.ones((2, 12), dtype=bool)
        src_mask[:, 7:] = False
        dst_mask[:, 9:] = False
        d = np.asarray(
            masked_square_distance(
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(src_mask), jnp.asarray(dst_mask)
            )
        )
        assert (d[:, 7:, :] >= 1e9).all()
        assert (d[:, :, 9:] >= 1e9).all()
        ref = np_square_distance(src[0, :7], dst[0, :9])
        assert np.allclose(d[0, :7, :9], ref, atol=1e-4)

    def test_nearest_neighbor(self, rng):
        src = rng.normal(size=(2, 33, 3)).astype(np.float32)
        dst = rng.normal(size=(2, 47, 3)).astype(np.float32)
        dist, idx = nearest_neighbor(jnp.asarray(src), jnp.asarray(dst))
        for b in range(2):
            ref = np_square_distance(src[b], dst[b])
            assert np.allclose(np.asarray(dist)[b], ref.min(axis=1), atol=1e-4)
            assert (np.asarray(idx)[b] == ref.argmin(axis=1)).all()

    def test_nearest_neighbor_chunked(self, rng):
        src = rng.normal(size=(100, 3)).astype(np.float32)
        dst = rng.normal(size=(37, 3)).astype(np.float32)
        dist, idx = nearest_neighbor(jnp.asarray(src), jnp.asarray(dst), chunk=16)
        ref = np_square_distance(src, dst)
        assert np.allclose(np.asarray(dist), ref.min(axis=1), atol=1e-4)
        assert (np.asarray(idx) == ref.argmin(axis=1)).all()

    def test_nearest_neighbor_masked(self, rng):
        src = rng.normal(size=(5, 3)).astype(np.float32)
        dst = np.concatenate([rng.normal(size=(5, 3)), src], axis=0).astype(np.float32)
        mask = np.ones(10, dtype=bool)
        mask[5:] = False  # mask out the exact copies
        dist, idx = nearest_neighbor(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask))
        assert (np.asarray(idx) < 5).all()

    def test_radius_count(self, rng):
        src = rng.normal(size=(1, 20, 3)).astype(np.float32)
        dst = rng.normal(size=(1, 30, 3)).astype(np.float32)
        r = 0.8
        counts = np.asarray(radius_count(jnp.asarray(src), jnp.asarray(dst), r))
        ref = (np_square_distance(src[0], dst[0]) < r * r).sum(axis=1)
        assert (counts[0] == ref).all()


class TestKabsch:
    def test_exact_recovery(self, rng):
        """Kabsch on noiseless correspondences recovers the exact pose."""
        R = Rotation.random(random_state=3).as_matrix().astype(np.float32)
        t = rng.normal(size=(3,)).astype(np.float32)
        A = rng.normal(size=(1, 100, 3)).astype(np.float32)
        B = A @ R.T + t
        T = np.asarray(kabsch(jnp.asarray(A), jnp.asarray(B)))
        assert np.allclose(T[0, :3, :3], R, atol=1e-4)
        assert np.allclose(T[0, :3, 3], t, atol=1e-4)
        assert np.allclose(T[0, 3], [0, 0, 0, 1])

    def test_weighted_ignores_outliers(self, rng):
        R = Rotation.random(random_state=4).as_matrix().astype(np.float32)
        t = np.array([0.5, -1.0, 2.0], dtype=np.float32)
        A = rng.normal(size=(1, 60, 3)).astype(np.float32)
        B = A @ R.T + t
        # corrupt last 20 correspondences, weight them 0
        B[:, 40:] += rng.normal(size=(1, 20, 3)) * 10
        w = np.ones((1, 60), dtype=np.float32)
        w[:, 40:] = 0
        T = np.asarray(kabsch(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w)))
        assert np.allclose(T[0, :3, :3], R, atol=1e-4)
        assert np.allclose(T[0, :3, 3], t, atol=1e-4)

    def test_reflection_correction(self):
        """Degenerate/noisy case must still return det(R) = +1."""
        A = jnp.asarray(np.random.default_rng(7).normal(size=(4, 10, 3)), jnp.float32)
        B = jnp.asarray(np.random.default_rng(8).normal(size=(4, 10, 3)), jnp.float32)
        T = np.asarray(kabsch(A, B))
        dets = np.linalg.det(T[:, :3, :3])
        assert np.allclose(dets, 1.0, atol=1e-4)

    def test_batched(self, rng):
        Rs = Rotation.random(5, random_state=11).as_matrix().astype(np.float32)
        ts = rng.normal(size=(5, 3)).astype(np.float32)
        A = rng.normal(size=(5, 40, 3)).astype(np.float32)
        B = np.einsum("bij,bnj->bni", Rs, A) + ts[:, None]
        T = np.asarray(kabsch(jnp.asarray(A), jnp.asarray(B)))
        assert np.allclose(T[:, :3, :3], Rs, atol=1e-4)
        assert np.allclose(T[:, :3, 3], ts, atol=1e-4)

    def test_integrate_trans(self, rng):
        R = Rotation.random(random_state=5).as_matrix().astype(np.float32)
        t = rng.normal(size=(3, 1)).astype(np.float32)
        T = np.asarray(integrate_trans(jnp.asarray(R), jnp.asarray(t)))
        assert T.shape == (4, 4)
        assert np.allclose(T[:3, :3], R)
        assert np.allclose(T[:3, 3:], t)


class TestMetrics:
    def test_transformation_error(self, rng):
        angle_deg = 17.0
        R = Rotation.from_rotvec([0, 0, np.deg2rad(angle_deg)]).as_matrix().astype(np.float32)
        T_pred = np.eye(4, dtype=np.float32)
        T_pred[:3, :3] = R
        T_pred[:3, 3] = [1.0, 2.0, 2.0]
        T_gt = np.eye(4, dtype=np.float32)
        re, te = transformation_error(jnp.asarray(T_pred), jnp.asarray(T_gt))
        assert abs(float(re) - angle_deg) < 1e-3
        assert abs(float(te) - 3.0) < 1e-5

    def test_redwood_rmse_identity(self):
        """Identity residual -> zero error regardless of covariance."""
        info = np.eye(6, dtype=np.float32) * 100.0
        p = redwood_rmse(jnp.eye(4), jnp.asarray(info))
        assert abs(float(p)) < 1e-9

    def test_redwood_rmse_formula(self, rng):
        """Check the er^T info er / info00 formula against a numpy oracle."""
        R = Rotation.from_rotvec([0.01, 0.02, -0.01]).as_matrix()
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [0.05, -0.02, 0.01]
        info = rng.normal(size=(6, 6))
        info = info @ info.T + np.eye(6)  # PSD
        # oracle (uses scipy quaternion, xyzw -> take xyz)
        q_xyz = Rotation.from_matrix(R).as_quat()[:3]
        qw = Rotation.from_matrix(R).as_quat()[3]
        q_xyz = q_xyz if qw >= 0 else -q_xyz  # our quat has w >= 0 from trace>0 branch
        er = np.concatenate([T[:3, 3], q_xyz])
        expected = er @ info @ er / info[0, 0]
        ours = float(redwood_rmse(jnp.asarray(T, jnp.float32), jnp.asarray(info, jnp.float32)))
        assert abs(ours - expected) < 1e-4

    def test_registration_recall_rmse_perfect(self, rng):
        T = np.eye(4, dtype=np.float32)
        info = np.eye(6, dtype=np.float32)
        rmse = registration_recall_rmse(jnp.asarray(T), jnp.asarray(T), jnp.asarray(info))
        assert float(rmse) < 1e-4

    def test_registration_recall_negative_form_counts_failed(self):
        """An indefinite gt.info covariance can make the quadratic form
        negative; the reference's unguarded np.sqrt yields NaN there and
        NaN < 0.2 counts the pair FAILED (evaluate_3d_match.py:122-124).
        Clipping to 0 would silently flip it to a success — we map to +inf,
        preserving the failure decision with an orderable value."""
        T_pred = np.eye(4, dtype=np.float32)
        T_pred[:3, 3] = [0.0, 0.5, 0.0]  # er dominated by the y translation
        info = np.diag([1.0, -1.0, 1.0, 1.0, 1.0, 1.0]).astype(np.float32)
        rmse = registration_recall_rmse(
            jnp.asarray(T_pred), jnp.eye(4), jnp.asarray(info))
        assert np.isinf(float(rmse))
        assert not bool(rmse < 0.2)  # counted as a failure, like the reference

    def test_chamfer_identical_clouds(self, rng):
        f = rng.normal(size=(1, 30, 3)).astype(np.float32)
        d = chamfer_distance(jnp.asarray(f), jnp.asarray(f))
        assert float(d[0]) < 1e-6

    def test_chamfer_oracle(self, rng):
        f = rng.normal(size=(1, 20, 3)).astype(np.float32)
        g = rng.normal(size=(1, 25, 3)).astype(np.float32)
        d = float(chamfer_distance(jnp.asarray(f), jnp.asarray(g))[0])
        dist = np_square_distance(f[0], g[0])
        expected = dist.min(axis=1).mean() + dist.min(axis=0).mean()
        assert abs(d - expected) < 1e-4

    def test_chamfer_masked(self, rng):
        f = rng.normal(size=(1, 20, 3)).astype(np.float32)
        g = rng.normal(size=(1, 25, 3)).astype(np.float32)
        f_pad = np.concatenate([f, rng.normal(size=(1, 5, 3)).astype(np.float32) * 100], axis=1)
        g_pad = np.concatenate([g, rng.normal(size=(1, 7, 3)).astype(np.float32) * 100], axis=1)
        mf = np.arange(25) < 20
        mg = np.arange(32) < 25
        d_masked = float(
            chamfer_distance(
                jnp.asarray(f_pad), jnp.asarray(g_pad), jnp.asarray(mf)[None], jnp.asarray(mg)[None]
            )[0]
        )
        d_ref = float(chamfer_distance(jnp.asarray(f), jnp.asarray(g))[0])
        assert abs(d_masked - d_ref) < 1e-4

    def test_height_metrics(self, rng):
        pred = rng.normal(size=(1, 10, 3)).astype(np.float32)
        gt = rng.normal(size=(1, 10, 3)).astype(np.float32)
        mae = float(height_mae(jnp.asarray(pred), jnp.asarray(gt))[0])
        mse = float(height_mse(jnp.asarray(pred), jnp.asarray(gt))[0])
        assert abs(mae - np.abs(pred[0, :, 2] - gt[0, :, 2]).mean()) < 1e-6
        assert abs(mse - ((pred[0, :, 2] - gt[0, :, 2]) ** 2).mean()) < 1e-6


class TestEstimateNormals:
    """PCA normals vs an exact-plane oracle (Open3D's estimate_normals
    semantics: smallest covariance eigenvector over the k-NN neighborhood,
    `/root/reference/visualize_3d_match.py:175-177` usage)."""

    def test_plane_recovers_normal(self):
        import jax.numpy as jnp

        from scream_tpu.geometry import estimate_normals, orient_normals_towards

        rng = np.random.default_rng(0)
        n_true = np.array([1.0, 2.0, -0.5])
        n_true /= np.linalg.norm(n_true)
        u = np.array([2.0, -1.0, 0.0]) / np.sqrt(5)
        v = np.cross(n_true, u)
        ab = rng.standard_normal((200, 2))
        pts = ab[:, :1] * u + ab[:, 1:] * v + rng.standard_normal((200, 3)) * 1e-4
        normals = np.asarray(estimate_normals(jnp.asarray(pts, jnp.float32), k=16))
        dots = np.abs(normals @ n_true)
        assert (dots > 0.999).mean() > 0.98

        cam = np.array([0.0, 0.0, 100.0])
        oriented = np.asarray(orient_normals_towards(
            jnp.asarray(normals), jnp.asarray(pts, jnp.float32), jnp.asarray(cam)))
        assert (oriented @ n_true * np.sign(n_true @ cam) > 0).mean() > 0.98

    def test_masked_padding_zero(self):
        import jax.numpy as jnp

        from scream_tpu.geometry import estimate_normals

        rng = np.random.default_rng(1)
        pts = np.zeros((1, 64, 3), np.float32)
        pts[0, :40] = rng.standard_normal((40, 3))
        mask = np.zeros((1, 64), bool)
        mask[0, :40] = True
        out = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(mask), k=8))
        assert np.allclose(out[0, 40:], 0.0)
        lens = np.linalg.norm(out[0, :40], axis=-1)
        np.testing.assert_allclose(lens, 1.0, atol=1e-4)

    def test_batch_consistency(self):
        import jax.numpy as jnp

        from scream_tpu.geometry import estimate_normals

        rng = np.random.default_rng(2)
        a = rng.standard_normal((50, 3)).astype(np.float32)
        b = rng.standard_normal((50, 3)).astype(np.float32)
        batched = np.asarray(estimate_normals(jnp.asarray(np.stack([a, b])), k=10))
        single = np.asarray(estimate_normals(jnp.asarray(a), k=10))
        # Whole-vector sign-flip invariance: each row must match up to a
        # global flip n -> -n (per-component |.| comparison would also
        # accept genuinely different directions like (x, -y, z)).
        err = np.minimum(
            np.linalg.norm(batched[0] - single, axis=-1),
            np.linalg.norm(batched[0] + single, axis=-1),
        )
        np.testing.assert_allclose(err, 0.0, atol=1e-5)
