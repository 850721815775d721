"""Voxel-downsample and ICP tests against independent oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from scream_tpu.ops.voxel import voxel_downsample, voxel_downsample_np
from scream_tpu.geometry.icp import registration_icp, icp_refine_if_better
from scream_tpu.geometry.kabsch import integrate_trans


def brute_voxel_centroids(points, voxel_size):
    """Oracle: dict-based voxel centroid computation."""
    origin = points.min(axis=0)
    coords = np.floor((points - origin) / voxel_size).astype(np.int64)
    buckets = {}
    for p, c in zip(points, coords):
        buckets.setdefault(tuple(c), []).append(p)
    return np.array(sorted([np.mean(v, axis=0) for v in buckets.values()], key=tuple))


class TestVoxelDownsample:
    def test_matches_bruteforce(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32) * 2
        vs = 0.5
        out, valid = voxel_downsample(jnp.asarray(pts), vs, capacity=512)
        ours = np.asarray(out)[np.asarray(valid)]
        ref = brute_voxel_centroids(pts.astype(np.float64), vs)
        ours_sorted = np.array(sorted(ours.tolist(), key=tuple))
        assert ours_sorted.shape == ref.shape
        assert np.allclose(ours_sorted, ref, atol=1e-4)

    def test_np_reference_matches(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        ref = brute_voxel_centroids(pts.astype(np.float64), 0.3)
        ours = voxel_downsample_np(pts, 0.3)
        ours_sorted = np.array(sorted(ours.tolist(), key=tuple))
        assert np.allclose(ours_sorted, ref, atol=1e-5)

    def test_masked_input(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        pad = np.zeros((28, 3), dtype=np.float32) + 100.0
        both = np.concatenate([pts, pad])
        mask = np.arange(128) < 100
        out, valid = voxel_downsample(jnp.asarray(both), 0.4, capacity=128, mask=jnp.asarray(mask))
        out_ref, valid_ref = voxel_downsample(jnp.asarray(pts), 0.4, capacity=128)
        a = np.array(sorted(np.asarray(out)[np.asarray(valid)].tolist(), key=tuple))
        b = np.array(sorted(np.asarray(out_ref)[np.asarray(valid_ref)].tolist(), key=tuple))
        assert np.allclose(a, b, atol=1e-5)

    def test_capacity_truncation(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32) * 10
        out, valid = voxel_downsample(jnp.asarray(pts), 0.01, capacity=64)
        # every point its own voxel -> only 64 survive
        assert int(np.asarray(valid).sum()) == 64

    def test_coarse_collapses_to_one(self, rng):
        pts = rng.uniform(0, 0.9, size=(50, 3)).astype(np.float32)
        out, valid = voxel_downsample(jnp.asarray(pts), 100.0, capacity=8)
        assert int(np.asarray(valid).sum()) == 1
        assert np.allclose(np.asarray(out)[0], pts.mean(axis=0), atol=1e-4)


class TestICP:
    def _make_pair(self, rng, n=200, angle=0.05, trans=0.05, noise=0.0):
        src = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        R = Rotation.from_rotvec(rng.normal(size=3) * angle).as_matrix().astype(np.float32)
        t = (rng.normal(size=3) * trans).astype(np.float32)
        tgt = src @ R.T + t
        if noise:
            tgt = tgt + rng.normal(size=tgt.shape).astype(np.float32) * noise
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3] = R
        T_gt[:3, 3] = t
        return src, tgt, T_gt

    def test_converges_from_identity(self, rng):
        src, tgt, T_gt = self._make_pair(rng)
        res = registration_icp(jnp.asarray(src), jnp.asarray(tgt), 0.3, max_iteration=50)
        assert np.allclose(np.asarray(res.transformation), T_gt, atol=1e-3)
        assert float(res.fitness) > 0.99
        assert float(res.inlier_rmse) < 1e-3

    def test_early_termination(self, rng):
        """Perfectly aligned clouds should converge in far fewer than max_iteration."""
        src, tgt, T_gt = self._make_pair(rng, angle=0.0, trans=0.0)
        res = registration_icp(jnp.asarray(src), jnp.asarray(tgt), 0.3, max_iteration=1000)
        assert int(res.iterations) < 10

    def test_convergence_returns_measured_transform(self, rng):
        """Open3D's break fires after MEASURING a transform and returns that
        transform — not one more speculative update. With thresholds so
        loose that the first comparison converges, the loop must return the
        single-update transform, bit-identical to a max_iteration=1 run
        (the old loop returned one extra Kabsch update past convergence)."""
        src, tgt, _ = self._make_pair(rng)  # misaligned: T1 != T2
        loose = registration_icp(jnp.asarray(src), jnp.asarray(tgt), 0.3,
                                 max_iteration=1000,
                                 relative_fitness=10.0, relative_rmse=10.0)
        one = registration_icp(jnp.asarray(src), jnp.asarray(tgt), 0.3,
                               max_iteration=1)
        assert int(loose.iterations) == 1
        np.testing.assert_allclose(np.asarray(loose.transformation),
                                   np.asarray(one.transformation), atol=1e-7)
        # ...and it is genuinely not the two-update transform.
        two = registration_icp(jnp.asarray(src), jnp.asarray(tgt), 0.3,
                               max_iteration=2,
                               relative_fitness=-1.0, relative_rmse=-1.0)
        assert not np.allclose(np.asarray(loose.transformation),
                               np.asarray(two.transformation), atol=1e-7)

    def test_max_iteration_counts_updates(self, rng):
        """On exhaustion the loop performs exactly max_iteration Kabsch
        updates (Open3D: `for i in range(max_iteration)`), reporting that
        count."""
        src, tgt, _ = self._make_pair(rng)
        res = registration_icp(jnp.asarray(src), jnp.asarray(tgt), 0.3,
                               max_iteration=3,
                               relative_fitness=-1.0, relative_rmse=-1.0)
        assert int(res.iterations) == 3

    def test_masked(self, rng):
        src, tgt, T_gt = self._make_pair(rng, n=150)
        src_pad = np.concatenate([src, np.full((50, 3), 50.0, np.float32)])
        tgt_pad = np.concatenate([tgt, np.full((30, 3), -50.0, np.float32)])
        sm = np.arange(200) < 150
        tm = np.arange(180) < 150
        res = registration_icp(
            jnp.asarray(src_pad), jnp.asarray(tgt_pad), 0.3,
            max_iteration=50, src_mask=jnp.asarray(sm), tgt_mask=jnp.asarray(tm),
        )
        assert np.allclose(np.asarray(res.transformation), T_gt, atol=1e-3)

    def test_open3d_parity(self, rng):
        """If open3d is importable, compare against the real thing."""
        try:
            import open3d as o3d
        except ImportError:
            import pytest

            pytest.skip("open3d not installed")
        if not hasattr(o3d, "geometry"):
            # test_torch_parity installs an empty open3d stub in sys.modules
            # so the reference's utils.py imports; that is not the real thing.
            import pytest

            pytest.skip("open3d stubbed (not actually installed)")
        src, tgt, T_gt = self._make_pair(rng, noise=0.002)
        res = registration_icp(jnp.asarray(src), jnp.asarray(tgt), 0.3, max_iteration=30)
        src_pc = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(src.astype(np.float64)))
        tgt_pc = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(tgt.astype(np.float64)))
        ref = o3d.pipelines.registration.registration_icp(
            src_pc, tgt_pc, 0.3, np.eye(4),
            o3d.pipelines.registration.TransformationEstimationPointToPoint(),
        )
        assert np.allclose(np.asarray(res.transformation), ref.transformation, atol=5e-3)

    def test_refine_if_better_keeps_better(self, rng):
        src, tgt, T_gt = self._make_pair(rng)
        # bad init far from truth: ICP should converge and be kept
        T, re, te = icp_refine_if_better(
            jnp.asarray(src), jnp.asarray(tgt), jnp.eye(4), jnp.asarray(T_gt), 0.3,
            max_iteration=50,
        )
        assert float(re) < 0.1 and float(te) < 1e-2

    def test_refine_if_better_rejects_worse(self, rng):
        """Start exactly at GT on noisy data: the result must stay at GT up to
        the metric's fp32 noise floor (RE via arccos is ill-conditioned near
        zero — even transformation_error(T, T) reads ~0.03 deg), whether the
        acceptance rule kept the init or an ICP solution that ties it."""
        src, tgt, T_gt = self._make_pair(rng, noise=0.05)
        T, re, te = icp_refine_if_better(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(T_gt), jnp.asarray(T_gt), 0.5,
            max_iteration=10,
        )
        assert float(re) <= 0.1 and float(te) <= 1e-2
        assert np.allclose(np.asarray(T), T_gt, atol=1e-2)


class TestVoxelFineGrid:
    def test_no_int32_overflow_on_fine_grids(self, rng):
        """A linearized int32 voxel key overflows when dims0*dims1*dims2 >
        2^31 (fine voxel on a large extent); the lexicographic sort must
        keep matching the int64 numpy oracle there."""
        from scream_tpu.ops.voxel import voxel_downsample, voxel_downsample_np

        pts = (rng.random((64, 3)) * 200.0).astype(np.float32)
        got, valid = voxel_downsample(jnp.asarray(pts), 0.01, capacity=128)
        got = np.asarray(got)[np.asarray(valid)]
        want = voxel_downsample_np(pts, 0.01)
        assert len(got) == len(want)
        np.testing.assert_allclose(
            np.sort(got, axis=0), np.sort(want, axis=0), atol=1e-4)
