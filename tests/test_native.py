"""Native C++ host ops vs the numpy/scipy oracles."""

import numpy as np
import pytest

from scream_tpu import native
from scream_tpu.ops.voxel import voxel_downsample_np


class TestNativeBuild:
    def test_library_builds_and_loads(self):
        # g++ is in the image; the library must actually build (the numpy
        # fallback exists for toolchain-less installs, not for CI).
        assert native.available()


class TestVoxelParity:
    @pytest.mark.parametrize("n,voxel", [(500, 0.1), (3000, 0.25), (64, 1.0)])
    def test_matches_numpy_oracle(self, rng, n, voxel):
        pts = rng.uniform(-3, 3, (n, 3))
        got = native.voxel_downsample(pts, voxel)
        want = voxel_downsample_np(pts, voxel)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_single_point(self):
        pts = np.array([[1.0, 2.0, 3.0]])
        out = native.voxel_downsample(pts, 0.5)
        np.testing.assert_allclose(out, pts, atol=1e-6)


class TestRadiusQueries:
    def test_has_neighbor_matches_scipy(self, rng):
        from scipy.spatial import cKDTree

        q = rng.uniform(-2, 2, (300, 3))
        r = rng.uniform(-2, 2, (400, 3))
        radius = 0.3
        got = native.radius_has_neighbor(q, r, radius)
        d, _ = cKDTree(r).query(q)
        want = d <= radius
        np.testing.assert_array_equal(got, want)

    def test_radius_count_matches_scipy(self, rng):
        from scipy.spatial import cKDTree

        q = rng.uniform(-1, 1, (200, 3))
        r = rng.uniform(-1, 1, (500, 3))
        radius = 0.25
        got = native.radius_count(q, r, radius)
        tree = cKDTree(r)
        want = np.asarray([len(x) for x in tree.query_ball_point(q, radius)])
        np.testing.assert_array_equal(got, want)

    def test_highest_in_radius_2d(self, rng):
        ref = np.array([
            [0.0, 0.0, 1.0],
            [0.1, 0.0, 5.0],
            [3.0, 3.0, 2.0],
        ])
        q = np.array([[0.05, 0.0, 0.0], [10.0, 10.0, 0.0]])
        idx = native.highest_in_radius_2d(q, ref, 0.5)
        assert idx[0] == 1  # highest z within radius
        assert idx[1] == -1  # nothing nearby

    def test_boundary_inclusive_both_paths(self):
        # A ref point at EXACTLY the radius must count as a neighbor on both
        # the native path (dist2 <= r*r, matching Open3D
        # search_radius_vector_3d, /root/reference/utils.py:99) and the scipy
        # fallback — cKDTree.query's distance_upper_bound is exclusive, which
        # is why the fallback uses query_ball_point.
        q = np.array([[0.0, 0.0, 0.0]])
        ref = np.array([[1.0, 0.0, 0.0]])
        assert native.radius_has_neighbor(q, ref, 1.0)[0]
        assert native.radius_count(q, ref, 1.0)[0] == 1
        saved = (native._lib, native._tried)
        try:
            native._lib, native._tried = None, True  # force scipy fallback
            assert native.radius_has_neighbor(q, ref, 1.0)[0]
            assert native.radius_count(q, ref, 1.0)[0] == 1
        finally:
            native._lib, native._tried = saved

    def test_empty_reference_cloud_both_paths(self, rng):
        q = rng.uniform(-1, 1, (7, 3))
        empty = np.empty((0, 3))
        for force_fallback in (False, True):
            saved = (native._lib, native._tried)
            try:
                if force_fallback:
                    native._lib, native._tried = None, True
                assert not native.radius_has_neighbor(q, empty, 0.5).any()
                assert (native.radius_count(q, empty, 0.5) == 0).all()
                assert (native.highest_in_radius_2d(q, empty, 0.5) == -1).all()
            finally:
                native._lib, native._tried = saved

    def test_highest_tie_breaks_to_lowest_index_both_paths(self):
        # Two equal-height candidates in radius: both paths must pick the
        # lowest index so preprocessing output is toolchain-independent.
        ref = np.array([
            [0.1, 0.0, 5.0],
            [0.0, 0.1, 5.0],
            [0.0, 0.0, 1.0],
        ])
        q = np.array([[0.0, 0.0, 0.0]])
        assert native.highest_in_radius_2d(q, ref, 1.0)[0] == 0
        saved = (native._lib, native._tried)
        try:
            native._lib, native._tried = None, True
            assert native.highest_in_radius_2d(q, ref, 1.0)[0] == 0
        finally:
            native._lib, native._tried = saved

    def test_highest_matches_scipy_random(self, rng):
        from scipy.spatial import cKDTree

        q = rng.uniform(-1, 1, (100, 3))
        r = rng.uniform(-1, 1, (300, 3))
        radius = 0.4
        got = native.highest_in_radius_2d(q, r, radius)
        tree = cKDTree(r[:, :2])
        for i, nbrs in enumerate(tree.query_ball_point(q[:, :2], radius)):
            if nbrs:
                assert got[i] == nbrs[int(np.argmax(r[nbrs, 2]))]
            else:
                assert got[i] == -1
