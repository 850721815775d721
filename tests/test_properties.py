"""Property/fuzz tests: invariants over random shapes and degenerate inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scream_tpu.geometry import se3, so3
from scream_tpu.geometry.kabsch import kabsch
from scream_tpu.geometry.metrics import transformation_error
from scream_tpu.ops.render import render_depth_images
from scream_tpu.ops.voxel import voxel_downsample


class TestKabschProperties:
    @pytest.mark.parametrize("n", [3, 17, 100])
    def test_recovers_random_rigid_any_n(self, rng, n):
        A = rng.standard_normal((1, n, 3)).astype(np.float32)
        R = np.asarray(so3.exp(jnp.asarray(rng.standard_normal(3), jnp.float32)))
        t = rng.standard_normal(3).astype(np.float32)
        B = A @ R.T + t
        T = np.asarray(kabsch(jnp.asarray(A), jnp.asarray(B)))[0]
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)

    def test_output_always_proper_rotation(self, rng):
        """Even on degenerate inputs (colinear, duplicated, zero-weight) the
        rotation stays orthonormal with det +1."""
        cases = [
            rng.standard_normal((1, 10, 3)),
            np.tile(rng.standard_normal((1, 1, 3)), (1, 10, 1)),  # all identical
            np.concatenate([np.linspace(0, 1, 10)[None, :, None]] * 3, -1),  # colinear
        ]
        for A in cases:
            A = jnp.asarray(A, jnp.float32)
            T = np.asarray(kabsch(A, A))[0]
            R = T[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-3)

    def test_zero_weights_dont_nan(self, rng):
        A = jnp.asarray(rng.standard_normal((1, 8, 3)), jnp.float32)
        w = jnp.zeros((1, 8), jnp.float32)
        T = np.asarray(kabsch(A, A, w))
        assert np.all(np.isfinite(T))


class TestLieProperties:
    def test_se3_group_axioms(self, rng):
        v1 = jnp.asarray(rng.standard_normal((5, 6)) * 0.5, jnp.float32)
        v2 = jnp.asarray(rng.standard_normal((5, 6)) * 0.5, jnp.float32)
        T1, T2 = se3.exp(v1), se3.exp(v2)
        # inverse: T . T^-1 = identity (3x4 convention, reference
        # lie/numpy/utils.py)
        I34 = jnp.broadcast_to(jnp.eye(4)[:3], np.asarray(T1)[..., :3, :].shape)
        np.testing.assert_allclose(
            np.asarray(se3.se3_cat(T1[..., :3, :], se3.se3_inv(T1[..., :3, :]))),
            np.asarray(I34), atol=1e-4)
        # composition stays rigid
        T = np.asarray(se3.se3_cat(T1, T2))
        R = T[..., :3, :3]
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3), R.shape), atol=1e-4)

    def test_transform_error_symmetry(self, rng):
        v = jnp.asarray(rng.standard_normal(6) * 0.3, jnp.float32)
        T = se3.exp(v[None])[0]
        re_fwd, _ = transformation_error(T, jnp.eye(4))
        re_bwd, _ = transformation_error(jnp.eye(4), T)
        assert float(re_fwd) == pytest.approx(float(re_bwd), abs=1e-3)


class TestVoxelProperties:
    @pytest.mark.parametrize("n,voxel", [(1, 1.0), (33, 0.01), (999, 10.0)])
    def test_output_invariants(self, rng, n, voxel):
        pts = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
        out, mask = voxel_downsample(pts, voxel, capacity=1024)
        m = np.asarray(mask)
        o = np.asarray(out)
        # valid centroids lie within the input bounding box
        lo, hi = np.asarray(pts).min(0) - 1e-5, np.asarray(pts).max(0) + 1e-5
        assert np.all(o[m] >= lo) and np.all(o[m] <= hi)
        # giant voxel collapses everything to the global centroid
        if voxel >= 10.0:
            assert m.sum() == 1
            np.testing.assert_allclose(o[0], np.asarray(pts).mean(0), atol=1e-4)


class TestRendererProperties:
    def test_single_point_renders_hotspot(self):
        src = jnp.asarray([[[0.0, 0.0, 0.5]]], jnp.float32)
        imgs = render_depth_images(src, src, rho=8.0, width=16, multi_view=False,
                                   tile=256)
        img = np.asarray(imgs[0, 0, 0])
        # brightest pixel is near the image center (point at origin xy)
        iy, ix = np.unravel_index(img.argmax(), img.shape)
        assert abs(iy - 8) <= 1 and abs(ix - 8) <= 1

    def test_extreme_rho_finite(self, rng):
        src = jnp.asarray(rng.uniform(-1, 1, (1, 8, 3)), jnp.float32)
        for rho in (0.1, 500.0):
            imgs = render_depth_images(src, src, rho=rho, width=16,
                                       multi_view=False, tile=256)
            assert bool(jnp.isfinite(imgs).all())
