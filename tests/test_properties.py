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

    def test_so3_log_exp_roundtrip_all_magnitudes(self, rng):
        """exp(log(R)) == R across the FULL angle range, including the
        near-pi band where the old arccos-based log was catastrophically
        wrong (up to ~60 deg equivalent within 3e-3 rad of 180 deg)."""
        from scream_tpu.geometry import so3

        axes = rng.standard_normal((40, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        # Dense sweep: tiny, generic, and a cluster hugging pi.
        mags = np.concatenate([
            np.array([1e-8, 1e-6, 1e-4, 0.1, 1.0, 2.0, 3.0]),
            np.pi - np.geomspace(1e-6, 0.3, 33),
        ])
        w = axes * mags[:, None]
        R = np.asarray(so3.exp(jnp.asarray(w, jnp.float32)))
        w_rt = np.asarray(so3.log(jnp.asarray(R, jnp.float32)))
        R_rt = np.asarray(so3.exp(jnp.asarray(w_rt, jnp.float32)))
        # The rotation itself must round-trip to fp32-representation error.
        np.testing.assert_allclose(R_rt, R, atol=5e-3)
        # And the angle magnitude must be preserved tightly.
        np.testing.assert_allclose(
            np.linalg.norm(w_rt, axis=-1), mags, atol=5e-4)

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


class TestICPProperties:
    def test_icp_equivariant_under_frame_change(self, rng):
        """Rotating both clouds by G conjugates the recovered transform:
        icp(G.src, G.tgt) == G . icp(src, tgt) . G^-1."""
        from scream_tpu.data.synthetic import make_pair
        from scream_tpu.geometry.icp import registration_icp

        pair = make_pair(rng, 256, 256, overlap=1.0, max_angle=0.3, max_trans=0.1)
        src = jnp.asarray(pair["src"])
        tgt = jnp.asarray(pair["tgt"])

        r1 = registration_icp(src, tgt, 0.5, max_iteration=15)

        G = np.eye(4, dtype=np.float32)
        G[:3, :3] = np.asarray(so3.exp(jnp.asarray([0.2, -0.3, 0.5], jnp.float32)))
        G[:3, 3] = [0.4, -0.2, 0.1]
        Gj = jnp.asarray(G)
        src_g = src @ Gj[:3, :3].T + Gj[:3, 3]
        tgt_g = tgt @ Gj[:3, :3].T + Gj[:3, 3]
        r2 = registration_icp(src_g, tgt_g, 0.5, max_iteration=15)

        want = G @ np.asarray(r1.transformation) @ np.linalg.inv(G)
        np.testing.assert_allclose(np.asarray(r2.transformation), want, atol=5e-3)

    def test_icp_identity_fixpoint(self, rng):
        """Identical clouds from the identity init: ICP stays at identity."""
        from scream_tpu.geometry.icp import registration_icp

        pts = jnp.asarray(rng.standard_normal((128, 3)), jnp.float32)
        r = registration_icp(pts, pts, 0.5, max_iteration=10)
        np.testing.assert_allclose(np.asarray(r.transformation), np.eye(4), atol=1e-5)
        assert float(r.fitness) == 1.0
        # fp32 floor: the -2ab+a^2+b^2 expansion leaves ~1e-8 squared
        # residuals on identical points -> rmse ~1e-4
        assert float(r.inlier_rmse) < 1e-3
