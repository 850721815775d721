"""Pallas NN kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scream_tpu.geometry.pairwise import masked_square_distance
from scream_tpu.ops.nn_pallas import (
    nearest_neighbor_auto,
    nearest_neighbor_full,
    nearest_neighbor_pallas,
)


def _reference(src, dst, dst_mask=None):
    d2 = masked_square_distance(src[None], dst[None],
                                dst_mask=None if dst_mask is None else dst_mask[None])
    return np.asarray(d2[0].min(axis=-1)), np.asarray(d2[0].argmin(axis=-1))


class TestNNPallas:
    @pytest.mark.parametrize("n,m", [(128, 512), (200, 700), (64, 100)])
    def test_matches_reference(self, rng, n, m):
        src = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        dst = jnp.asarray(rng.standard_normal((m, 3)), jnp.float32)
        got_d, got_i, got_xyz = nearest_neighbor_pallas(src, dst, interpret=True)
        want_d, want_i = _reference(src, dst)
        np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)
        # winner coordinates == gathered dst rows
        np.testing.assert_allclose(
            np.asarray(got_xyz), np.asarray(dst)[want_i], atol=1e-6
        )

    def test_masked_dst_never_wins(self, rng):
        src = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
        dst = jnp.concatenate([src, src * 0.5], axis=0)  # first half identical
        mask = jnp.arange(128) < 64
        # mask OUT the identical first half: NN must come from the second half
        got_d, got_i, got_xyz = nearest_neighbor_pallas(src, dst, ~mask,
                                                        interpret=True)
        assert np.all(np.asarray(got_i) >= 64)
        want_d, want_i = _reference(src, dst, ~mask)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)
        np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_xyz), np.asarray(dst)[want_i], atol=1e-6
        )

    def test_tie_break_first_index(self):
        src = jnp.zeros((8, 3), jnp.float32)
        dst = jnp.zeros((16, 3), jnp.float32)  # all equidistant (0)
        _, idx, _ = nearest_neighbor_pallas(src, dst, interpret=True)
        assert np.all(np.asarray(idx) == 0)

    def test_auto_dispatch_cpu(self, rng):
        src = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
        dst = jnp.asarray(rng.standard_normal((2, 48, 3)), jnp.float32)
        mask = jnp.ones((2, 48), bool)
        d, i = nearest_neighbor_auto(src, dst, mask)
        assert d.shape == (2, 32) and i.shape == (2, 32)
        want_d, want_i = _reference(src[0], dst[0])
        np.testing.assert_allclose(np.asarray(d[0]), want_d, atol=1e-5)

    def test_full_dispatch_coords(self, rng):
        src = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
        dst = jnp.asarray(rng.standard_normal((2, 48, 3)), jnp.float32)
        d, i, xyz = nearest_neighbor_full(src, dst)
        assert xyz.shape == (2, 32, 3)
        np.testing.assert_allclose(
            np.asarray(xyz[0]), np.asarray(dst[0])[np.asarray(i[0])], atol=1e-6
        )


class TestBoundedNN:
    """Threshold-bounded NN: exact within the threshold, pruned beyond
    (the ICP hot-loop contract — correspondences past the threshold carry
    zero weight, scream_tpu/geometry/icp.py)."""

    def _clouds(self, rng, n=700, m=900, sorted_=True):
        src = rng.random((n, 3)).astype(np.float32) * 3.0
        dst = rng.random((m, 3)).astype(np.float32) * 3.0
        if sorted_:
            # Voxel-sort-like spatial coherence (lexsort by grid key).
            def keysort(p):
                k = np.floor(p / 0.2)
                order = np.lexsort((k[:, 2], k[:, 1], k[:, 0]))
                return p[order]
            src, dst = keysort(src), keysort(dst)
        return src, dst

    def test_exact_within_threshold(self, rng):
        from scream_tpu.geometry.pairwise import masked_square_distance
        from scream_tpu.ops.nn_pallas import nearest_neighbor_bounded

        src, dst = self._clouds(rng)
        thresh_sq = np.float32(0.01)  # 0.1 distance
        d, xyz = nearest_neighbor_bounded(
            jnp.asarray(src), jnp.asarray(dst), thresh_sq, interpret=True)
        ref = np.asarray(masked_square_distance(src[None], dst[None])[0])
        ref_min = ref.min(-1)
        ref_xyz = dst[ref.argmin(-1)]
        inlier = ref_min <= thresh_sq
        assert inlier.sum() > 20, "fixture should produce inliers"
        np.testing.assert_allclose(np.asarray(d)[inlier], ref_min[inlier],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(xyz)[inlier], ref_xyz[inlier],
                                   atol=1e-6)
        # Outside the threshold only the bound matters.
        assert (np.asarray(d)[~inlier] > thresh_sq).all()

    def test_masked_dst(self, rng):
        from scream_tpu.geometry.pairwise import masked_square_distance
        from scream_tpu.ops.nn_pallas import nearest_neighbor_bounded

        src, dst = self._clouds(rng, n=600, m=800)
        mask = rng.random(800) > 0.3
        thresh_sq = np.float32(0.02)
        d, xyz = nearest_neighbor_bounded(
            jnp.asarray(src), jnp.asarray(dst), thresh_sq,
            dst_mask=jnp.asarray(mask), interpret=True)
        ref = np.asarray(masked_square_distance(
            src[None], dst[None], dst_mask=mask[None])[0])
        ref_min = ref.min(-1)
        inlier = ref_min <= thresh_sq
        np.testing.assert_allclose(np.asarray(d)[inlier], ref_min[inlier],
                                   atol=1e-5)
        assert (np.asarray(d)[~inlier] > thresh_sq).all()

    def test_pruning_fires_on_sorted_clouds(self, rng):
        """The skip matrix must actually prune most tile pairs on spatially
        sorted clouds — the entire point of the bounded kernel."""
        import jax.numpy as jnp

        from scream_tpu.ops.nn_pallas import (
            FAR,
            _box_gap_sq,
            _tile_boxes,
        )

        src, dst = self._clouds(rng, n=4096, m=4096)
        lo_s, hi_s = _tile_boxes(jnp.asarray(src), 512)
        lo_d, hi_d = _tile_boxes(jnp.asarray(dst), 512, far_sentinel=FAR)
        gap = np.asarray(_box_gap_sq(lo_s, hi_s, lo_d, hi_d))
        skip_frac = (gap > 0.01).mean()
        assert skip_frac > 0.4, f"pruning too weak: {skip_frac:.2f}"

    def test_all_pruned_returns_bound(self, rng):
        from scream_tpu.ops.nn_pallas import nearest_neighbor_bounded

        src = rng.random((600, 3)).astype(np.float32)
        dst = rng.random((600, 3)).astype(np.float32) + 100.0  # far away
        d, xyz = nearest_neighbor_bounded(
            jnp.asarray(src), jnp.asarray(dst), np.float32(0.01),
            interpret=True)
        assert (np.asarray(d) > 0.01).all()
        assert np.isfinite(np.asarray(xyz)).all()


class TestBatchedBoundedNN:
    """Natively batched bounded NN (`_bounded_batched`): one grid-(B, n, m)
    pallas_call replacing B per-lane Mosaic calls (per-lane call overhead
    dominated the vmapped ICP iteration — scream_tpu/ops/nn_pallas.py).
    Verified in interpret mode against the unbatched impl and the XLA
    reference; the on-chip trajectory equivalence lives in selftest-tpu."""

    def _batch(self, rng, B=3, n=1500, m=1300, sort=False):
        src = rng.random((B, n, 3)).astype(np.float32) * 2
        dst = rng.random((B, m, 3)).astype(np.float32) * 2
        if sort:  # spatial coherence so pruning (incl. sub-slab bits) fires
            src = np.take_along_axis(
                src, np.argsort(src[..., 0], axis=1)[..., None], 1)
            dst = np.take_along_axis(
                dst, np.argsort(dst[..., 0], axis=1)[..., None], 1)
        mask = rng.random((B, m)) > 0.2
        return src, dst, mask

    def test_coarse_bit_exact_vs_vmapped_unbatched(self, rng):
        from scream_tpu.ops.nn_pallas import _bounded_batched, _bounded_impl

        src, dst, mask = self._batch(rng)
        dead = np.array([False, True, False])
        t = np.float32(0.02)
        db, xb = _bounded_batched(
            jnp.asarray(src), jnp.asarray(dst), jnp.float32(t),
            jnp.asarray(mask), jnp.asarray(dead), interpret=True, fine=False)
        dv, xv = jax.vmap(lambda s, d, m_, dd: _bounded_impl(
            s, d, jnp.float32(t), m_, dd, interpret=True,
            tile_n=1024, tile_m=256))(
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
                jnp.asarray(dead))
        np.testing.assert_array_equal(np.asarray(db), np.asarray(dv))
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(xv))
        # dead lane: every output lands beyond the bound ("no neighbor").
        assert (np.asarray(db)[1] > t).all()

    @pytest.mark.parametrize("fine", [False, True])
    def test_contract_vs_xla_reference(self, rng, fine):
        """Exact within the threshold, > threshold outside, dead lane all-out
        — for both the coarse and the bit-packed sub-slab (fine) kernels on
        spatially sorted clouds where the pruning actually fires."""
        from scream_tpu.ops.nn_pallas import _bounded_batched

        src, dst, mask = self._batch(rng, sort=True)
        dead = np.array([False, True, False])
        t = np.float32(0.02)
        d, xyz = _bounded_batched(
            jnp.asarray(src), jnp.asarray(dst), jnp.float32(t),
            jnp.asarray(mask), jnp.asarray(dead), interpret=True, fine=fine)
        d, xyz = np.asarray(d), np.asarray(xyz)
        ref = np.asarray(masked_square_distance(
            jnp.asarray(src), jnp.asarray(dst), dst_mask=jnp.asarray(mask)))
        ref_min, ref_arg = ref.min(-1), ref.argmin(-1)
        for b in (0, 2):  # live lanes
            inl = ref_min[b] <= t
            assert inl.sum() > 50, "fixture should produce inliers"
            np.testing.assert_allclose(d[b][inl], ref_min[b][inl], atol=1e-5)
            np.testing.assert_array_equal(xyz[b][inl], dst[b][ref_arg[b]][inl])
            assert (d[b][~inl] > t).all()
        assert (d[1] > t).all()

    def test_per_lane_threshold(self, rng):
        from scream_tpu.ops.nn_pallas import _bounded_batched, _bounded_impl

        src, dst, mask = self._batch(rng)
        tb = np.array([0.02, 0.05, 0.01], np.float32)
        db, _ = _bounded_batched(jnp.asarray(src), jnp.asarray(dst),
                                 jnp.asarray(tb), jnp.asarray(mask), None,
                                 interpret=True)
        for b in range(3):
            dv, _ = _bounded_impl(jnp.asarray(src[b]), jnp.asarray(dst[b]),
                                  jnp.float32(tb[b]), jnp.asarray(mask[b]),
                                  None, interpret=True, tile_n=1024,
                                  tile_m=256)
            np.testing.assert_array_equal(np.asarray(db[b]), np.asarray(dv))

    def test_vmap_routes_to_one_batched_call(self, rng):
        """A caller's vmap over the public API must lower to ONE pallas_call
        (the custom_vmap rule), not B per-lane calls — tracing is
        backend-independent, so the routing is checkable on CPU."""
        from scream_tpu.ops.nn_pallas import nearest_neighbor_bounded

        src, dst, mask = self._batch(rng, B=4, n=1100, m=900)
        jaxpr = str(jax.make_jaxpr(jax.vmap(
            lambda s, d, m_: nearest_neighbor_bounded(
                s, d, jnp.float32(0.02), m_)))(
                    jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)))
        assert jaxpr.count("pallas_call") == 1, jaxpr.count("pallas_call")

    def test_grouped_fine4_bit_exact_vs_fine1(self, rng, monkeypatch):
        """The grouped-dst fine4 kernel (4 x 256-row dst sub-tiles per grid
        step) must be BIT-exact vs the per-256-row-step fine kernel —
        distances and winner coordinates, incl. odd sizes, masks, a dead
        lane, and a per-lane threshold (same pruning granularity, same
        ascending-dst accumulation order)."""
        from scream_tpu.ops.nn_pallas import _bounded_batched

        src, dst, mask = self._batch(rng, B=3, n=1500, m=1300, sort=True)
        dead = np.array([False, True, False])
        tb = np.array([0.02, 0.05, 0.01], np.float32)
        monkeypatch.setenv("SCREAM_NN_DSTGROUP", "4")
        d4, x4 = _bounded_batched(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(tb),
            jnp.asarray(mask), jnp.asarray(dead), interpret=True)
        monkeypatch.delenv("SCREAM_NN_DSTGROUP")
        d1, x1 = _bounded_batched(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(tb),
            jnp.asarray(mask), jnp.asarray(dead), interpret=True)
        np.testing.assert_array_equal(np.asarray(d4), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(x4), np.asarray(x1))

    def test_pack_fine_flags_bit_pattern(self):
        """int32 packing incl. bit 31 (INT32_MIN weight): all-set == -1,
        single bits land where the kernel's (flags >> (8c+k)) & 1 looks."""
        from scream_tpu.ops.nn_pallas import _pack_fine_flags

        allset = np.ones((1, 1, 8, 1, 4), np.int32)
        assert int(_pack_fine_flags(jnp.asarray(allset))[0, 0, 0]) == -1
        for k, c in ((0, 0), (7, 3), (3, 2), (7, 0), (0, 3)):
            one = np.zeros((1, 1, 8, 1, 4), np.int32)
            one[0, 0, k, 0, c] = 1
            got = int(_pack_fine_flags(jnp.asarray(one))[0, 0, 0])
            want = np.int32(np.uint32(1) << np.uint32(8 * c + k))
            assert got == want, (k, c, got, want)
