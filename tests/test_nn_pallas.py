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
