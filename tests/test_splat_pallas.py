"""Pallas max-splat kernel vs the XLA renderer: images and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scream_tpu.ops.render import render_depth_images
from scream_tpu.ops.splat_pallas import max_splat


class TestSplatForward:
    def test_matches_xla_renderer(self, rng):
        src = jnp.asarray(rng.uniform(-0.8, 0.8, (40, 3)), jnp.float32)[None]
        tgt = jnp.asarray(rng.uniform(-0.8, 0.8, (50, 3)), jnp.float32)[None]
        a = render_depth_images(src, tgt, rho=6.0, width=16, multi_view=True,
                                tile=256, use_pallas=False)
        # interpret=True can't thread through render's static args, so call
        # the kernel directly on the same per-view inputs instead: check the
        # identity view.
        pts = jnp.concatenate([src[0], tgt[0]], axis=0)
        depth = pts[:, 2]
        pix_val = 1.0 - (depth - depth.min()) / (depth.max() - depth.min())
        val_src = jnp.where(jnp.arange(90) < 40, pix_val, 0.0)
        val_tgt = jnp.where(jnp.arange(90) >= 40, pix_val, 0.0)
        img = max_splat(pts[:, :2], jnp.stack([val_src, val_tgt], -1), 6.0, 16,
                        True)
        img = (img - 0.5) / 0.5
        np.testing.assert_allclose(
            np.asarray(img.reshape(2, 16, 16)), np.asarray(a[0, 0]), atol=2e-5
        )

    def test_masked_points_dont_contribute(self, rng):
        xy = jnp.asarray(rng.uniform(-1, 1, (30, 2)), jnp.float32)
        vals = jnp.ones((30, 2), jnp.float32)
        vals_masked = vals.at[10:].set(0.0)
        img_full = max_splat(xy, vals, 4.0, 16, True)
        img_masked = max_splat(xy[:10], vals[:10], 4.0, 16, True)
        np.testing.assert_allclose(
            np.asarray(max_splat(xy, vals_masked, 4.0, 16, True)),
            np.asarray(img_masked), atol=1e-6,
        )
        assert not np.allclose(np.asarray(img_full), np.asarray(img_masked))


class TestSplatGradients:
    def _setup(self, rng, n=24, w=8):
        xy = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 2)), jnp.float32)
        vals = jnp.asarray(rng.uniform(0.1, 1.0, (n, 2)), jnp.float32)
        return xy, vals, w

    def test_grad_matches_xla_subgradient(self, rng):
        """Pallas VJP == XLA max-reduction subgradient on the same function."""
        xy, vals, w = self._setup(rng)
        rho = 4.0

        def xla_splat(xy, vals):
            from scream_tpu.ops.render import pixel_grid

            pix = pixel_grid(w)
            d2 = jnp.sum((xy[:, None, :] - pix[None]) ** 2, axis=-1)
            wgt = jnp.exp(-0.5 * rho * rho * d2)
            return jnp.stack(
                [jnp.max(vals[:, c:c + 1] * wgt, axis=0) for c in (0, 1)]
            )

        def loss_pallas(xy, vals):
            return jnp.sum(max_splat(xy, vals, rho, w, True) ** 2)

        def loss_xla(xy, vals):
            return jnp.sum(xla_splat(xy, vals) ** 2)

        np.testing.assert_allclose(
            float(loss_pallas(xy, vals)), float(loss_xla(xy, vals)), rtol=1e-5
        )
        g1 = jax.grad(loss_pallas, argnums=(0, 1))(xy, vals)
        g2 = jax.grad(loss_xla, argnums=(0, 1))(xy, vals)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)

    def test_finite_difference(self, rng):
        xy, vals, w = self._setup(rng, n=8, w=8)
        rho = 3.0

        def loss(v):
            return jnp.sum(max_splat(xy, v, rho, w, True))

        g = jax.grad(loss)(vals)
        eps = 1e-3
        for i in (0, 3):
            for c in (0, 1):
                vp = vals.at[i, c].add(eps)
                vm = vals.at[i, c].add(-eps)
                fd = (float(loss(vp)) - float(loss(vm))) / (2 * eps)
                assert abs(fd - float(g[i, c])) < 5e-2, (i, c, fd, float(g[i, c]))


class TestRendererEndToEnd:
    def test_render_pallas_path_on_cpu_interpreter(self, rng):
        """use_pallas=True works off-TPU only via interpret; here we just
        confirm the auto dispatch keeps the XLA path on CPU."""
        src = jnp.asarray(rng.uniform(-1, 1, (16, 3)), jnp.float32)[None]
        imgs = render_depth_images(src, src, rho=6.0, width=16, multi_view=False,
                                   tile=256)
        assert imgs.shape == (1, 1, 2, 16, 16)
