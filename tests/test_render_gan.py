"""Renderer golden tests (vs. a numpy oracle of the reference formula) + GAN."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scream_tpu.models.gan import PatchDiscriminator, images_to_nhwc
from scream_tpu.models.losses import (
    adopt_weight,
    discriminator_hinge_loss,
    generator_hinge_loss,
)
from scream_tpu.ops.render import pixel_grid, render_depth_images, view_matrices


def _oracle_render(src, tgt, rho, w, views):
    """Numpy transliteration of the reference math
    (`/root/reference/models/render.py:29-73`)."""
    k = np.arange(w * w)
    pix = np.stack([(k % w).astype(np.float64), (k // w).astype(np.float64)], axis=1)
    pix = (pix - w // 2 + 0.5) / (w // 2)

    pts = np.concatenate([src, tgt], axis=0)
    out = []
    for R in views:
        x = pts @ np.asarray(R).T
        depth = x[:, 2]
        pix_val = 1.0 - (depth - depth.min()) / (depth.max() - depth.min())
        d2 = ((x[:, None, :2] - pix[None]) ** 2).sum(-1)
        wgt = np.exp(-d2 / 2 * rho**2)
        img_s = (pix_val[: len(src), None] * wgt[: len(src)]).max(0)
        img_t = (pix_val[len(src):, None] * wgt[len(src):]).max(0)
        img = np.stack([img_s.reshape(w, w), img_t.reshape(w, w)])
        out.append((img - 0.5) / 0.5)
    return np.stack(out)


class TestViewMatrices:
    def test_shapes_and_orthonormality(self):
        V = view_matrices(True)
        assert V.shape == (6, 3, 3)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("vij,vkj->vik", V, V)),
            np.broadcast_to(np.eye(3), (6, 3, 3)),
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(V[0]), np.eye(3), atol=1e-7)

    def test_quarter_turns(self):
        V = np.asarray(view_matrices(True))
        # Ry(pi/2) maps +z to +x; Rx(pi/2) maps +z to -y (scipy 'zyx' euler).
        np.testing.assert_allclose(V[1] @ [0, 0, 1], [1, 0, 0], atol=1e-7)
        np.testing.assert_allclose(V[4] @ [0, 0, 1], [0, -1, 0], atol=1e-7)

    def test_single_view(self):
        assert view_matrices(False).shape == (1, 3, 3)


class TestRenderer:
    @pytest.mark.parametrize("w,tile", [(16, 256), (16, 64)])
    def test_matches_oracle(self, rng, w, tile):
        src = rng.uniform(-0.8, 0.8, (30, 3))
        tgt = rng.uniform(-0.8, 0.8, (40, 3))
        got = render_depth_images(
            jnp.asarray(src, jnp.float32)[None],
            jnp.asarray(tgt, jnp.float32)[None],
            rho=6.0, width=w, multi_view=True, tile=tile,
        )
        want = _oracle_render(src, tgt, 6.0, w, np.asarray(view_matrices(True)))
        assert got.shape == (1, 6, 2, w, w)
        np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-5)

    def test_masked_matches_compact(self, rng):
        """Padded+masked clouds render identically to the compact clouds."""
        src = rng.uniform(-0.8, 0.8, (20, 3)).astype(np.float32)
        tgt = rng.uniform(-0.8, 0.8, (25, 3)).astype(np.float32)
        src_p = np.concatenate([src, np.full((12, 3), 7.0, np.float32)])
        tgt_p = np.concatenate([tgt, np.full((7, 3), -9.0, np.float32)])
        sm = np.arange(32) < 20
        tm = np.arange(32) < 25
        a = render_depth_images(
            jnp.asarray(src)[None], jnp.asarray(tgt)[None],
            rho=6.0, width=16, multi_view=True, tile=256,
        )
        b = render_depth_images(
            jnp.asarray(src_p)[None], jnp.asarray(tgt_p)[None],
            jnp.asarray(sm)[None], jnp.asarray(tm)[None],
            rho=6.0, width=16, multi_view=True, tile=256,
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_range_and_grads(self, rng):
        src = jnp.asarray(rng.uniform(-1, 1, (16, 3)), jnp.float32)[None]
        tgt = jnp.asarray(rng.uniform(-1, 1, (16, 3)), jnp.float32)[None]
        imgs = render_depth_images(src, tgt, rho=6.0, width=16, multi_view=False, tile=256)
        assert float(imgs.min()) >= -1.0 - 1e-5 and float(imgs.max()) <= 1.0 + 1e-5

        def loss(s):
            return jnp.sum(
                render_depth_images(s, tgt, rho=6.0, width=16, multi_view=False, tile=256)
            )

        g = jax.grad(loss)(src)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0.0

    def test_pixel_grid_bounds(self):
        pix = np.asarray(pixel_grid(64))
        assert pix.shape == (4096, 2)
        assert abs(pix).max() < 1.0


class TestDiscriminator:
    def test_patch_logit_map(self, rng):
        disc = PatchDiscriminator(input_nc=2)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 6, 2, 64, 64)), jnp.float32)
        x = images_to_nhwc(imgs)
        assert x.shape == (12, 64, 64, 2)
        variables = disc.init(jax.random.PRNGKey(0), x, train=False)
        logits, mutated = disc.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        # 64 -> 32 -> 16 -> 8 (stride 2) -> 7 -> 6 (two k4/s1/p1 convs).
        assert logits.shape == (12, 6, 6, 1)
        assert "batch_stats" in mutated

    def test_losses(self):
        real = jnp.asarray([2.0, 0.5])
        fake = jnp.asarray([-2.0, 0.5])
        assert float(generator_hinge_loss(fake)) == pytest.approx(0.75)
        # relu(1-2)=0, relu(1-0.5)=0.5 -> real term .25; relu(1-2)=0, relu(1.5)=1.5 -> fake .75
        assert float(discriminator_hinge_loss(real, fake)) == pytest.approx(0.5 * (0.25 + 0.75))
        assert float(adopt_weight(jnp.float32(0.1), jnp.int32(5), threshold=10)) == 0.0
        assert float(adopt_weight(jnp.float32(0.1), jnp.int32(15), threshold=10)) == pytest.approx(0.1)


class TestViewModes:
    def test_back_view_is_ry_pi(self):
        V = np.asarray(view_matrices(view_mode="back"))
        assert V.shape == (1, 3, 3)
        # Ry(pi): +z -> -z, +x -> -x
        np.testing.assert_allclose(V[0] @ [0, 0, 1], [0, 0, -1], atol=1e-7)
        np.testing.assert_allclose(V[0] @ [1, 0, 0], [-1, 0, 0], atol=1e-7)

    def test_kitti_gan_preset(self):
        from scream_tpu.config import kitti_gan_render_config

        cfg = kitti_gan_render_config()
        assert cfg.rho == 48.0 and cfg.view_mode == "back"

    def test_render_with_back_view(self, rng):
        src = jnp.asarray(rng.uniform(-1, 1, (10, 3)), jnp.float32)[None]
        imgs = render_depth_images(src, src, rho=6.0, width=16, tile=256,
                                   view_mode="back")
        assert imgs.shape == (1, 1, 2, 16, 16)

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            view_matrices(view_mode="sideways")


class TestAdaptiveWeight:
    def test_ratio_and_clip(self):
        from scream_tpu.models.losses import calculate_adaptive_weight

        nll = {"w": jnp.asarray([3.0, 4.0])}   # norm 5
        g = {"w": jnp.asarray([0.0, 2.0])}     # norm 2
        w = calculate_adaptive_weight(nll, g)
        assert float(w) == pytest.approx(2.5, rel=1e-3)
        # clipping
        tiny = {"w": jnp.asarray([1e-9])}
        w2 = calculate_adaptive_weight(nll, tiny)
        assert float(w2) <= 1e4


def test_disc_logit_fn_ignores_running_stats():
    """The generator's adversarial signal must use batch statistics: running
    averages in PatchGAN discriminators are unusable (see make_disc_logit_fn).
    Poisoned running stats must not change the logits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.models.gan import PatchDiscriminator, images_to_nhwc
    from scream_tpu.train.steps import make_disc_logit_fn

    disc = PatchDiscriminator(input_nc=2)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 2, 32, 32)) * 2 - 1
    variables = disc.init(jax.random.PRNGKey(1), images_to_nhwc(imgs), train=False)
    fn = make_disc_logit_fn(disc)

    clean = fn(variables, imgs)
    poisoned = {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map(
            lambda x: x + 1e6, variables["batch_stats"]
        ),
    }
    np.testing.assert_allclose(np.asarray(fn(poisoned, imgs)),
                               np.asarray(clean), atol=1e-6)


def test_render_from_config_forwards_view_mode():
    """The KITTI GAN preset's single *back* view must reach the renderer
    (render_from_config previously dropped view_mode/use_pallas)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import kitti_gan_render_config
    from scream_tpu.ops.render import render_depth_images, render_from_config

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((1, 64, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, 64, 3)), jnp.float32)
    cfg = kitti_gan_render_config()

    got = render_from_config(src, tgt, cfg)
    want = render_depth_images(src, tgt, rho=cfg.rho, width=cfg.width,
                               multi_view=False, view_mode="back",
                               use_pallas=cfg.use_pallas)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    identity = render_depth_images(src, tgt, rho=cfg.rho, width=cfg.width,
                                   multi_view=False, view_mode="identity",
                                   use_pallas=cfg.use_pallas)
    assert not np.allclose(np.asarray(got), np.asarray(identity))


def test_max_splat_backward_handles_padded_winners():
    """Pixels whose argmax is a padded row (everything real underflows to 0)
    must produce zero gradient, not a clamped gather."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.ops.splat_pallas import max_splat

    # 4 real points in one corner; most pixels see only underflowed-to-zero
    # contributions, tying with the padded rows.
    xy = jnp.asarray(np.full((4, 2), -0.9), jnp.float32)
    vals = jnp.asarray(np.full((4, 2), 0.5), jnp.float32)

    def loss(xy, vals):
        return jnp.sum(max_splat(xy, vals, rho=40.0, width=16, interpret=True))

    gxy, gv = jax.grad(loss, argnums=(0, 1))(xy, vals)
    assert bool(jnp.all(jnp.isfinite(gxy))) and bool(jnp.all(jnp.isfinite(gv)))
