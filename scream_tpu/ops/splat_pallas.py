"""Fused Gaussian max-splat as a Pallas TPU kernel with a custom VJP.

The depth-image renderer's hot op (`scream_tpu/ops/render.py`): for every
pixel, the maximum over points of ``val_i * exp(-|xy_i - pix_p|^2 rho^2/2)``,
separately for the src and tgt channels. The reference tiles this on the GPU
with a Python loop (`/root/reference/models/render.py:33-50`); the XLA port
streams pixel tiles but still materializes N x tile weight matrices per view.

This kernel keeps each (points x pixels) tile in VMEM and accumulates a
running (max, argmax) into revisited per-pixel output blocks — the same
reduction layout as the NN kernel (`scream_tpu/ops/nn_pallas.py`), with
points in sublanes and pixels in lanes.

The max has a one-point subgradient, so the backward pass needs no kernel:
the forward's argmax indices route the pixel cotangent to its winning point
with one ``segment_sum`` over w^2 pixels (O(w^2), independent of N). The
gradients match the XLA max-reduction subgradient exactly (both pick the
argmax).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_X = 1024  # pixels per block -> (8, 128) output blocks
TILE_P = 1024  # points per block
_BIG_IDX = 2**30


def _splat_kernel(rho_sq_half: float, tile_p: int,
                  xy_ref, vals_ref, pix_ref, img_ref, arg_ref):
    j = pl.program_id(1)

    xy = xy_ref[...]  # (TILE_P, 2)
    vals = vals_ref[...]  # (TILE_P, 2) channel values (src, tgt)
    pix = pix_ref[...]  # (TILE_X, 2)

    cross = jax.lax.dot_general(
        xy, pix, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_P, TILE_X)
    p_sq = jnp.sum(xy * xy, axis=1, keepdims=True)
    x_sq = jnp.sum(pix * pix, axis=1)[None, :]
    d2 = jnp.maximum(p_sq + x_sq - 2.0 * cross, 0.0)
    wgt = jnp.exp(d2 * (-rho_sq_half))  # exp(-d^2 * rho^2 / 2)

    rows = jax.lax.broadcasted_iota(jnp.int32, wgt.shape, 0) + j * tile_p

    def channel(c):
        contrib = vals[:, c:c + 1] * wgt  # (TILE_P, TILE_X)
        m = jnp.max(contrib, axis=0, keepdims=True)  # (1, TILE_X)
        a = jnp.min(jnp.where(contrib >= m, rows, _BIG_IDX), axis=0,
                    keepdims=True)
        return m, a

    m0, a0 = channel(0)
    m1, a1 = channel(1)
    sub = m0.shape[1] // 128
    local_img = jnp.concatenate([m0, m1], axis=0).reshape(1, 2, sub, 128)
    local_arg = jnp.concatenate([a0, a1], axis=0).reshape(1, 2, sub, 128)

    @pl.when(j == 0)
    def _():
        img_ref[...] = local_img
        arg_ref[...] = local_arg

    @pl.when(j > 0)
    def _():
        prev_img = img_ref[...]
        prev_arg = arg_ref[...]
        better = local_img > prev_img
        img_ref[...] = jnp.where(better, local_img, prev_img)
        arg_ref[...] = jnp.where(better, local_arg, prev_arg)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pixel_grid(width: int) -> jnp.ndarray:
    from scream_tpu.ops.render import pixel_grid

    return pixel_grid(width)


@partial(jax.jit, static_argnames=("rho", "width", "interpret"))
def _splat_forward(
    xy: jnp.ndarray, vals: jnp.ndarray, rho: float, width: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward: ``(imgs (2, w*w), args (2, w*w))`` for one rotated cloud."""
    n = xy.shape[0]
    n_pix = width * width
    tile_x = min(TILE_X, _round_up(n_pix, 128))
    n_pad = _round_up(n, TILE_P)
    pix_pad = _round_up(n_pix, tile_x)
    sub = tile_x // 128

    xy_p = jnp.pad(xy.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    vals_p = jnp.pad(vals.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    pix = jnp.pad(_pixel_grid(width), ((0, pix_pad - n_pix), (0, 0)))

    grid = (pix_pad // tile_x, n_pad // TILE_P)
    img, arg = pl.pallas_call(
        partial(_splat_kernel, 0.5 * rho * rho, TILE_P),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_P, 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_x, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, sub, 128), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, sub, 128), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], 2, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 2, sub, 128), jnp.int32),
        ],
        interpret=interpret,
    )(xy_p, vals_p, pix)

    img = jnp.moveaxis(img, 1, 0).reshape(2, -1)[:, :n_pix]
    arg = jnp.moveaxis(arg, 1, 0).reshape(2, -1)[:, :n_pix]
    return img, arg


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def max_splat(xy, vals, rho: float, width: int, interpret: bool = False):
    """Differentiable two-channel Gaussian max-splat: ``(2, width*width)``.

    ``xy``: (N, 2) point coordinates in the pixel frame; ``vals``: (N, 2)
    per-point intensities for the (src, tgt) channels — zero rows for points
    not in that channel or masked out.

    Contract: ``vals`` must be non-negative (the renderer's inverse-depth
    intensities are in [0, 1]). Rows padded to the point-tile size contribute
    zero, so an all-negative channel would lose its true maximum to a padded
    row and its cotangent would be dropped; pixels whose winner is a padded
    row are excluded from the backward scatter.
    """
    img, _ = _splat_forward(xy, vals, rho, width, interpret)
    return img


def _max_splat_fwd(xy, vals, rho, width, interpret):
    img, arg = _splat_forward(xy, vals, rho, width, interpret)
    return img, (xy, vals, arg)


def _max_splat_bwd(rho, width, interpret, res, g):
    xy, vals, arg = res
    n = xy.shape[0]
    pix = _pixel_grid(width)  # (w*w, 2)

    def one_channel(c):
        idx = arg[c]  # (w*w,) winning point per pixel
        # Pixels won by a padded row (idx >= n: no real point beat the
        # padded zero contribution) carry no gradient; zero them instead of
        # letting the gather clamp to row n-1.
        real = idx < n
        idx = jnp.where(real, idx, 0)
        xyi = xy[idx]
        d = xyi - pix
        wgt = jnp.exp(jnp.sum(d * d, axis=-1) * (-0.5 * rho * rho))
        gv = jnp.where(real, g[c] * wgt, 0.0)  # d(img)/d(val) = wgt
        vi = vals[idx, c]
        gxy = jnp.where(real, g[c] * vi * wgt * (-rho * rho), 0.0)[:, None] * d
        grad_val = jax.ops.segment_sum(gv, idx, num_segments=n)
        grad_xy = jax.ops.segment_sum(gxy, idx, num_segments=n)
        return grad_val, grad_xy

    gv0, gxy0 = one_channel(0)
    gv1, gxy1 = one_channel(1)
    return gxy0 + gxy1, jnp.stack([gv0, gv1], axis=-1)


max_splat.defvjp(_max_splat_fwd, _max_splat_bwd)
