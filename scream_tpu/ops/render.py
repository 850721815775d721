"""Differentiable multi-view depth-image renderer, fully on-device.

TPU-native re-design of `/root/reference/models/render.py:8-73`
(``RegistrationRender``). The reference renders one (src_pred, tgt) pair at a
time on a hardcoded ``cuda:0`` with a Python loop over 64x64 pixel tiles and a
scipy rotation per view; here the whole thing is one jittable function,
batched over pairs, with views as a vmapped constant-matrix dimension and the
pixel grid streamed in tiles via ``lax.map`` so the points x pixels weight
matrix never exceeds ``N x tile`` in VMEM-resident working set.

Faithful math (reference ``render``/``forward``):
  * per-view rotation of the concatenated ``[src_pred; tgt]`` cloud — the six
    fixed views are Rz(0)Ry(b)Rx(c) for (b, c) in
    {(0,0), (pi/2,0), (pi,0), (3pi/2,0), (0,pi/2), (0,3pi/2)}
    (reference `:17-25,67`),
  * pixel intensity = inverse depth normalized over the *union* of both
    clouds (`:29-31`),
  * Gaussian splat weight ``exp(-d^2 * rho^2 / 2)`` between point xy and the
    normalized pixel grid ``((j,i) - w/2 + 0.5)/(w/2)`` (`:14-16,42-43`),
  * per-pixel **max** over src rows and tgt rows separately (`:46-50`),
  * output stacked 2 x w x w per view, normalized to [-1, 1] (`:59,70`).

Additions by design: a real batch dimension, validity masks (invalid points
contribute intensity 0 and are excluded from the depth min/max), and a guarded
depth range (the reference divides by zero on a single-depth cloud).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from scream_tpu.config import RenderConfig

_BIG = jnp.float32(3e38)


def _ry(b):
    c, s = math.cos(b), math.sin(b)
    return [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]


def _rx(c_):
    c, s = math.cos(c_), math.sin(c_)
    return [[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]]


def view_matrices(multi_view: bool = True, view_mode: Optional[str] = None) -> jnp.ndarray:
    """The fixed view rotations ``(V, 3, 3)``.

    ``view_mode``: "multi" — identity, three more quarter-turns about y, and
    +/- quarter-turns about x (reference `/root/reference/models/render.py:17-25`);
    "identity" — the single default view (`:24-25`); "back" — the single
    Ry(pi) view the KITTI GAN variant switches to
    (`/root/reference/train_kitti.py:47-48`). ``multi_view`` is the legacy
    boolean (multi vs identity) used when ``view_mode`` is None.
    """
    if view_mode is None:
        view_mode = "multi" if multi_view else "identity"
    if view_mode == "identity":
        return jnp.eye(3, dtype=jnp.float32)[None]
    if view_mode == "back":
        return jnp.asarray([_ry(math.pi)], dtype=jnp.float32)
    if view_mode != "multi":
        raise ValueError(f"unknown view_mode {view_mode!r}")

    half = math.pi / 2.0
    mats = [
        _ry(0.0), _ry(half), _ry(2 * half), _ry(3 * half),
        _rx(half), _rx(3 * half),
    ]
    return jnp.asarray(mats, dtype=jnp.float32)


def pixel_grid(w: int) -> jnp.ndarray:
    """Normalized ``(w*w, 2)`` pixel-center grid.

    Row-major pixel k has image coords (row i = k // w, col j = k % w) and
    compares (col, row) against point (x, y), normalized to ~[-1, 1]
    (reference `/root/reference/models/render.py:14-16`).
    """
    k = jnp.arange(w * w)
    i = (k // w).astype(jnp.float32)
    j = (k % w).astype(jnp.float32)
    xy = jnp.stack([j, i], axis=-1)
    return (xy - w // 2 + 0.5) / (w // 2)


def _render_single_view(
    pts: jnp.ndarray,      # (N_total, 3) rotated points, src rows then tgt rows
    val_src: jnp.ndarray,  # (N_total,) intensity, zeroed outside src-valid rows
    val_tgt: jnp.ndarray,  # (N_total,) intensity, zeroed outside tgt-valid rows
    pix: jnp.ndarray,      # (n_tiles, tile, 2)
    rho: float,
) -> jnp.ndarray:
    """Splat one rotated cloud into a ``(2, w*w)`` image pair."""
    xy = pts[:, :2]
    sq_pts = jnp.sum(xy * xy, axis=-1)  # (N,)

    def one_tile(pix_tile):
        # Squared distance point<->pixel via the matmul expansion (MXU, K=2).
        cross = jnp.einsum(
            "nd,pd->np", xy, pix_tile, preferred_element_type=jnp.float32
        )
        d2 = sq_pts[:, None] + jnp.sum(pix_tile * pix_tile, axis=-1)[None, :] - 2.0 * cross
        wgt = jnp.exp(d2 * jnp.float32(-0.5 * rho * rho))
        img_s = jnp.max(val_src[:, None] * wgt, axis=0)
        img_t = jnp.max(val_tgt[:, None] * wgt, axis=0)
        return jnp.stack([img_s, img_t])  # (2, tile)

    tiles = jax.lax.map(one_tile, pix)  # (n_tiles, 2, tile)
    return jnp.moveaxis(tiles, 1, 0).reshape(2, -1)


@partial(jax.jit, static_argnames=("rho", "width", "multi_view", "tile",
                                   "use_pallas", "view_mode"))
def render_depth_images(
    src_pred: jnp.ndarray,
    tgt: jnp.ndarray,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    rho: float = 24.0,
    width: int = 64,
    multi_view: bool = True,
    tile: int = 4096,
    use_pallas: Optional[bool] = None,
    view_mode: Optional[str] = None,
) -> jnp.ndarray:
    """Render ``(B, V, 2, width, width)`` depth images in [-1, 1].

    Args:
      src_pred: ``(B, N, 3)`` predicted source points (target frame).
      tgt: ``(B, M, 3)`` target points.
      src_mask / tgt_mask: boolean validity masks ``(B, N)`` / ``(B, M)``.
      rho: Gaussian splat sharpness (reference default 24; KITTI GAN uses 48
        with a single view, `/root/reference/train_kitti.py:45-48`).
      width: square image width (64; the commented hi-res variant uses 128).
      multi_view: six fixed views vs. identity only.
      tile: pixel-tile size for the streamed ``N x tile`` weight matrix
        (XLA path only).
      use_pallas: route the splat through the fused Pallas kernel with its
        custom VJP (`scream_tpu/ops/splat_pallas.py`); default auto — on for
        the TPU backend. Both paths produce identical images and identical
        (argmax-subgradient) gradients.
    """
    B, n = src_pred.shape[0], src_pred.shape[1]
    if src_mask is None:
        src_mask = jnp.ones((B, n), dtype=bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones((B, tgt.shape[1]), dtype=bool)

    views = view_matrices(multi_view, view_mode)  # (V, 3, 3)
    n_pix = width * width
    tile = min(tile, n_pix)
    assert n_pix % tile == 0, "width^2 must divide into whole pixel tiles"
    pix = pixel_grid(width).reshape(n_pix // tile, tile, 2)

    pts = jnp.concatenate([src_pred, tgt], axis=1).astype(jnp.float32)  # (B, N+M, 3)
    mask = jnp.concatenate([src_mask, tgt_mask], axis=1)
    src_rows = jnp.arange(pts.shape[1]) < n
    m_src = mask & src_rows[None, :]
    m_tgt = mask & ~src_rows[None, :]

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    V = views.shape[0]

    if use_pallas:
        from scream_tpu.ops.splat_pallas import max_splat

        # Rotate every (pair, view) up front, flatten (B, V) into one batch
        # axis and vmap the kernel once — nested vmap over pallas_call
        # produces batch-dim layouts the TPU lowering rejects.
        rp = jnp.einsum("bnc,vdc->bvnd", pts, views)  # (B, V, N, 3)
        depth = rp[..., 2]
        # The normalization bounds are constants in the reference (fetched
        # with .item(), `/root/reference/models/render.py:30-31`); detach so
        # the extremal points get no extra gradient through dmin/dmax.
        dmin = jax.lax.stop_gradient(jnp.min(
            jnp.where(mask[:, None, :], depth, _BIG), axis=-1, keepdims=True))
        dmax = jax.lax.stop_gradient(jnp.max(
            jnp.where(mask[:, None, :], depth, -_BIG), axis=-1, keepdims=True))
        pix_val = 1.0 - (depth - dmin) / jnp.maximum(dmax - dmin, 1e-8)
        vals = jnp.stack(
            [jnp.where(m_src[:, None, :], pix_val, 0.0),
             jnp.where(m_tgt[:, None, :], pix_val, 0.0)], axis=-1,
        )  # (B, V, N, 2)
        n_total = pts.shape[1]
        xy_flat = rp[..., :2].reshape(B * V, n_total, 2)
        vals_flat = vals.reshape(B * V, n_total, 2)
        imgs = jax.vmap(lambda a, b: max_splat(a, b, rho, width))(xy_flat, vals_flat)
        imgs = (imgs - 0.5) / 0.5
        return imgs.reshape(B, V, 2, width, width)

    def per_pair(p, m, ms, mt):
        def per_view(R):
            rp = p @ R.T
            depth = rp[:, 2]
            # Detached bounds, as in the Pallas path (reference uses .item()).
            dmin = jax.lax.stop_gradient(jnp.min(jnp.where(m, depth, _BIG)))
            dmax = jax.lax.stop_gradient(jnp.max(jnp.where(m, depth, -_BIG)))
            rng = jnp.maximum(dmax - dmin, 1e-8)
            pix_val = 1.0 - (depth - dmin) / rng
            val_src = jnp.where(ms, pix_val, 0.0)
            val_tgt = jnp.where(mt, pix_val, 0.0)
            img = _render_single_view(rp, val_src, val_tgt, pix, rho)
            return (img - 0.5) / 0.5
        return jax.vmap(per_view)(views)  # (V, 2, w*w)

    imgs = jax.vmap(per_pair)(pts, mask, m_src, m_tgt)
    return imgs.reshape(B, V, 2, width, width)


def render_from_config(
    src_pred: jnp.ndarray,
    tgt: jnp.ndarray,
    cfg: RenderConfig,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    return render_depth_images(
        src_pred, tgt, src_mask, tgt_mask,
        rho=cfg.rho, width=cfg.width, multi_view=cfg.multi_view,
        view_mode=cfg.view_mode, use_pallas=cfg.use_pallas,
    )
