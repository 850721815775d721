"""Fused nearest-neighbor search as a Pallas TPU kernel.

The NN search is the framework's hottest op: the pose solve does one per pair
(`scream_tpu/pipeline/register.py`) and ICP does one per iteration
(`scream_tpu/geometry/icp.py` — 30+ per pair). The XLA formulation
materializes the N x M squared-distance matrix in HBM and then min-reduces
it, so a 4096 x 4096 pair moves ~67 MB per search twice; this kernel keeps
each distance tile in VMEM and accumulates a running (min, argmin) into a
tile-sized output, reducing HBM traffic to the two point arrays plus N
outputs.

Layout: distances are computed *transposed* — dst rows in sublanes, src rows
in lanes — so the per-src-point reduction runs over sublanes and lands in the
lane dimension; the (TILE_N,) lane vector reshapes to an (8, 128) output
block (TPU block shapes need the last two dims to be multiples of (8, 128)).
The argmin uses the where-iota trick (first index attaining the min), which
reproduces ``jnp.argmin`` tie-breaking.

Grid: ``(N / TILE_N, M / TILE_M)``; the output block depends only on the
src-tile index, so it is revisited across the sequential dst-tile dimension —
the standard TPU reduction pattern.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plain Python scalars: jnp constants would be captured tracers in the kernel.
_BIG = 3.0e38
_BIG_IDX = 2**30

# The VMEM budget for the (TILE_M, TILE_N) fp32 distance tile. Grid-step
# overhead dominates this kernel (the tiles are compute-trivial), so tiles are
# sized as large as VMEM allows to minimize the number of steps.
_TILE_BYTES = 8 * 1024 * 1024


def _pick_tiles(n_pad: int, m_pad: int):
    tile_n = min(n_pad, 2048)
    tile_m = min(m_pad, max(512, _TILE_BYTES // (4 * tile_n)))
    return tile_n, tile_m


def _nn_kernel(tile_m: int, src_ref, dst_ref, dst_mask_ref, min_ref, arg_ref):
    j = pl.program_id(1)

    src = src_ref[...]  # (TILE_N, 3)
    dst = dst_ref[...]  # (TILE_M, 3)
    mask = dst_mask_ref[...]  # (TILE_M, 1) float32, 1.0 = valid

    # d2[m, n] = |dst_m|^2 + |src_n|^2 - 2 dst_m . src_n   (TILE_M, TILE_N)
    cross = jax.lax.dot_general(
        dst, src,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_sq = jnp.sum(dst * dst, axis=1, keepdims=True)  # (TILE_M, 1)
    s_sq = jnp.sum(src * src, axis=1)[None, :]  # (1, TILE_N)
    d2 = jnp.maximum(d_sq + s_sq - 2.0 * cross, 0.0)
    d2 = jnp.where(mask > 0.5, d2, _BIG)

    local_min_lanes = jnp.min(d2, axis=0, keepdims=True)  # (1, TILE_N)
    rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + j * tile_m
    local_arg_lanes = jnp.min(
        jnp.where(d2 <= local_min_lanes, rows, _BIG_IDX), axis=0, keepdims=True
    )  # (1, TILE_N)

    tile_n = src.shape[0]
    local_min = local_min_lanes.reshape(1, tile_n // 128, 128)
    local_arg = local_arg_lanes.reshape(1, tile_n // 128, 128)

    @pl.when(j == 0)
    def _():
        min_ref[...] = local_min
        arg_ref[...] = local_arg

    @pl.when(j > 0)
    def _():
        prev_min = min_ref[...]
        prev_arg = arg_ref[...]
        better = local_min < prev_min
        min_ref[...] = jnp.where(better, local_min, prev_min)
        arg_ref[...] = jnp.where(better, local_arg, prev_arg)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbor_pallas(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-src-point ``(min_sq_dist, argmin_index)`` into dst.

    Unbatched ``(N, 3)`` / ``(M, 3)``; use ``jax.vmap`` for batches. Invalid
    dst points never win. Identical results to the XLA path
    (``masked_square_distance`` + min/argmin), tested both ways.
    """
    n, m = src.shape[0], dst.shape[0]
    n_pad = _round_up(n, 1024)
    m_pad = _round_up(m, 512)
    tile_n, tile_m = _pick_tiles(n_pad, m_pad)
    n_pad = _round_up(n_pad, tile_n)
    m_pad = _round_up(m_pad, tile_m)
    sub = tile_n // 128

    src_p = jnp.pad(src.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    dst_p = jnp.pad(dst.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    if dst_mask is None:
        dst_mask = jnp.ones((m,), dtype=bool)
    mask_p = jnp.pad(dst_mask, (0, m_pad - m)).astype(jnp.float32)[:, None]

    grid = (n_pad // tile_n, m_pad // tile_m)
    min_out, arg_out = pl.pallas_call(
        partial(_nn_kernel, tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], sub, 128), jnp.int32),
        ],
        interpret=interpret,
    )(src_p, dst_p, mask_p)

    return min_out.reshape(-1)[:n], arg_out.reshape(-1)[:n]


def nearest_neighbor_auto(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend dispatch: the Pallas kernel on TPU, the XLA path elsewhere.

    Batched ``(B, N, 3)`` / ``(B, M, 3)`` with optional ``(B, M)`` masks.
    """
    if jax.default_backend() == "tpu":
        if dst_mask is None:
            return jax.vmap(lambda s, d: nearest_neighbor_pallas(s, d))(src, dst)
        return jax.vmap(nearest_neighbor_pallas)(src, dst, dst_mask)

    from scream_tpu.geometry.pairwise import masked_square_distance

    d2 = masked_square_distance(src, dst, dst_mask=dst_mask)
    return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1)
