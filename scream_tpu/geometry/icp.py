"""Point-to-point ICP as a jittable fixed-iteration refinement loop.

TPU-native replacement for Open3D's C++ ``registration_icp`` with
``TransformationEstimationPointToPoint``, which the reference uses as its
accuracy safety net after Kabsch (`/root/reference/evaluate_3d_match.py:109-114`,
`/root/reference/evaluate_kitti.py:64-70`) and for KITTI GT generation
(`/root/reference/datasets/kitti.py:116-118`).

Each iteration (inside one `lax.while_loop`, fully on-device):
  1. transform src by the current estimate,
  2. masked NN search in tgt; correspondences valid iff within
     ``max_correspondence_distance``,
  3. weighted Kabsch over the valid correspondences -> new absolute estimate.

Termination mirrors Open3D's ``ICPConvergenceCriteria``: stop when both the
relative fitness and relative inlier-RMSE change drop below 1e-6, or after
``max_iteration`` rounds (Open3D default 30; the reference's KITTI eval sets
1000).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from scream_tpu.geometry.kabsch import kabsch


def _use_bounded_nn(force_xla: bool) -> bool:
    """Single routing predicate for the threshold-bounded NN kernel, shared
    by :func:`_nn` (which picks the kernel) and :func:`registration_icp`
    (which pre-sorts the clouds the kernel's tile pruning relies on) — the
    two sites must agree or ICP either pays a useless sort or feeds the
    bounded kernel incoherent tiles (correct but ~0% pruning).

    Evaluated at TRACE time inside jitted callers: flipping
    ``SCREAM_NN_BOUNDED`` after the first ``registration_icp`` call in a
    process has no effect on already-compiled shapes (the jit cache keeps
    the traced routing); set it before the first call.
    """
    import os

    return (
        jax.default_backend() == "tpu"
        and not force_xla
        and os.environ.get("SCREAM_NN_BOUNDED") != "0"
    )


def _nn(src_t, tgt, tgt_mask, thresh_sq=None, force_xla=False, dead=None):
    """Single-pass fused NN returning winner coordinates — the Pallas kernel
    on TPU (one VMEM-resident pass, no HBM distance matrix, no index gather),
    the XLA path elsewhere. Called on unbatched clouds so that a caller's
    vmap (ICP over a pair batch) maps the ``pallas_call`` exactly once —
    nested vmaps over Pallas kernels produce batch-dim layouts the TPU
    lowering rejects.

    ``thresh_sq``: the ICP inlier threshold. When given (the ICP hot loop),
    the threshold-BOUNDED kernel is used: exact for every point within the
    threshold, tile-pruned elsewhere — correspondences beyond the threshold
    carry zero weight and are excluded from fitness/RMSE, so the pruning is
    protocol-exact (see ``ops.nn_pallas.nearest_neighbor_bounded``).

    ``dead``: bool scalar; True force-skips every tile of the bounded kernel
    (the lane's result is being discarded by a vmapped while_loop select —
    see ``nearest_neighbor_bounded``). Ignored on the other paths: their
    output is equally discarded, it just costs full price.
    """
    if jax.default_backend() == "tpu" and not force_xla:
        if thresh_sq is not None and _use_bounded_nn(force_xla):
            from scream_tpu.ops.nn_pallas import nearest_neighbor_bounded

            return nearest_neighbor_bounded(src_t, tgt, thresh_sq, tgt_mask,
                                            dead=dead)
        from scream_tpu.ops.nn_pallas import nearest_neighbor_pallas

        d, _, xyz = nearest_neighbor_pallas(src_t, tgt, tgt_mask)
        return d, xyz

    from scream_tpu.ops.nn_pallas import nearest_neighbor_full

    d, _, xyz = nearest_neighbor_full(src_t[None], tgt[None], tgt_mask[None],
                                      force_xla=force_xla)
    return d[0], xyz[0]


def _spatial_sort(pts, mask, axis_dir: Optional[jnp.ndarray] = None):
    """Sort points along one direction (masked rows last) — once per ICP call.

    The threshold-bounded NN kernel prunes (src-tile, dst-tile) pairs by
    bounding-box distance; that only bites when tiles are spatially compact.
    A single-direction sort is enough — it makes every tile a thin slab
    normal to that direction, which is what the box-gap test resolves (a
    full 3-key voxel lexsort costs 3 TPU sort passes for no extra pruning
    at tile granularity). All downstream consumers (Kabsch sums,
    fitness/RMSE, the returned transform) are permutation-invariant.

    ``axis_dir``: the direction (3,) whose projection is the sort key; None
    means the x-axis. THE DIRECTION MUST BE CHOSEN IN THE FRAME THE KERNEL
    SEES. The kernel tiles ``src @ T^T``, not ``src``: under a large init
    rotation an x-thin src slab becomes a diagonal sheet whose axis-aligned
    bounding box spans the whole cloud, and pruning collapses — measured
    57% live sub-slabs at the 3DMatch operating point vs 21% when src is
    sorted by its coordinate along the init-rotated axis
    (``src @ R_init[0]``, i.e. thin in x AFTER the transform; the
    translation shifts every key equally and cannot change the order).
    One sort before the loop still covers every iteration: ICP past a
    Kabsch init refines by a few degrees, which fattens the slabs
    negligibly. tgt never transforms, so it sorts by plain x.
    """
    key = pts[:, 0] if axis_dir is None else pts @ axis_dir
    key = jnp.where(mask, key, jnp.float32(3e38))
    order = jnp.argsort(key)
    return pts[order], mask[order]


class ICPResult(NamedTuple):
    transformation: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray  # scalar: inlier fraction of valid src points
    inlier_rmse: jnp.ndarray  # scalar
    iterations: jnp.ndarray  # scalar int


class _State(NamedTuple):
    # T_meas: the transform whose correspondences produced (fitness, rmse);
    # T_pending: the Kabsch update computed from those same correspondences.
    # Open3D measures AFTER each update and, on convergence, returns the
    # transform it just measured — carrying both lets the loop discard the
    # speculative extra update instead of returning it (exact parity with
    # RegistrationICP's break).
    T_meas: jnp.ndarray
    T_pending: jnp.ndarray
    fitness: jnp.ndarray
    rmse: jnp.ndarray
    prev_fitness: jnp.ndarray
    prev_rmse: jnp.ndarray
    it: jnp.ndarray


def _init_icp_state(init: jnp.ndarray) -> _State:
    T0 = init.astype(jnp.float32)
    return _State(
        T_meas=T0,
        T_pending=T0,
        fitness=jnp.float32(-1.0),
        rmse=jnp.float32(-1.0),
        prev_fitness=jnp.float32(-2.0),
        prev_rmse=jnp.float32(-2.0),
        it=jnp.int32(0),
    )


def _make_icp_fns(src, tgt, src_mask, tgt_mask, thresh_sq,
                  relative_fitness, relative_rmse, force_xla):
    """The per-iteration machinery shared by :func:`registration_icp` and
    the chunked batched driver (:func:`registration_icp_batched`): both must
    trace the SAME ops or the chunked path's trajectory diverges from the
    continuous loop's (they already compile as different XLA graphs, so
    reductions can differ at fp noise — don't add op-level divergence on
    top).

    Returns ``(step, converged, measure)`` closures over the (already
    sorted, float32) clouds.
    """
    n_valid_src = jnp.clip(jnp.sum(src_mask.astype(jnp.float32)), 1.0, None)

    def measure(T, dead=None):
        src_t = src @ T[:3, :3].T + T[:3, 3]
        nn_dist, corr_tgt = _nn(src_t, tgt, tgt_mask, thresh_sq=thresh_sq,
                                force_xla=force_xla, dead=dead)
        valid = (nn_dist < thresh_sq) & src_mask
        w = valid.astype(jnp.float32)
        n_inlier = jnp.sum(w)
        fitness = n_inlier / n_valid_src
        rmse = jnp.sqrt(jnp.sum(nn_dist * w) / jnp.clip(n_inlier, 1.0, None))
        return corr_tgt, w, n_inlier, fitness, rmse

    def step(T, dead=None):
        # ``dead``: this lane's while_loop cond is False, so the caller's
        # per-lane select discards everything computed here — skip the NN
        # tiles (the iteration's entire cost) instead of computing a result
        # nobody keeps. Only reaches the kernel on the bounded-NN path.
        corr_tgt, w, n_inlier, fitness, rmse = measure(T, dead=dead)
        # Absolute re-estimate from original src (point-to-point closed form).
        T_new = kabsch(src[None], corr_tgt[None], w[None])[0]
        # If no inliers, keep the current estimate.
        T_new = jnp.where(n_inlier > 0, T_new, T)
        return T_new, fitness, rmse

    def converged(s: _State):
        # STRICT <, matching Open3D's RegistrationICP break condition
        # (abs(backup.fitness - result.fitness) < relative_fitness_): a
        # delta exactly at the criterion keeps iterating.
        return (
            (jnp.abs(s.fitness - s.prev_fitness) < relative_fitness)
            & (jnp.abs(s.rmse - s.prev_rmse) < relative_rmse)
            & (s.it > 1)  # needs two measured transforms to compare
        )

    return step, converged, measure


@partial(jax.jit, static_argnames=("max_iteration", "force_xla"))
def registration_icp(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    max_correspondence_distance: jnp.ndarray | float,
    init: Optional[jnp.ndarray] = None,
    max_iteration: int = 30,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    force_xla: bool = False,
) -> ICPResult:
    """Refine an initial pose aligning ``src`` onto ``tgt``.

    Args:
      src, tgt: ``(N, 3)`` / ``(M, 3)`` point clouds (padded ok with masks).
      max_correspondence_distance: inlier threshold (Euclidean).
      init: initial ``(4, 4)`` transform (identity if None).
      max_iteration: static loop bound.

    Returns an :class:`ICPResult`; ``transformation`` maps src -> tgt frame.
    """
    if init is None:
        init = jnp.eye(4, dtype=jnp.float32)
    if src_mask is None:
        src_mask = jnp.ones(src.shape[:-1], dtype=bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt.shape[:-1], dtype=bool)

    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    thresh = jnp.asarray(max_correspondence_distance, jnp.float32)
    thresh_sq = thresh ** 2

    if _use_bounded_nn(force_xla):
        # Feed the bounded NN kernel spatially-coherent tiles IN THE FRAME
        # IT SEES: src is tiled after the per-iteration transform, so its
        # sort key is the projection onto the init-rotated x-axis (see
        # _spatial_sort).
        src, src_mask = _spatial_sort(src, src_mask,
                                      axis_dir=init[0, :3].astype(jnp.float32))
        tgt, tgt_mask = _spatial_sort(tgt, tgt_mask)

    step, _converged, measure = _make_icp_fns(
        src, tgt, src_mask, tgt_mask, thresh_sq,
        relative_fitness, relative_rmse, force_xla,
    )

    def cond(s: _State):
        return (s.it < max_iteration) & ~_converged(s)

    def body(s: _State):
        # One NN pass serves both the metrics at T_pending and the next
        # Kabsch update — Open3D's GetRegistrationResultAndCorrespondences +
        # ComputeTransformation per-iteration structure.
        # dead=~cond(s): unbatched, the loop never runs the body once cond is
        # False, so this is always False here; under vmap (the batched ICP)
        # the body DOES run for already-terminated lanes and the select
        # discards its output — the flag turns those discarded NN passes
        # into pure grid steps so converged lanes stop costing real work.
        T_new, fitness, rmse = step(s.T_pending, dead=~cond(s))
        return _State(s.T_pending, T_new, fitness, rmse, s.fitness, s.rmse,
                      s.it + 1)

    final = jax.lax.while_loop(cond, body, _init_icp_state(init))

    # Open3D's break fires right after measuring a transform: on early
    # convergence it returns that measured transform (final.T_meas here),
    # NOT the speculative extra update the same correspondences produced.
    # On max_iteration exhaustion every computed update stands (Open3D runs
    # `for i in range(max_iteration)` updates) -> T_pending.
    early = _converged(final)
    T_final = jnp.where(early, final.T_meas, final.T_pending)
    # Updates actually applied to the returned transform.
    iters = jnp.where(early, final.it - 1, final.it)

    # Final metrics at the returned transform.
    _, _, _, fitness, rmse = measure(T_final)
    return ICPResult(T_final, fitness, rmse, iters)


@partial(jax.jit, static_argnames=("force_xla",))
def _icp_chunk(src, tgt, thresh, state, boundary, max_iteration,
               src_mask, tgt_mask, relative_fitness, relative_rmse,
               force_xla=False):
    """Advance every lane of a batched ICP to ``it == boundary`` (or to
    convergence / ``max_iteration``, whichever comes first).

    ``boundary`` and ``max_iteration`` are dynamic scalars: one compile per
    lane-count shape serves every chunk of every budget. Clouds must already
    be float32 and (on the bounded-NN path) spatially sorted — the caller
    (:func:`registration_icp_batched`) does both once, not per chunk.

    Returns ``(state, done)`` where ``done[i]`` means lane ``i`` needs no
    further iterations.
    """
    thresh_sq = thresh ** 2

    def one(s_pts, t_pts, sm, tm, s):
        step, converged, _ = _make_icp_fns(
            s_pts, t_pts, sm, tm, thresh_sq,
            relative_fitness, relative_rmse, force_xla,
        )

        def cond(st: _State):
            return (st.it < boundary) & (st.it < max_iteration) & ~converged(st)

        def body(st: _State):
            # dead-lane skip: see registration_icp's body.
            T_new, fitness, rmse = step(st.T_pending, dead=~cond(st))
            return _State(st.T_pending, T_new, fitness, rmse, st.fitness,
                          st.rmse, st.it + 1)

        out = jax.lax.while_loop(cond, body, s)
        return out, converged(out) | (out.it >= max_iteration)

    return jax.vmap(one)(src, tgt, src_mask, tgt_mask, state)


@partial(jax.jit, static_argnames=("force_xla",))
def _icp_finalize(src, tgt, thresh, state, src_mask, tgt_mask,
                  relative_fitness, relative_rmse, force_xla=False):
    """Batched tail of :func:`registration_icp`: early-convergence select
    (T_meas vs T_pending — see the `_State` docstring) + final metrics."""
    thresh_sq = thresh ** 2

    def one(s_pts, t_pts, sm, tm, s):
        _, converged, measure = _make_icp_fns(
            s_pts, t_pts, sm, tm, thresh_sq,
            relative_fitness, relative_rmse, force_xla,
        )
        early = converged(s)
        T_final = jnp.where(early, s.T_meas, s.T_pending)
        iters = jnp.where(early, s.it - 1, s.it)
        _, _, _, fitness, rmse = measure(T_final)
        return ICPResult(T_final, fitness, rmse, iters)

    return jax.vmap(one)(src, tgt, src_mask, tgt_mask, state)


def _pow2_bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def registration_icp_batched(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    max_correspondence_distance,
    init: Optional[jnp.ndarray] = None,
    max_iteration: int = 30,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    force_xla: bool = False,
    chunk: Optional[int] = None,
) -> ICPResult:
    """Batched :func:`registration_icp` over ``(B, N, 3)`` lanes.

    ``chunk=None`` vmaps the continuous while_loop: every lane rides until
    the SLOWEST lane converges or exhausts ``max_iteration`` — at the KITTI
    protocol budget of 1000 (`/root/reference/evaluate_kitti.py:69`) one
    straggler drags the whole batch.

    ``chunk=K`` is the straggler mitigation: a host-driven loop advances all
    lanes K iterations at a time, retires lanes that converged, and compacts
    the survivors into the next power-of-two lane count (bounded compile
    set; padding duplicates lane 0 of the survivors). The carried
    convergence state (`_State`) preserves the continuous loop's iterate
    sequence — same step ops, same Open3D convergence checks, same
    T_meas/T_pending return select. The two paths compile as different XLA
    graphs, so a convergence delta landing within fp reduction noise of
    the 1e-6 criteria can cost one path a single extra iteration from the
    already-converged fixed point; the returned transform is unchanged
    (property-tested), so protocol outputs are untouched — only wasted
    converged-lane iterations are skipped.

    Returns a batched :class:`ICPResult` in input lane order.
    """
    import numpy as np

    B = src.shape[0]
    if init is None:
        init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    if src_mask is None:
        src_mask = jnp.ones(src.shape[:-1], dtype=bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt.shape[:-1], dtype=bool)

    if chunk is None:
        def one(s, t, sm, tm, T0):
            return registration_icp(
                s, t, max_correspondence_distance, init=T0,
                max_iteration=max_iteration, src_mask=sm, tgt_mask=tm,
                relative_fitness=relative_fitness, relative_rmse=relative_rmse,
                force_xla=force_xla,
            )

        return jax.vmap(one)(src, tgt, src_mask, tgt_mask, init)

    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")

    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    thresh = jnp.asarray(max_correspondence_distance, jnp.float32)
    if _use_bounded_nn(force_xla):
        src, src_mask = jax.vmap(_spatial_sort)(
            src, src_mask, jnp.asarray(init, jnp.float32)[:, 0, :3])
        tgt, tgt_mask = jax.vmap(lambda p, m: _spatial_sort(p, m))(
            tgt, tgt_mask)

    rf = jnp.float32(relative_fitness)
    rr = jnp.float32(relative_rmse)
    max_it = jnp.int32(max_iteration)

    state = jax.vmap(_init_icp_state)(init)
    # Host bookkeeping: which ORIGINAL lanes each device lane holds. Device
    # arrays stay padded to a power-of-two lane count; `lanes` tracks the
    # real prefix (padding lanes are duplicates whose results are dropped).
    lanes = np.arange(B)
    a_src, a_tgt, a_sm, a_tm = src, tgt, src_mask, tgt_mask
    out_T = np.zeros((B, 4, 4), np.float32)
    out_fit = np.zeros((B,), np.float32)
    out_rmse = np.zeros((B,), np.float32)
    out_it = np.zeros((B,), np.int32)

    def _gather(idx_padded):
        sel = jnp.asarray(idx_padded)
        return tuple(jnp.take(x, sel, axis=0)
                     for x in (a_src, a_tgt, a_sm, a_tm)) + (
            jax.tree.map(lambda x: jnp.take(x, sel, axis=0), state),)

    boundary = 0
    while len(lanes):
        boundary = min(boundary + chunk, max_iteration)
        state, done = _icp_chunk(
            a_src, a_tgt, thresh, state, jnp.int32(boundary), max_it,
            a_sm, a_tm, rf, rr, force_xla=force_xla,
        )
        done_h = np.array(done[: len(lanes)])  # copy: np.asarray views are read-only
        if boundary >= max_iteration:
            done_h[:] = True  # budget exhausted: finalize everything
        if not done_h.any():
            continue
        ret = np.flatnonzero(done_h)  # device-lane indices retiring now
        keep = np.flatnonzero(~done_h)
        pad_r = np.concatenate(
            [ret, np.repeat(ret[:1], _pow2_bucket(len(ret)) - len(ret))])
        r_src, r_tgt, r_sm, r_tm, r_state = _gather(pad_r)
        res = _icp_finalize(r_src, r_tgt, thresh, r_state, r_sm, r_tm,
                            rf, rr, force_xla=force_xla)
        dst = lanes[ret]
        out_T[dst] = np.asarray(res.transformation)[: len(ret)]
        out_fit[dst] = np.asarray(res.fitness)[: len(ret)]
        out_rmse[dst] = np.asarray(res.inlier_rmse)[: len(ret)]
        out_it[dst] = np.asarray(res.iterations)[: len(ret)]
        lanes = lanes[keep]
        if len(lanes):
            pad_k = np.concatenate(
                [keep, np.repeat(keep[:1], _pow2_bucket(len(keep)) - len(keep))])
            a_src, a_tgt, a_sm, a_tm, state = _gather(pad_k)

    return ICPResult(jnp.asarray(out_T), jnp.asarray(out_fit),
                     jnp.asarray(out_rmse), jnp.asarray(out_it))


def icp_refine_if_better(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    init_T: jnp.ndarray,
    gt_T: jnp.ndarray,
    max_correspondence_distance,
    max_iteration: int = 30,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    force_xla: bool = False,
):
    """ICP refinement kept only if RE *and* TE both improve vs ground truth.

    Mirrors the reference's acceptance rule
    (`/root/reference/evaluate_3d_match.py:116-119`). Returns
    ``(T, re_deg, te)``.
    """
    from scream_tpu.geometry.metrics import transformation_error

    re0, te0 = transformation_error(init_T, gt_T)
    result = registration_icp(
        src, tgt, max_correspondence_distance, init=init_T,
        max_iteration=max_iteration, src_mask=src_mask, tgt_mask=tgt_mask,
        force_xla=force_xla,
    )
    re1, te1 = transformation_error(result.transformation, gt_T)
    better = (re1 <= re0) & (te1 <= te0)
    T = jnp.where(better, result.transformation, init_T)
    re = jnp.where(better, re1, re0)
    te = jnp.where(better, te1, te0)
    return T, re, te
