"""Benchmark evaluation protocols: 3DMatch / 3DLoMatch / 3DZeroMatch, KITTI, OpenGF.

TPU-native re-design of the reference's eval drivers, preserving every
protocol detail (SURVEY.md §6):

  * `/root/reference/evaluate_3d_match.py:53-195` — registration recall is
    redwood RMSE < 0.2; per-scene statistics only count pairs with frame-index
    gap > 1 (PREDATOR protocol); per-scene RRE/RTE is the median
    (3DMatch/3DLoMatch) or mean (3DZeroMatch) over ALL counted pairs —
    successes plus RE=TE=0 appended for every failed counted pair
    (`:136-138`); the reported RRE/RTE/RR are means over the 8 test scenes.
    Thresholds: NN squared-distance 0.1 (match/lo) vs 0.2 +
    corr="src_pred" (zero); ICP distance 0.1.
  * `/root/reference/evaluate_kitti.py:20-111` — success iff RE <= 5 deg and
    TE <= 2 m; NN threshold 1.5, ICP threshold 1.0; eval items 124 and 142
    skipped.
  * `/root/reference/evaluate_open_gf.py:44-76` — chamfer / height MAE /
    height MSE, all x1000.

The inner loop is the batched on-device `register_batch`; this module only
accumulates host-side statistics.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from scream_tpu.config import EvalConfig
from scream_tpu.pipeline.register import register_batch, register_batch_requeue

# Scene display names in scene-index order
# (`/root/reference/evaluate_3d_match.py:61`).
SCENE_NAMES = [
    "Kitchen", "Home_1", "Home_2", "Hotel_1", "Hotel_2", "Hotel_3",
    "Study", "MIT_Lab",
]


class SkipDataset:
    """Dataset view that drops the given indices.

    The KITTI eval skips items 124 and 142
    (`/root/reference/evaluate_kitti.py:31-34`).
    """

    def __init__(self, dataset, skip: Sequence[int]):
        self._dataset = dataset
        self._index = [i for i in range(len(dataset)) if i not in set(skip)]

    def __len__(self):
        return len(self._index)

    def __getitem__(self, i):
        return self._dataset[self._index[i]]

    def _unwrap(self, i):
        """Size-probe delegation (see scream_tpu.data.loader._default_size_fn)."""
        return self._dataset, self._index[i]


def _to_device(batch, skip=("idx", "scene"), mesh=None):
    """Ship a batch to device, leaving host-only sidecars (consumed from the
    numpy batch for bookkeeping) off the device and out of the jit. Sharding
    policy shared with the trainers (`parallel.mesh.to_device_maybe_sharded`)."""
    from scream_tpu.parallel.mesh import to_device_maybe_sharded

    return to_device_maybe_sharded(batch, mesh, skip=skip)


def _replicate_params(params, mesh):
    if mesh is None or params is None:
        return params
    import jax

    from scream_tpu.parallel.mesh import replicated

    return jax.device_put(params, replicated(mesh))


def _lag1(loader, dispatch):
    """Lag-1 dispatch/consume pipeline shared by every protocol: dispatch
    batch k+1 before the blocking host fetch of batch k's result, so the
    fetch overlaps device compute. Yields ``(result, batch)`` in order."""
    pending = None
    for batch in loader:
        out = dispatch(batch)
        if pending is not None:
            yield pending
        pending = (out, batch)
    if pending is not None:
        yield pending


def evaluate_registration_per_scene(
    apply_fn: Callable,
    params,
    loader,
    dis_thresh: float = 0.1,
    corr: str = "tgt",
    icp_thresh: float = 0.1,
    icp_max_iter: int = 30,
    re_stat: str = "median",
    rmse_thresh: float = 0.2,
    center_mode: str = "trans",
    n_scenes: int = 8,
    mesh=None,
) -> Dict[str, float]:
    """The 3DMatch-family benchmark with per-scene aggregation.

    The loader must yield batches carrying ``idx``, ``covariance`` and
    ``scene`` sidecars. Returns overall and per-scene RR/RRE/RTE.
    """
    scene_re = [[] for _ in range(n_scenes)]
    scene_te = [[] for _ in range(n_scenes)]
    scene_success = np.zeros(n_scenes, dtype=np.int64)
    scene_valid = np.zeros(n_scenes, dtype=np.int64)
    total = 0
    success_total = 0
    sum_re, sum_te = 0.0, 0.0

    def _consume(m, batch):
        nonlocal total, success_total, sum_re, sum_te
        if m.rmse is None:
            raise ValueError(
                "the per-scene protocol scores pairs by redwood RMSE and "
                "needs the covariance sidecars in every batch — build the "
                "dataset with info sidecars (PairDataset(with_info=True))"
            )
        re = np.asarray(m.re_deg)
        te = np.asarray(m.te)
        rmse = np.asarray(m.rmse)
        idx = np.asarray(batch["idx"])
        scene = np.asarray(batch["scene"])

        ok = rmse < rmse_thresh
        total += len(re)
        success_total += int(ok.sum())
        sum_re += float(re[ok].sum())
        sum_te += float(te[ok].sum())

        # PREDATOR protocol: per-scene stats only for |idx1 - idx0| > 1;
        # FAILED pairs append zeros to the RE/TE lists so the per-scene
        # median/mean covers every counted pair
        # (`/root/reference/evaluate_3d_match.py:128-138`).
        gap = np.abs(idx[:, 1] - idx[:, 0]) > 1
        for i in range(len(re)):
            if not gap[i]:
                continue
            sc = int(scene[i])
            scene_valid[sc] += 1
            if ok[i]:
                scene_success[sc] += 1
                scene_re[sc].append(float(re[i]))
                scene_te[sc].append(float(te[i]))
            else:
                scene_re[sc].append(0.0)
                scene_te[sc].append(0.0)

    params = _replicate_params(params, mesh)
    dispatch = lambda batch: register_batch(
        apply_fn, params, _to_device(batch, mesh=mesh),
        dis_thresh=dis_thresh, corr=corr,
        icp_thresh=icp_thresh, icp_max_iter=icp_max_iter,
        center_mode=center_mode, spmd=mesh is not None,
    )
    for m, batch in _lag1(loader, dispatch):
        _consume(m, batch)

    # Per-scene stat over ALL counted pairs (zeros included for failures),
    # then a plain mean over scenes — the RR and RRE/RTE means cover the
    # same scene subset (`/root/reference/evaluate_3d_match.py:152-169`).
    # The reference always divides by the full 8 scenes; a scene with zero
    # counted pairs means the split is truncated and the averaged number is
    # NOT the protocol statistic — warn loudly instead of failing or
    # silently shrinking the denominator.
    if int(np.count_nonzero(scene_valid)) == 0:
        # No counted (gap>1) pairs anywhere: there is no protocol statistic
        # to report. Returning zeros/NaN here would look like a (terrible
        # but valid) result — fail loudly instead.
        raise ValueError(
            "no counted (idx gap>1) pairs in any scene — the split is empty "
            "or fully filtered; protocol metrics are undefined "
            "(`/root/reference/evaluate_3d_match.py:128-138`)")
    if int(np.count_nonzero(scene_valid)) != n_scenes:
        import warnings

        empty = [SCENE_NAMES[s] for s in range(n_scenes) if scene_valid[s] == 0]
        warnings.warn(
            f"scenes with no counted (gap>1) pairs: {empty} — the reference "
            f"protocol averages over all {n_scenes} scenes "
            "(`/root/reference/evaluate_3d_match.py:152-169`); metrics below "
            "average the populated scenes only and are not comparable to "
            "full-split numbers (possibly a truncated download)."
        )
    stat = np.median if re_stat == "median" else np.mean
    per_scene_rr, per_scene_re, per_scene_te = [], [], []
    for s in range(n_scenes):
        if scene_valid[s] == 0:
            continue
        per_scene_rr.append(scene_success[s] / scene_valid[s])
        per_scene_re.append(float(stat(scene_re[s])))
        per_scene_te.append(float(stat(scene_te[s])))

    out = {
        "registration_recall": float(np.mean(per_scene_rr)) if per_scene_rr else 0.0,
        "rre": float(np.mean(per_scene_re)) if per_scene_re else 0.0,
        "rte": float(np.mean(per_scene_te)) if per_scene_te else 0.0,
        "pair_recall": success_total / max(total, 1),
        "success_rre": sum_re / max(success_total, 1),
        "success_rte": sum_te / max(success_total, 1),
        "n_pairs": total,
    }
    for s in range(n_scenes):
        if scene_valid[s]:
            out[f"rr/{SCENE_NAMES[s]}"] = scene_success[s] / scene_valid[s]
    return out


def evaluate_registration(apply_fn, params, loader, cfg: EvalConfig,
                          mesh=None) -> Dict[str, float]:
    """Config-driven entry: every `EvalConfig` knob is honored.

    This is what the CLI calls (with `config.eval_preset(protocol)`), so a
    user editing ``rmse_thresh``/``re_stat``/``corr``/ICP settings changes
    the protocol rather than being silently ignored. ``mesh`` shards eval
    batches over the data axis (CLI ``--mesh data=N``).
    """
    return evaluate_registration_per_scene(
        apply_fn, params, loader,
        dis_thresh=cfg.dis_thresh, corr=cfg.corr,
        icp_thresh=cfg.icp_thresh, icp_max_iter=cfg.icp_max_iter,
        re_stat=cfg.re_stat, rmse_thresh=cfg.rmse_thresh,
        center_mode=cfg.center_mode, mesh=mesh,
    )


def evaluate_3d_match(apply_fn, params, loader, dis_thresh: float = 0.1):
    """3DMatch: NN sq-thresh 0.1, corr in tgt, median per-scene stats
    (`/root/reference/evaluate_3d_match.py:174-178`)."""
    return evaluate_registration_per_scene(
        apply_fn, params, loader, dis_thresh=dis_thresh, corr="tgt",
        re_stat="median",
    )


def evaluate_3d_lo_match(apply_fn, params, loader, dis_thresh: float = 0.1):
    """3DLoMatch: same thresholds as 3DMatch
    (`/root/reference/evaluate_3d_match.py:180-183`)."""
    return evaluate_registration_per_scene(
        apply_fn, params, loader, dis_thresh=dis_thresh, corr="tgt",
        re_stat="median",
    )


def evaluate_3d_zero_match(apply_fn, params, loader, dis_thresh: float = 0.2):
    """3DZeroMatch: corr = src_pred itself, thresh 0.2, mean per-scene stats
    (`/root/reference/evaluate_3d_match.py:193-195`)."""
    return evaluate_registration_per_scene(
        apply_fn, params, loader, dis_thresh=dis_thresh, corr="src_pred",
        re_stat="mean",
    )


def evaluate_kitti(
    apply_fn,
    params,
    loader,
    dis_thresh: float = 1.5,
    icp_thresh: float = 1.0,
    icp_max_iter: int = 1000,
    success_re_deg: float = 5.0,
    success_te: float = 2.0,
    center_mode: str = "neg_rt",
    mesh=None,
    icp_chunk: int | None = None,
) -> Dict[str, float]:
    """KITTI success-rate protocol (`/root/reference/evaluate_kitti.py:20-111`).

    Build the loader over ``SkipDataset(dataset, (124, 142))`` to reproduce
    the reference's skipped items. Protocol deltas vs the 3DMatch family:
    ICP runs to ``max_iteration=1000`` (`:69`) and the model hint is
    ``-R^T t`` (`:39`).

    ``icp_chunk``: when set, route each batch through
    :func:`register_batch_requeue` — chunked ICP with host-side straggler
    compaction (identical protocol numbers; converged pairs stop paying for
    the slowest lane's 1000-iteration ride). The dispatch overlap is kept:
    batch k+1's forward+solve is lag-1 pre-dispatched before batch k's
    chunk loop starts host-syncing.
    """
    total = 0
    succ, succ_re, succ_te = 0, 0.0, 0.0

    def _consume(m):
        nonlocal total, succ, succ_re, succ_te
        re = np.asarray(m.re_deg)
        te = np.asarray(m.te)
        ok = (re <= success_re_deg) & (te <= success_te)
        total += len(re)
        succ += int(ok.sum())
        succ_re += float(re[ok].sum())
        succ_te += float(te[ok].sum())

    params = _replicate_params(params, mesh)
    if icp_chunk is not None:
        # Lag-1 on the SOLVE stage only: its jitted dispatch is async, so
        # batch k+1's forward queues on-device before batch k's chunked ICP
        # starts host-syncing — the requeue path keeps the dispatch overlap
        # the fused path gets from _lag1 directly.
        from scream_tpu.pipeline.register import _register_solve_stage

        def dispatch(batch):
            dev = _to_device(batch, mesh=mesh)
            pre = _register_solve_stage(
                apply_fn, params, dev, dis_thresh, "tgt", center_mode,
                mesh is not None,
            )
            return dev, pre

        for (dev, pre), _ in _lag1(loader, dispatch):
            _consume(register_batch_requeue(
                apply_fn, params, dev,
                dis_thresh=dis_thresh, corr="tgt",
                icp_thresh=icp_thresh, icp_max_iter=icp_max_iter,
                icp_chunk=icp_chunk, center_mode=center_mode,
                spmd=mesh is not None, presolved=pre,
            ))
    else:
        dispatch = lambda batch: register_batch(
            apply_fn, params, _to_device(batch, mesh=mesh),
            dis_thresh=dis_thresh, corr="tgt",
            icp_thresh=icp_thresh, icp_max_iter=icp_max_iter,
            center_mode=center_mode, spmd=mesh is not None,
        )
        for m, _ in _lag1(loader, dispatch):
            _consume(m)
    return {
        "success_rate": succ / max(total, 1),
        "success_rre": succ_re / max(succ, 1),
        "success_rte": succ_te / max(succ, 1),
        "n_pairs": total,
    }


def evaluate_open_gf(apply_fn, params, loader, mesh=None) -> Dict[str, float]:
    """OpenGF DEM-generation metrics x1000
    (`/root/reference/evaluate_open_gf.py:44-76`)."""
    from scream_tpu.geometry.metrics import chamfer_distance, height_mae, height_mse

    tot_cd, tot_mae, tot_mse, n = 0.0, 0.0, 0.0, 0
    params = _replicate_params(params, mesh)

    # ONE jitted program per batch shape: an eager body here dispatches
    # every primitive as its own tunnel RPC (~30 ms each) — measured 45 s
    # per batch vs sub-100 ms jitted at the 650-item OpenGF scale run.
    @jax.jit
    def _metrics(params, dsm, coarse, dsm_mask, coarse_mask, dem, dem_mask):
        dem_pred = apply_fn(
            params, dsm, coarse, dsm_mask, coarse_mask).astype(jnp.float32)
        cd = chamfer_distance(dem_pred, dem, dsm_mask, dem_mask)
        mae = height_mae(dem_pred, dem, dsm_mask & dem_mask)
        mse = height_mse(dem_pred, dem, dsm_mask & dem_mask)
        return cd, mae, mse

    def _dispatch(batch):
        dev = _to_device(batch, mesh=mesh)
        return _metrics(params, dev["dsm"], dev["dem_coarse"],
                        dev["dsm_mask"], dev["dem_coarse_mask"],
                        dev["dem"], dev["dem_mask"])

    def _consume(pend):
        nonlocal tot_cd, tot_mae, tot_mse, n
        cd, mae, mse = pend
        tot_cd += float(jnp.sum(cd))
        tot_mae += float(jnp.sum(mae))
        tot_mse += float(jnp.sum(mse))
        n += int(cd.shape[0])

    for out, _ in _lag1(loader, _dispatch):
        _consume(out)
    return {
        "chamfer_x1000": tot_cd / max(n, 1) * 1000.0,
        "height_mae_x1000": tot_mae / max(n, 1) * 1000.0,
        "height_mse_x1000": tot_mse / max(n, 1) * 1000.0,
        "n_patches": n,
    }
