"""Static-shape batching: pad-to-bucket point clouds with validity masks.

The reference feeds one variable-size pair at a time at batch 1
(`/root/reference/train_3d_match.py:19-20`, asserts at
`/root/reference/models/pointnet.py:39-40`). On TPU variable shapes mean
recompilation, so every cloud is padded to a bucket capacity and carries a
boolean mask that downstream ops (attention, NN search, Kabsch weights, the
renderer) thread through. Batches are plain dicts of numpy arrays; the step
function moves them to device in one transfer.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def pad_cloud(points: np.ndarray, capacity: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ``(n, 3)`` points to ``(capacity, 3)`` + boolean mask.

    Clouds larger than capacity are randomly *not* subsampled here — callers
    must downsample first (the preprocessors voxel-downsample to well under
    any bucket); oversize input is a hard error to avoid silent metric drift.
    """
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"cloud has {n} points > capacity {capacity}; downsample first")
    out = np.zeros((capacity, 3), dtype=np.float32)
    out[:n] = points
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return out, mask


def bucket_for(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket capacity >= n (buckets must be sorted ascending)."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} points exceed largest bucket {buckets[-1]}")


def collate_pairs(
    items: List[dict],
    src_capacity: int,
    tgt_capacity: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Stack a list of pair dicts into one padded batch.

    Each item has keys ``src, tgt, rot, trans, scale, center`` (+ optional
    eval sidecars ``idx, covariance, scene``). Returns float32/bool numpy
    arrays keyed the same, plus ``src_mask``/``tgt_mask``.
    """
    if tgt_capacity is None:
        tgt_capacity = src_capacity
    b = len(items)
    batch: Dict[str, np.ndarray] = {
        "src": np.zeros((b, src_capacity, 3), np.float32),
        "tgt": np.zeros((b, tgt_capacity, 3), np.float32),
        "src_mask": np.zeros((b, src_capacity), bool),
        "tgt_mask": np.zeros((b, tgt_capacity), bool),
        "rot": np.zeros((b, 3, 3), np.float32),
        "trans": np.zeros((b, 3, 1), np.float32),
        "scale": np.zeros((b,), np.float32),
        "center": np.zeros((b, 3), np.float32),
    }
    # All-or-none: a batch mixing items with and without eval sidecars would
    # either KeyError mid-epoch or silently drop the sidecars depending on
    # item order — fail fast instead.
    with_cov = ["covariance" in it for it in items]
    if any(with_cov) and not all(with_cov):
        raise ValueError(
            "collate_pairs: batch mixes items with and without 'covariance' "
            f"sidecars ({sum(with_cov)}/{len(items)} have it)"
        )
    has_info = with_cov[0]
    if has_info:
        batch["idx"] = np.zeros((b, 2), np.int32)
        batch["covariance"] = np.zeros((b, 6, 6), np.float32)
        batch["scene"] = np.zeros((b,), np.int32)

    for i, it in enumerate(items):
        batch["src"][i], batch["src_mask"][i] = pad_cloud(it["src"], src_capacity)
        batch["tgt"][i], batch["tgt_mask"][i] = pad_cloud(it["tgt"], tgt_capacity)
        batch["rot"][i] = it["rot"]
        batch["trans"][i] = np.reshape(it["trans"], (3, 1))
        batch["scale"][i] = it.get("scale", 1.0)
        batch["center"][i] = it.get("center", np.zeros(3))
        if has_info:
            batch["idx"][i] = it["idx"]
            batch["covariance"][i] = it["covariance"]
            batch["scene"][i] = it.get("scene", 0)
    return batch


def collate_dem(
    items: List[dict], dsm_capacity: int, dem_capacity: int, coarse_capacity: int
) -> Dict[str, np.ndarray]:
    """Stack OpenGF items (``dsm, dem, dem_coarse`` (+``center``)) into a batch."""
    b = len(items)
    batch = {
        "dsm": np.zeros((b, dsm_capacity, 3), np.float32),
        "dem": np.zeros((b, dem_capacity, 3), np.float32),
        "dem_coarse": np.zeros((b, coarse_capacity, 3), np.float32),
        "dsm_mask": np.zeros((b, dsm_capacity), bool),
        "dem_mask": np.zeros((b, dem_capacity), bool),
        "dem_coarse_mask": np.zeros((b, coarse_capacity), bool),
    }
    with_center = ["center" in it for it in items]
    if any(with_center) and not all(with_center):
        # Same all-or-none rule as collate_pairs' covariance: a mixed batch
        # would either KeyError mid-epoch or silently zero some rows'
        # centers (corrupting patch stitching downstream).
        raise ValueError("either every item carries 'center' or none does")
    if with_center[0]:
        batch["center"] = np.zeros((b, 2), np.float32)
    for i, it in enumerate(items):
        batch["dsm"][i], batch["dsm_mask"][i] = pad_cloud(it["dsm"], dsm_capacity)
        batch["dem"][i], batch["dem_mask"][i] = pad_cloud(it["dem"], dem_capacity)
        batch["dem_coarse"][i], batch["dem_coarse_mask"][i] = pad_cloud(
            it["dem_coarse"], coarse_capacity
        )
        if "center" in it:
            batch["center"][i] = np.asarray(it["center"], np.float32).reshape(-1)[:2]
    return batch
