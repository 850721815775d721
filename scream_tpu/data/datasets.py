"""Dataset readers for the preprocessed ``.npy`` artifact layout.

Artifact-compatible with the reference so its preprocessed downloads drop in
unchanged (`/root/reference/datasets/three_d_match.py:168-294`,
`/root/reference/datasets/kitti.py:276-350`,
`/root/reference/datasets/open_gf.py:11-70`):

  * registration splits: ``<root>/<split_dir>/src%d.npy / tgt%d.npy / T%d.npy``
    with test sidecars ``info/idx%d.npy``, ``info/covariance%d.npy`` and
    ``info/scene_names.txt``,
  * OpenGF: ``<root>/OpenGF_<split>/%d.npy`` holding ``[dsm | dem]``
    concatenated columns, test centers at ``centers/%d.npy``.

Unlike the reference (hardcoded relative paths, fixed lengths baked into
``__len__``) the root is configurable and lengths are discovered from disk,
with the reference's canonical counts kept as constants for validation.
"""

from __future__ import annotations

import os
import threading
import warnings
from typing import Dict, List, Optional

import numpy as np

from scream_tpu.data import transforms
from scream_tpu.native import voxel_downsample as voxel_downsample_np

# Canonical split sizes (reference `datasets/three_d_match.py:173,200,226,252,278`,
# `datasets/kitti.py:281,308,333`, `datasets/open_gf.py:16,36,56`).
CANONICAL_SIZES = {
    "3DMatch_train": 27730,
    "3DMatch_val": 1749,
    "3DMatch_test": 1253,
    "3DLoMatch_test": 1518,
    "3DZeroMatch_test": 1389,
    "KITTI_train": 1358,
    "KITTI_val": 180,
    "KITTI_test": 554,
    "OpenGF_train": 10693,
    "OpenGF_val": 75,
    "OpenGF_test": 650,
}

# The 8 redwood test scenes (`/root/reference/datasets/three_d_match.py:156-165`).
SCENE_NAME_TO_IDX = {
    "7-scenes-redkitchen": 0,
    "sun3d-home_at-home_at_scan1_2013_jan_1": 1,
    "sun3d-home_md-home_md_scan9_2012_sep_30": 2,
    "sun3d-hotel_uc-scan3": 3,
    "sun3d-hotel_umd-maryland_hotel1": 4,
    "sun3d-hotel_umd-maryland_hotel3": 5,
    "sun3d-mit_76_studyroom-76-1studyroom2": 6,
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika": 7,
}

OPENGF_SCALE_FACTOR = 50.0  # `/root/reference/datasets/open_gf.py:8`
OPENGF_COARSE_RESOLUTION = 20.0  # `/root/reference/datasets/open_gf.py:13`


def _count_items(directory: str, pattern: str = "src%d.npy") -> int:
    n = 0
    while os.path.exists(os.path.join(directory, pattern % n)):
        n += 1
    return n


def _check_canonical_size(split_dir: str, discovered: int) -> None:
    """Warn when a discovered split length disagrees with the reference's
    hardcoded count — the usual cause is a truncated download. Lengths are
    discovered (not baked in) so partial datasets still work, but silently
    evaluating on a subset would corrupt protocol numbers."""
    expected = CANONICAL_SIZES.get(split_dir)
    if expected is not None and discovered not in (0, expected):
        warnings.warn(
            f"{split_dir}: found {discovered} items on disk but the reference "
            f"split has {expected} "
            "(/root/reference/datasets/three_d_match.py:173,200,226,252,278; "
            "kitti.py:281,308,333; open_gf.py:16,36,56) — possibly a "
            "truncated download; protocol metrics over this split will not "
            "be comparable.",
            stacklevel=3,
        )



def _norm_fn(name: str):
    """Strict normalization lookup — an unknown mode must fail fast, not
    silently switch protocol (unit_sphere vs unit_cube changes every
    downstream threshold)."""
    try:
        return {
            "unit_sphere": transforms.normalize_unit_sphere,
            # GT-free variant: centers on the UN-registered union, matching
            # pipeline.register_pair's inference-time normalization (for
            # hint-free training, see gt_center_hint("none")).
            "unit_sphere_raw": transforms.normalize_unit_sphere_raw,
            "unit_cube": transforms.normalize_unit_cube,
            "unit_cube_raw": transforms.normalize_unit_cube_raw,
        }[name]
    except KeyError:
        raise ValueError(
            f"unknown normalize mode {name!r}; expected 'unit_sphere', "
            "'unit_sphere_raw', 'unit_cube' or 'unit_cube_raw'"
        ) from None


class _PerItemSeeds:
    """Thread-safe, reproducible augmentation RNG streams.

    Loader worker threads call ``__getitem__`` concurrently; a single shared
    np.random.Generator is not thread-safe and makes runs depend on thread
    interleaving. Instead each (item, visit-count) pair gets its own
    deterministic seed: concurrent draws never touch shared generator state
    and epoch k's augmentation of item i is identical across runs regardless
    of scheduling.
    """

    def __init__(self, seed: int):
        self.seed = seed
        self._counts: Dict[int, int] = {}
        self._lock = threading.Lock()

    def rng(self, item: int) -> np.random.Generator:
        with self._lock:
            k = self._counts.get(item, 0)
            self._counts[item] = k + 1
        return np.random.default_rng((self.seed, item, k))


class PairDataset:
    """Registration pairs with augmentation + normalization on read.

    ``normalize`` is "unit_sphere" (3DMatch) or "unit_cube" (KITTI);
    ``augment=True`` applies the training perturbation.
    """

    def __init__(
        self,
        root: str,
        split_dir: str,
        normalize: str = "unit_sphere",
        augment: bool = False,
        perturb_both_sides: bool = True,
        perturb_std: float = 0.1,
        jitter_std: float = 0.003,
        with_info: bool = False,
        seed: int = 0,
        max_points: Optional[int] = None,
    ):
        """``max_points``: clouds larger than this are deterministically
        random-subsampled on read (seeded per item) so they fit the padding
        bucket. None = strict (the loader errors on oversize clouds). The
        reference runs every cloud unsubsampled at batch 1; set the capacity
        to the dataset's max cloud size for exact parity."""
        self.dir = os.path.join(root, split_dir)
        self.split_dir = split_dir
        self.normalize = normalize
        self.augment = augment
        self.perturb_both_sides = perturb_both_sides
        self.perturb_std = perturb_std
        self.jitter_std = jitter_std
        self.with_info = with_info
        self.max_points = max_points
        self._seeds = _PerItemSeeds(seed)
        self.length = _count_items(self.dir)
        _check_canonical_size(split_dir, self.length)
        self.scene_names: Optional[List[str]] = None
        if with_info:
            names_path = os.path.join(self.dir, "info", "scene_names.txt")
            # Fail fast like the reference's unconditional open
            # (`/root/reference/datasets/three_d_match.py:224-226`): without
            # scene names every pair would silently collate to scene 0 and
            # the per-scene recall aggregation would average one bucket.
            if not os.path.exists(names_path):
                raise FileNotFoundError(
                    f"{names_path} missing: with_info=True needs the scene-"
                    "name sidecar (regenerate with preprocess/"
                    "save_info_sidecars, or pass with_info=False)"
                )
            with open(names_path) as f:
                self.scene_names = [line.strip() for line in f]

    def __len__(self) -> int:
        return self.length

    def _cap(self, pts: np.ndarray, item: int, salt: int) -> np.ndarray:
        if self.max_points is None or len(pts) <= self.max_points:
            return pts
        r = np.random.default_rng(item * 2 + salt)
        return pts[r.choice(len(pts), self.max_points, replace=False)]

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        src = self._cap(np.load(os.path.join(self.dir, "src%d.npy" % item)), item, 0)
        tgt = self._cap(np.load(os.path.join(self.dir, "tgt%d.npy" % item)), item, 1)
        T = np.load(os.path.join(self.dir, "T%d.npy" % item))

        if self.augment:
            src, tgt, T = transforms.augment_pair(
                self._seeds.rng(item), src, tgt, T,
                perturb_std=self.perturb_std,
                jitter_std=self.jitter_std,
                perturb_both_sides=self.perturb_both_sides,
            )
        rot, trans = T[:3, :3], T[:3, 3:]

        norm = _norm_fn(self.normalize)
        src_n, tgt_n, trans_n, s, c = norm(src, tgt, rot, trans)
        out = {
            "src": src_n.astype(np.float32),
            "tgt": tgt_n.astype(np.float32),
            "rot": rot.astype(np.float32),
            "trans": trans_n.astype(np.float32),
            "scale": np.float32(s),
            "center": c.astype(np.float32),
        }
        if self.with_info:
            out["idx"] = np.load(os.path.join(self.dir, "info", "idx%d.npy" % item))
            out["covariance"] = np.load(
                os.path.join(self.dir, "info", "covariance%d.npy" % item)
            )
            if self.scene_names is not None:
                out["scene"] = np.int32(SCENE_NAME_TO_IDX[self.scene_names[item]])
        return out


class OpenGFDataset:
    """OpenGF patches: ``[dsm | dem]`` columns, coarse DEM derived on read.

    The coarse DEM is the DEM voxel-downsampled at resolution 20 *before* the
    /50 coordinate scaling, exactly as the reference's per-item path
    (`/root/reference/datasets/open_gf.py:18-28`).
    """

    def __init__(self, root: str, split: str = "train", with_centers: bool = False):
        self.dir = os.path.join(root, f"OpenGF_{split}")
        self.with_centers = with_centers
        n = 0
        while os.path.exists(os.path.join(self.dir, "%d.npy" % (n + 1))):
            n += 1
        self.length = n
        _check_canonical_size(f"OpenGF_{split}", self.length)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        dsm_dem = np.load(os.path.join(self.dir, "%d.npy" % (item + 1)))
        dsm, dem = dsm_dem[:, :3], dsm_dem[:, 3:]
        dem_coarse = voxel_downsample_np(dem, OPENGF_COARSE_RESOLUTION)
        out = {
            "dsm": (dsm / OPENGF_SCALE_FACTOR).astype(np.float32),
            "dem": (dem / OPENGF_SCALE_FACTOR).astype(np.float32),
            "dem_coarse": (dem_coarse / OPENGF_SCALE_FACTOR).astype(np.float32),
        }
        if self.with_centers:
            out["center"] = np.load(
                os.path.join(self.dir, "centers", "%d.npy" % (item + 1))
            ).astype(np.float32)
        return out


class SyntheticPairDataset:
    """Fixed-seed synthetic pairs with the same item schema as PairDataset."""

    def __init__(
        self,
        length: int = 64,
        n_src: int = 512,
        n_tgt: int = 512,
        overlap: float = 0.7,
        normalize: str = "unit_sphere",
        augment: bool = False,
        seed: int = 0,
        with_info: bool = False,
        extent: float = 1.0,
    ):
        self.length = length
        self.n_src, self.n_tgt, self.overlap = n_src, n_tgt, overlap
        self.normalize = normalize
        self.augment = augment
        self.seed = seed
        self.with_info = with_info
        self.extent = extent
        self._seeds = _PerItemSeeds(seed + 99991)

    def __len__(self) -> int:
        return self.length

    def size_hint(self, item: int):
        """Static cloud sizes — lets BucketedPairLoader probe without
        materializing (and without consuming augmentation RNG draws)."""
        return self.n_src, self.n_tgt

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        from scream_tpu.data.synthetic import make_pair

        rng = np.random.default_rng(self.seed * 1_000_003 + item)
        pair = make_pair(rng, self.n_src, self.n_tgt, overlap=self.overlap,
                         extent=self.extent)
        src, tgt = pair["src"], pair["tgt"]
        T = np.eye(4, dtype=np.float64)
        T[:3, :3], T[:3, 3:] = pair["rot"], pair["trans"]
        if self.augment:
            src, tgt, T = transforms.augment_pair(self._seeds.rng(item), src, tgt, T)
        rot, trans = T[:3, :3], T[:3, 3:]
        norm = _norm_fn(self.normalize)
        src_n, tgt_n, trans_n, s, c = norm(src, tgt, rot, trans)
        out = {
            "src": src_n.astype(np.float32),
            "tgt": tgt_n.astype(np.float32),
            "rot": rot.astype(np.float32),
            "trans": trans_n.astype(np.float32),
            "scale": np.float32(s),
            "center": c.astype(np.float32),
        }
        if self.with_info:
            out["idx"] = np.array([item * 3, item * 3 + 2], np.int32)  # idx gap > 1
            out["covariance"] = np.eye(6, dtype=np.float32) * float(self.n_src)
            out["scene"] = np.int32(item % 8)
        return out


class ConcatDataset:
    """Concatenation of map-style datasets (shared item schema)."""

    def __init__(self, parts):
        self.parts = list(parts)
        self._offsets = []
        off = 0
        for p in self.parts:
            self._offsets.append(off)
            off += len(p)
        self._total = off

    def __len__(self):
        return self._total

    def __getitem__(self, i):
        if i < 0 or i >= self._total:
            raise IndexError(i)
        for p, off in zip(self.parts, self._offsets):
            if i < off + len(p):
                return p[i - off]
        raise IndexError(i)

    def _unwrap(self, i):
        """Delegate size probing to the underlying part (see
        loader._default_size_fn)."""
        for p, off in zip(self.parts, self._offsets):
            if i < off + len(p):
                return p, i - off
        raise IndexError(i)
