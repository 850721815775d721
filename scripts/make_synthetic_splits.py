"""Generate synthetic artifact trees at the REAL split sizes.

The eval protocols had only ever executed on 16-64 synthetic pairs; the real
splits are 1,253 / 1,518 / 1,389 / 554 / 650 items
(`scream_tpu/data/datasets.py` CANONICAL_SIZES, from
`/root/reference/datasets/three_d_match.py:226,252,278`, `kitti.py:333`,
`open_gf.py:56`). This writes full-scale synthetic trees in the exact
on-disk layout the readers consume (`src%d/tgt%d/T%d.npy` + `info/`
sidecars; OpenGF ``[dsm|dem]`` blocks + centers), so
``python -m scream_tpu evaluate <protocol> --root <out>`` exercises the
loaders, bucket ladders, and per-scene accumulators at true scale before
the first real-data run does.

Geometry is `data.synthetic.make_pair` (known GT, overlap control); cloud
sizes vary over a realistic range so the bucket ladder actually ladders.
Usage:
    python scripts/make_synthetic_splits.py --out /tmp/scale_splits \
        [--splits 3dmatch 3dlomatch 3dzeromatch kitti opengf]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scream_tpu.data.datasets import CANONICAL_SIZES, SCENE_NAME_TO_IDX  # noqa: E402
from scream_tpu.data.preprocess import _save_triple, save_opengf_split  # noqa: E402
from scream_tpu.data.raw import save_info_sidecars  # noqa: E402
from scream_tpu.data.synthetic import make_dem_patch, make_pair  # noqa: E402

SCENES = list(SCENE_NAME_TO_IDX)


def _registration_split(out_dir, n_items, rng, overlap_range, extent,
                        n_range, with_info, zero=False):
    os.makedirs(out_dir, exist_ok=True)
    infos = []
    for i in range(n_items):
        n_src = int(rng.integers(*n_range))
        n_tgt = int(rng.integers(*n_range))
        ov = 0.0 if zero else float(rng.uniform(*overlap_range))
        p = make_pair(rng, n_src=n_src, n_tgt=n_tgt, overlap=ov,
                      noise=0.002, extent=extent)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = p["rot"]
        T[:3, 3] = p["trans"].reshape(3)
        _save_triple(out_dir, i, p["src"].astype(np.float32),
                     p["tgt"].astype(np.float32), T)
        if with_info:
            # idx gap: most pairs non-consecutive (counted); ~12% gap-1
            # (filtered by the protocol's idx-gap>1 rule) so the filter
            # actually exercises at scale.
            base = int(rng.integers(0, 500))
            gap = 1 if rng.random() < 0.12 else int(rng.integers(2, 30))
            # redwood-style 6x6 information matrix: SPD, point-count scale
            a = rng.standard_normal((6, 6)).astype(np.float64)
            cov = a @ a.T * n_src + np.eye(6) * n_src
            infos.append({
                "idx": np.array([base, base + gap], np.int64),
                "covariance": cov,
                "scene": SCENES[i % len(SCENES)],
            })
    if with_info:
        save_info_sidecars(infos, out_dir)
    return n_items


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_splits")
    ap.add_argument("--splits", nargs="+",
                    default=["3dmatch", "3dlomatch", "3dzeromatch", "kitti",
                             "opengf"])
    ap.add_argument("--n-lo", type=int, default=1024,
                    help="lower cloud-size bound for the 3DMatch family")
    ap.add_argument("--n-hi", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    for split in args.splits:
        if split == "3dmatch":
            n = _registration_split(
                os.path.join(args.out, "3DMatch_test"),
                CANONICAL_SIZES["3DMatch_test"], rng, (0.35, 0.9), 1.5,
                (args.n_lo, args.n_hi), with_info=True)
        elif split == "3dlomatch":
            n = _registration_split(
                os.path.join(args.out, "3DLoMatch_test"),
                CANONICAL_SIZES["3DLoMatch_test"], rng, (0.12, 0.35), 1.5,
                (args.n_lo, args.n_hi), with_info=True)
        elif split == "3dzeromatch":
            n = _registration_split(
                os.path.join(args.out, "3DZeroMatch_test"),
                CANONICAL_SIZES["3DZeroMatch_test"], rng, (0.0, 0.0), 1.5,
                (args.n_lo, args.n_hi), with_info=True, zero=True)
        elif split == "kitti":
            n = _registration_split(
                os.path.join(args.out, "KITTI_test"),
                CANONICAL_SIZES["KITTI_test"], rng, (0.5, 0.9), 40.0,
                (4096, 8192), with_info=False)
        elif split == "opengf-train":
            # Matched-distribution TRAIN/VAL patches (same make_dem_patch
            # metric geometry as the test split below) so a DEM checkpoint
            # can be trained for a meaningful at-scale quality number
            # (round-4 gap: the 650-patch run scored an untrained
            # distribution). Counts are a training-budget choice, not a
            # protocol size (the real split is 10,693).
            for sub, count, seed_off in (("OpenGF_train", 2000, 0),
                                         ("OpenGF_val", 200, 1)):
                r2 = np.random.default_rng(args.seed + 100 + seed_off)

                def patches(r2=r2, count=count):
                    for i in range(count):
                        pt = make_dem_patch(
                            r2, n_dsm=int(r2.integers(1024, 4096)),
                            n_dem=int(r2.integers(1024, 4096)), extent=50.0)
                        pt["center"] = np.zeros(3, np.float32)
                        yield pt
                n = save_opengf_split(patches(), os.path.join(args.out, sub),
                                      save_centers=False)
                print(f"{sub}: wrote {n} items", flush=True)
            continue
        elif split == "opengf":
            # Raw METRIC patches: the reader applies the /50 scaling and the
            # resolution-20 coarse voxel on read (datasets.OpenGFDataset),
            # so extent=50 lands patches in the trained unit class.
            def patches():
                for i in range(CANONICAL_SIZES["OpenGF_test"]):
                    pt = make_dem_patch(rng,
                                        n_dsm=int(rng.integers(1024, 4096)),
                                        n_dem=int(rng.integers(1024, 4096)),
                                        extent=50.0)
                    pt["center"] = np.zeros(3, np.float32)
                    yield pt
            n = save_opengf_split(patches(),
                                  os.path.join(args.out, "OpenGF_test"),
                                  save_centers=True)
        else:
            raise SystemExit(f"unknown split {split}")
        print(f"{split}: wrote {n} items", flush=True)


if __name__ == "__main__":
    main()
