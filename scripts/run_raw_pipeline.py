"""Drive the RAW->artifact preprocessors at real-dataset scale.

Companion to `scripts/make_synthetic_raw.py`: runs
``python -m scream_tpu preprocess {3dmatch,kitti,opengf}`` as subprocesses
over the generated raw trees (serialized — the KITTI GT refinement uses the
jax ICP on the TPU tunnel, which is single-client), recording wall clock
and child peak RSS, then validates every produced artifact split with the
REAL split readers (PairDataset / OpenGFDataset item counts + one item
materialized per split).

Usage:
    python scripts/run_raw_pipeline.py --raw /tmp/raw_trees \
        --out /tmp/raw_artifacts [--parts 3dmatch kitti opengf]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_part(part, raw_root, out):
    cmd = [sys.executable, "-m", "scream_tpu", "preprocess", part,
           "--root", os.path.join(raw_root, f"{part}_raw"), "--out", out]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    wall = time.time() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024
    return {
        "part": part, "rc": r.returncode, "wall_s": round(wall, 1),
        "peak_rss_mb_cum": round(peak_mb, 0),
        "stdout_tail": r.stdout.strip().splitlines()[-6:],
        **({} if r.returncode == 0 else {"stderr": r.stderr[-1500:]}),
    }


def validate(out):
    """Open every produced split with the real readers."""
    from scream_tpu.data import OpenGFDataset, PairDataset

    checks = {}
    for split, norm, info in (
        ("3DMatch_train", "unit_sphere", False),
        ("3DMatch_val", "unit_sphere", False),
        ("3DMatch_test", "unit_sphere", True),
        ("3DLoMatch_test", "unit_sphere", True),
        ("3DZeroMatch_test", "unit_sphere", True),
        ("KITTI_train", "unit_cube", False),
        ("KITTI_val", "unit_cube", False),
        ("KITTI_test", "unit_cube", False),
    ):
        path = os.path.join(out, split)
        if not os.path.isdir(path):
            continue
        ds = PairDataset(out, split, normalize=norm, with_info=info)
        item = ds[0]
        last = ds[len(ds) - 1]
        checks[split] = {
            "n": len(ds),
            "first_item_pts": [int(len(item["src"])), int(len(item["tgt"]))],
            "last_item_pts": [int(len(last["src"])), int(len(last["tgt"]))],
            **({"has_info": "covariance" in item} if info else {}),
        }
    for split in ("OpenGF_train", "OpenGF_val", "OpenGF_test"):
        path = os.path.join(out, split)
        if not os.path.isdir(path):
            continue
        ds = OpenGFDataset(out, split.split("_")[1])
        item = ds[0]
        checks[split] = {"n": len(ds),
                         "first_item_pts": [int(len(item["dsm"])),
                                            int(len(item["dem"]))]}
    return checks


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", default="/tmp/raw_trees")
    ap.add_argument("--out", default="/tmp/raw_artifacts")
    ap.add_argument("--parts", nargs="+",
                    default=["3dmatch", "kitti", "opengf"])
    ap.add_argument("--skip-validate", action="store_true")
    args = ap.parse_args(argv)

    rows = []
    for part in args.parts:
        row = run_part(part, args.raw, args.out)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if row["rc"] != 0:
            print(row.get("stderr", ""), file=sys.stderr)
    if not args.skip_validate:
        print(json.dumps({"reader_validation": validate(args.out)},
                         default=str), flush=True)
    return rows


if __name__ == "__main__":
    main()
