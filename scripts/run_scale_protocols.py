"""Run every eval protocol at REAL split scale on the synthetic trees.

Companion to `scripts/make_synthetic_splits.py`: executes
``python -m scream_tpu evaluate <protocol> --root <tree>`` as a subprocess
per protocol (serialized — the TPU tunnel is single-client), recording
wall-clock, pairs/sec, peak RSS, and the protocol output. This is the
first time the per-scene accumulators, bucket ladders, and loaders run at
the true 1,253/1,518/1,389/554/650-item scale.

Usage:
    python scripts/run_scale_protocols.py --root /tmp/scale_splits \
        [--protocols 3dmatch 3dlomatch 3dzeromatch kitti opengf]
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

PARAMS = {
    "3dmatch": "params/point-generator",
    "3dlomatch": "params/point-generator",
    "3dzeromatch": "params/point-generator",
    "kitti": "params/kitti-generator",
    "opengf": "params/dem-generator",
}
SPLIT_ITEMS = {"3dmatch": 1253, "3dlomatch": 1518, "3dzeromatch": 1389,
               "kitti": 554, "opengf": 650}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/scale_splits")
    ap.add_argument("--protocols", nargs="+",
                    default=["3dmatch", "3dlomatch", "3dzeromatch", "kitti",
                             "opengf"])
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-points", type=int, default=4096)
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args(argv)

    summary = []
    for proto in args.protocols:
        cmd = [sys.executable, "-m", "scream_tpu", "evaluate", proto,
               "--root", args.root, "--params", PARAMS[proto],
               "--batch-size", str(args.batch_size),
               "--max-points", str(args.max_points)]
        if proto.startswith("3d"):
            cmd.append("--bucketed")
        if proto == "kitti":
            cmd += ["--max-points", "8192"]  # the voxel-0.7 class
            cmd[cmd.index("--batch-size") + 1] = "8"
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=args.timeout)
        wall = time.time() - t0
        # child peak RSS (KB on Linux)
        peak_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024
        last = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        out = json.loads(last[-1]) if last else {"error": r.stderr[-400:]}
        row = {
            "protocol": proto, "rc": r.returncode,
            "items": SPLIT_ITEMS[proto],
            "wall_s": round(wall, 1),
            "items_per_sec": round(SPLIT_ITEMS[proto] / wall, 1),
            "peak_rss_mb_cum": round(peak_mb, 0),
            "result": out,
        }
        summary.append(row)
        print(json.dumps(row), flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr, flush=True)
    return summary


if __name__ == "__main__":
    main()
