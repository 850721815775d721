"""Crash-resilient test-suite runner for this container.

XLA:CPU's LLVM JIT segfaults intermittently on this virtualized 1-core
host — observed inside `backend_compile_and_load` across FOUR different
configurations (persistent cache loading foreign entries, cache writes,
cache disabled, ISA capped at AVX2), each time in a different test, each
time unreproducible in isolation. A single `python -m pytest tests/` dies
with it and loses the whole run's results.

This runner executes each test FILE in its own subprocess and retries a
file whose process dies on a SIGNAL (segfault/sigill — environmental) up
to twice; genuine test failures (exit code 1) are never retried. The
aggregate summary matches pytest semantics: exit 0 iff every test passed.

Usage:
    python scripts/run_suite.py            # whole suite (~38 min on 1 core)
    python scripts/run_suite.py --quick    # smoke tier: one file per
                                           # subsystem (~5 min), see QUICK
    python scripts/run_suite.py -k nn      # forwarded pytest args
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --quick tier: one representative file per subsystem, chosen for coverage
# per wall-second (skips the bench smoke, the parallel heavies, torch
# parity, and the protocol A/B exec harness — those only run in the full
# tier). Keep this list ≤ ~5 min total on the 1-core container.
QUICK = [
    "test_geometry_so3_se3.py",      # math core (SO3/SE3/lie numerics)
    "test_geometry_kabsch_pairwise.py",
    "test_nn_pallas.py",             # NN kernels (interpret mode)
    "test_ops_voxel_icp.py",         # voxel + ICP semantics
    "test_models.py",                # flax model stacks
    "test_data.py",                  # datasets/transforms/batching
    "test_pipeline_register.py",     # end-to-end pose solve
    "test_eval_protocols.py",        # protocol bookkeeping
    "test_native.py",                # C++ backend
    # Dropped for the <=6 min budget (measured, 1-core host): the trainer
    # (~4 min) and driver-entry (~4.5 min, multichip dryrun compile) files
    # only run in the full tier; the driver exercises __graft_entry__
    # separately every round.
]


def run_file(path: str, extra, attempt: int):
    cmd = [sys.executable, "-m", "pytest", path, "-q", "--no-header"] + extra
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    tail = (r.stdout.strip().splitlines() or [""])[-1]
    counts = dict.fromkeys(("passed", "failed", "skipped", "error"), 0)
    for n, kind in re.findall(r"(\d+) (passed|failed|skipped|error)", tail):
        counts[kind] += int(n)
    return r.returncode, counts, tail, r.stdout


def main():
    extra = sys.argv[1:]
    quick = "--quick" in extra
    if quick:
        extra = [a for a in extra if a != "--quick"]
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if quick:
        files = [p for p in files if os.path.basename(p) in QUICK]
        missing = set(QUICK) - {os.path.basename(p) for p in files}
        if missing:
            print(f"# run_suite --quick: QUICK names missing on disk: "
                  f"{sorted(missing)}", flush=True)
    total = dict.fromkeys(("passed", "failed", "skipped", "error"), 0)
    crashed, failed_files = [], []
    t0 = time.time()
    for path in files:
        name = os.path.basename(path)
        tf = time.time()
        for attempt in range(3):
            rc, counts, tail, out = run_file(path, extra, attempt)
            if rc in (0, 1, 5):  # clean run / test failures / nothing collected
                break
            print(f"# {name}: died with rc={rc} (attempt {attempt + 1}/3) — "
                  "environmental crash, retrying", flush=True)
        else:
            crashed.append(name)
            print(f"# {name}: crashed 3x — counting as failed", flush=True)
            total["failed"] += 1
            continue
        for k in total:
            total[k] += counts[k]
        status = "ok" if rc in (0, 5) else "FAIL"
        print(f"{name:36s} {status:4s} [{time.time() - tf:6.1f}s] {tail}",
              flush=True)
        if rc == 1:
            failed_files.append(name)
            sys.stdout.write(out[-3000:] + "\n")
    wall = time.time() - t0
    print(f"== suite: {total['passed']} passed, {total['failed']} failed, "
          f"{total['skipped']} skipped, {total['error']} errors, "
          f"{len(crashed)} crashed file(s) in {wall / 60:.1f} min ==",
          flush=True)
    sys.exit(1 if (total["failed"] or total["error"] or crashed) else 0)


if __name__ == "__main__":
    main()
