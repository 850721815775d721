"""Micro-benchmark of the bounded-NN kernel variants in isolation.

Times ONE `_bounded_batched` pass per ICP-iteration-equivalent via a
`lax.scan` chain (50 chained calls per dispatch, each on a shifted src so
the remote tunnel cannot serve dispatch-cache hits; result fetched to
host), at the headline ICP operating point: (B, N, M) sorted clouds with
the 3DMatch tight threshold. Also measures the ALL-DEAD floor (every flag
pruned: pure grid/branch overhead, zero sub-slab passes) — the probe that
decides whether the per-sub-slab constant is real work or Mosaic
scheduling (VERDICT round-4 ask).

Usage:
    python scripts/bench_nn_kernel.py [--batch 16] [--n 4096] [--iters 50]
    SCREAM_NN_DSTGROUP=0 python scripts/bench_nn_kernel.py   # fine1 variant
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--thresh", type=float, default=0.1)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.data.synthetic import make_pair
    from scream_tpu.geometry.icp import _spatial_sort
    from scream_tpu.ops.nn_pallas import _bounded_batched

    rng = np.random.default_rng(5)
    B, N = args.batch, args.n
    pairs = [make_pair(rng, n_src=N, n_tgt=N, overlap=0.7) for _ in range(B)]
    src = jnp.asarray(np.stack([p["src"] @ p["rot"].T + p["trans"].reshape(3)
                                for p in pairs]))  # GT-aligned: ICP regime
    tgt = jnp.asarray(np.stack([p["tgt"] for p in pairs]))
    ones = jnp.ones((B, N), bool)
    src, _ = jax.vmap(lambda p, m: _spatial_sort(p, m))(src, ones)
    tgt, _ = jax.vmap(lambda p, m: _spatial_sort(p, m))(tgt, ones)
    t2 = jnp.float32(args.thresh ** 2)

    def chain(dead_val):
        def body(carry, k):
            s = src + (k.astype(jnp.float32) + 1.0) * 1e-5  # distinct input
            d, xyz = _bounded_batched(
                s, tgt, t2, ones, jnp.full((B,), dead_val))
            return carry + jnp.sum(xyz[:, ::64, 0]) + jnp.sum(d[:, ::64]), None

        def run(seed):
            out, _ = jax.lax.scan(body, seed, jnp.arange(args.iters))
            return out

        return jax.jit(run)

    results = {"batch": B, "n": N, "iters": args.iters,
               "variant": os.environ.get("SCREAM_NN_DSTGROUP", "default")}
    for name, dead in (("live", False), ("all_dead", True)):
        f = chain(dead)
        t0 = time.time()
        np.asarray(f(jnp.float32(0.0)))  # compile + warm
        results[f"{name}_compile_s"] = round(time.time() - t0, 1)
        ts = []
        for r in range(args.reps):
            t0 = time.time()
            np.asarray(f(jnp.float32(r + 1.0)))  # distinct seed per rep
            ts.append((time.time() - t0) / args.iters * 1e3)
        results[f"{name}_ms_per_call"] = round(min(ts), 4)
    results["per_pass_us"] = None
    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    main()
