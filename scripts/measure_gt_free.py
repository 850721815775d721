"""Measure GT-free registration quality of a shipped hint-free checkpoint.

Fresh synthetic pairs (never seen in training: new seeds) are registered
with `scream_tpu.pipeline.register_pair` — no GT hint, no GT normalization —
and scored against the known generator pose. This is the harness behind the
GT-free rows in docs/EVAL_SNAPSHOT.md.

Usage:
    python scripts/measure_gt_free.py [--ckpt params/point-generator-hintfree]
        [--pairs 16] [--points 448] [--max-angle-deg 90] [--passes 1 2 3]
        [--cpu] [--seed 100]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# Runnable as `python scripts/measure_gt_free.py` from anywhere: sys.path[0]
# is scripts/, so put the repo root (the scream_tpu package parent) on it.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="params/point-generator-hintfree")
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--points", type=int, default=448)
    ap.add_argument("--max-angle-deg", type=float, default=90.0)
    ap.add_argument("--passes", type=int, nargs="+", default=[1, 2, 3],
                    help="register_pair pass counts to sweep; 0 selects "
                    "register_pair_robust (multi-start + coarse-to-fine)")
    ap.add_argument("--starts", choices=("axis7", "oct24", "ico60"), default="axis7",
                    help="rotation-seed set for the robust path (passes 0)")
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--overlap", type=float, default=0.7)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default in this harness: "
                    "whatever backend the environment resolves)")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig
    from scream_tpu.data.synthetic import make_pair
    from scream_tpu.geometry.metrics import transformation_error
    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.pipeline.register import register_pair, register_pair_robust
    from scream_tpu.utils.checkpoint import load_params

    side = json.load(open(os.path.join(args.ckpt, "model_config.json")))
    normalize = side.pop("normalize")
    cfg = dataclasses.replace(ModelConfig(dtype="float32"), **side)
    model = PointTransformer(cfg)
    z = jnp.zeros((1, 8, 3))
    init = model.init(jax.random.PRNGKey(0), z, z, jnp.ones((1, 8), bool),
                      jnp.ones((1, 8), bool), jnp.zeros((1, 1, 3)))["params"]
    params = load_params(args.ckpt, init)

    def apply_fn(p, src, tgt, sm, tm, center):
        return model.apply({"params": p}, src, tgt, sm, tm, center)

    rng = np.random.default_rng(args.seed)
    pairs = [
        make_pair(rng, n_src=args.points, n_tgt=args.points,
                  overlap=args.overlap, noise=args.noise,
                  max_angle=np.deg2rad(args.max_angle_deg))
        for _ in range(args.pairs)
    ]

    err = jax.jit(transformation_error)
    results = {}
    for n_passes in args.passes:
        res, tic = [], time.perf_counter()
        for pair in pairs:
            if n_passes == 0:
                out = register_pair_robust(apply_fn, params, pair["src"],
                                           pair["tgt"], normalize=normalize,
                                           starts=args.starts)
            else:
                out = register_pair(apply_fn, params, pair["src"],
                                    pair["tgt"], normalize=normalize,
                                    passes=n_passes)
            gt = np.eye(4, dtype=np.float32)
            gt[:3, :3] = pair["rot"]
            gt[:3, 3] = pair["trans"].reshape(3)
            re, te = err(jnp.asarray(out.transform), jnp.asarray(gt))
            res.append((float(re), float(te), out.fitness,
                        out.score_margin, out.ambiguous))
        wall = time.perf_counter() - tic
        re_deg = np.array([r[0] for r in res])
        te = np.array([r[1] for r in res])
        ok = (re_deg <= 15.0) & (te <= 0.3)
        recall = float(np.mean(ok))
        row = {
            "passes": n_passes,
            "starts": args.starts if n_passes == 0 else None,
            "median_re_deg": round(float(np.median(re_deg)), 2),
            "median_te": round(float(np.median(te)), 4),
            "recall_re15_te0.3": round(recall, 3),
            "mean_fitness": round(float(np.mean([r[2] for r in res])), 3),
            "wall_s": round(wall, 1),
        }
        if n_passes == 0:
            # Ambiguity-band calibration data (robust path only): the
            # per-pair score margins, split by protocol success, decide
            # where the near-symmetry band sits (PairRegistration docs).
            margins = np.array([r[3] for r in res])
            row["margin_succ_min"] = round(float(margins[ok].min()), 3) if ok.any() else None
            row["margin_succ_q"] = ([round(float(q), 3) for q in
                                     np.quantile(margins[ok],
                                                 [0.05, 0.25, 0.5])]
                                    if ok.any() else None)
            row["margin_fail_max"] = (round(float(margins[~ok].max()), 3)
                                      if (~ok).any() else None)
            row["margins_failed"] = [round(float(m), 3) for m in margins[~ok]]
            row["ambiguous_frac"] = round(float(np.mean([r[4] for r in res])), 3)
        results[n_passes] = row
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
