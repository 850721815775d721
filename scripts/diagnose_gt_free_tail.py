"""Per-failure diagnosis of the GT-free full-SO(3) robust path.

For every fresh synthetic pair (same seed stream as the EVAL_SNAPSHOT rows)
the robust ico60 search runs with lane diagnostics, and each pair records:

  * final RE/TE vs the generator GT, pass/fail at recall(RE<=15, TE<=0.3)
  * the winning lane's tight-fitness score vs the runner-up's
  * the ORACLE lane: the seed whose candidate transform has the lowest RE —
    did any lane land in the right basin, and did the ranking pick it?
  * the GT pose's own tight-fitness (score an oracle would give the true
    pose) — separates "ranking picked wrong" from "no lane found it" from
    "the pose is genuinely ambiguous at this overlap"

Usage:
    python scripts/diagnose_gt_free_tail.py --ckpt params/point-generator-hintfree
        [--pairs 64] [--points 448] [--starts ico60] [--seed 100] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="params/point-generator-hintfree")
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--points", type=int, default=448)
    ap.add_argument("--max-angle-deg", type=float, default=180.0)
    ap.add_argument("--starts", default="ico60")
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--overlap", type=float, default=0.7)
    ap.add_argument("--cpu", action="store_true")
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
    from scream_tpu.pipeline.register import (
        _tight_fitness,
        register_pairs_robust,
    )
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
                  overlap=args.overlap, noise=0.0,
                  max_angle=np.deg2rad(args.max_angle_deg))
        for _ in range(args.pairs)
    ]

    outs, lane_diag = register_pairs_robust(
        apply_fn, params, [(p["src"], p["tgt"]) for p in pairs],
        normalize=normalize, starts=args.starts, return_lanes=True)

    err = jax.jit(transformation_error)
    # normalized-frame ICP threshold the robust path uses -> tight radius
    tight = 0.1 / 2.0
    rows, n_pass = [], 0
    for i, (pair, out, lanes) in enumerate(zip(pairs, outs, lane_diag)):
        gt = np.eye(4, dtype=np.float32)
        gt[:3, :3] = pair["rot"]
        gt[:3, 3] = pair["trans"].reshape(3)
        re, te = err(jnp.asarray(out.transform), jnp.asarray(gt))
        re, te = float(re), float(te)
        ok = re <= 15.0 and te <= 0.3
        n_pass += ok

        # per-lane RE + score
        lane_res = []
        for score, T in lanes:
            lre, lte = err(jnp.asarray(T), jnp.asarray(gt))
            lane_res.append((score, float(lre), float(lte)))
        scores = np.array([r[0] for r in lane_res])
        order = np.argsort(-scores)
        win, run = order[0], order[1]
        oracle = int(np.argmin([r[1] for r in lane_res]))
        src, tgt = pair["src"], pair["tgt"]
        gt_fit = _tight_fitness(
            (src @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32), tgt, tight)
        # GT rotation angle
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(pair["rot"]) - 1) / 2, -1, 1)))
        row = {
            "pair": i, "ok": ok, "re_deg": round(re, 2), "te": round(te, 3),
            "gt_rot_deg": round(float(ang), 1),
            "winner_score": round(float(scores[win]), 3),
            "runnerup_score": round(float(scores[run]), 3),
            "winner_re": round(lane_res[win][1], 2),
            "oracle_re": round(lane_res[oracle][1], 2),
            "oracle_score": round(float(scores[oracle]), 3),
            "oracle_rank": int(np.nonzero(order == oracle)[0][0]),
            "gt_pose_score": round(float(gt_fit), 3),
        }
        rows.append(row)
        if not ok:
            print("FAIL " + json.dumps(row), flush=True)

    re_all = np.array([r["re_deg"] for r in rows])
    te_all = np.array([r["te"] for r in rows])
    # winner provenance: candidate list = S model-refined lanes then S
    # centroid-matched geometric fallback lanes (register_pairs_robust)
    geo_wins = 0
    for lanes in lane_diag:
        S = len(lanes) // 2
        k = int(np.argmax([sc for sc, _ in lanes]))
        geo_wins += k >= S
    print(json.dumps({
        "ckpt": args.ckpt, "pairs": args.pairs, "starts": args.starts,
        "recall": round(n_pass / len(rows), 3),
        "median_re_deg": round(float(np.median(re_all)), 2),
        "median_te": round(float(np.median(te_all)), 3),
        "failures": int(len(rows) - n_pass),
        "geometric_fallback_win_frac": round(geo_wins / len(rows), 3),
    }), flush=True)
    return rows


if __name__ == "__main__":
    main()
