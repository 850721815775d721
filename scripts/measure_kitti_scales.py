"""Per-scale KITTI-protocol success on fresh synthetic pairs.

The docs/EVAL_SNAPSHOT.md per-scale row (success 0.63 / 0.50 / 0.94 at
256/512/1024 ``--max-points``) was measured on the CLI's fixed 16-pair
synthetic fallback — at n=16 a 0.13 gap is two pairs, so the apparent
512-point "dip" needs a larger fresh sample before it can be called real.
This harness reproduces the exact CLI evaluate-kitti path (synthetic pairs
sized ``max_points // 2``, unit-cube normalization, the −Rᵀt hint and
ICP ``max_iteration=1000`` — `/root/reference/evaluate_kitti.py:39,69`)
at an arbitrary pair count and seed, and optionally reports per-pair
RE/TE so failures can be attributed.

Usage:
    python scripts/measure_kitti_scales.py [--ckpt params/kitti-generator]
        [--pairs 64] [--scales 256 512 1024] [--seed 777] [--per-pair]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="params/kitti-generator")
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--scales", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--per-pair", action="store_true",
                    help="also print per-pair RE/TE (direct register_batch)")
    ap.add_argument("--overlap", type=float, default=0.7)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig, eval_preset
    from scream_tpu.data import PairLoader, SyntheticPairDataset
    from scream_tpu.eval.protocols import evaluate_kitti
    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.pipeline.register import register_batch
    from scream_tpu.utils.checkpoint import load_params

    ec = eval_preset("kitti")
    model = PointTransformer(ModelConfig())

    def apply_fn(p, src, tgt, sm, tm, c):
        return model.apply({"params": p}, src, tgt, sm, tm, c)

    params = None
    for scale in args.scales:
        ds = SyntheticPairDataset(
            length=args.pairs, n_src=scale // 2, n_tgt=scale // 2,
            overlap=args.overlap, normalize="unit_cube", seed=args.seed)
        loader = PairLoader(ds, batch_size=args.batch, src_capacity=scale)
        if params is None:
            b0 = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
            init = model.init(jax.random.PRNGKey(0), b0["src"], b0["tgt"],
                              b0["src_mask"], b0["tgt_mask"],
                              jnp.swapaxes(b0["trans"], -1, -2))["params"]
            params = load_params(args.ckpt, init)
        rec = {"scale": scale, "pairs": args.pairs, "seed": args.seed}
        if args.per_pair:
            # One registration pass: derive the evaluate_kitti aggregates
            # (success_rate / success_rre / success_rte — same formulas as
            # scream_tpu/eval/protocols.py:evaluate_kitti) from the same
            # per-pair metrics that feed the failure table, instead of
            # running the multi-minute ICP-1000 pass twice.
            res, tes, ncs, gtas = [], [], [], []
            for batch in loader:
                dev = {k: jnp.asarray(v) for k, v in batch.items()}
                m = register_batch(
                    apply_fn, params, dev, dis_thresh=ec.dis_thresh,
                    corr="tgt", icp_thresh=ec.icp_thresh,
                    icp_max_iter=ec.icp_max_iter, center_mode=ec.center_mode)
                res.extend(np.asarray(m.re_deg).tolist())
                tes.extend(np.asarray(m.te).tolist())
                ncs.extend(np.asarray(m.n_corr).tolist())
                # GT rotation magnitude per pair (failure attribution).
                tr = np.einsum("bii->b", np.asarray(batch["rot"]))
                gtas.extend(np.degrees(np.arccos(
                    np.clip((tr - 1.0) / 2.0, -1.0, 1.0))).tolist())
            re_a, te_a = np.asarray(res), np.asarray(tes)
            ok = (re_a <= ec.success_re_deg) & (te_a <= ec.success_te)
            rec.update({
                "success_rate": round(float(ok.mean()), 4),
                "success_rre": round(float(re_a[ok].sum() / max(ok.sum(), 1)), 4),
                "success_rte": round(float(te_a[ok].sum() / max(ok.sum(), 1)), 4),
                "n_pairs": len(res),
            })
            fails = [
                {"pair": i, "re_deg": round(r, 2), "te": round(t, 3),
                 "n_corr": int(ncs[i]), "gt_rot_deg": round(gtas[i], 1)}
                for i, (r, t) in enumerate(zip(res, tes))
                if r > ec.success_re_deg or t > ec.success_te
            ]
            rec["n_corr_median"] = int(np.median(ncs))
            rec["gt_rot_median_deg"] = round(float(np.median(gtas)), 1)
            rec["median_re_deg"] = round(float(np.median(res)), 3)
            rec["median_te"] = round(float(np.median(tes)), 4)
            rec["failures"] = fails
        else:
            out = evaluate_kitti(
                apply_fn, params, loader, dis_thresh=ec.dis_thresh,
                icp_thresh=ec.icp_thresh, icp_max_iter=ec.icp_max_iter,
                success_re_deg=ec.success_re_deg, success_te=ec.success_te,
                center_mode=ec.center_mode)
            rec.update({k: round(float(v), 4) for k, v in out.items()})
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
