"""Benchmark: 3DMatch-style registration throughput on one chip.

Measures the full registration path — flagship PointTransformer forward
(d_model 256, 6+6 layers, bf16), squared-distance correspondence search,
weighted Kabsch, batched ICP refinement — on padded 4096-point pairs, the
shape class of 3DMatch after voxel downsampling at 0.0625
(`/root/reference/process_3d_match.py:30`).

The reference runs this one pair at a time with CPU SVD and C++ ICP hops
(~1 pair per forward, SURVEY.md §6); the north-star target is >= 50
pairs/sec/chip (BASELINE.json). Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "pairs/sec", "vs_baseline": N}``.
"""

import json
import sys
import time

BASELINE_PAIRS_PER_SEC = 50.0  # north-star target, BASELINE.json
BATCH = 16
N_POINTS = 4096
ITERS = 10
ICP_ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig
    from scream_tpu.data import PairLoader, SyntheticPairDataset
    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.pipeline.register import register_batch

    model = PointTransformer(ModelConfig())

    # DISTINCT batch per timed iteration: the remote-TPU runtime caches
    # repeated identical dispatches, so re-running one batch reports cache
    # hits, not compute. Results are fetched to host to force completion.
    ds = SyntheticPairDataset(
        length=BATCH * (ITERS + 1), n_src=N_POINTS - 256, n_tgt=N_POINTS - 64,
        seed=0,
    )
    loader = PairLoader(
        ds, batch_size=BATCH, src_capacity=N_POINTS, tgt_capacity=N_POINTS,
        num_workers=8, prefetch=4,
    )
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in loader]

    rng = jax.random.PRNGKey(0)
    b0 = batches[0]
    params = model.init(
        rng, b0["src"], b0["tgt"], b0["src_mask"], b0["tgt_mask"],
        jnp.swapaxes(b0["trans"], -1, -2),
    )["params"]

    def apply_fn(params, src, tgt, src_mask, tgt_mask, src_center):
        return model.apply({"params": params}, src, tgt, src_mask, tgt_mask, src_center)

    def run(b):
        m = register_batch(
            apply_fn, params, b,
            dis_thresh=0.1, corr="tgt", icp_thresh=0.1, icp_max_iter=ICP_ITERS,
        )
        np.asarray(m.transform)  # host fetch = hard completion barrier
        return m

    t0 = time.time()
    m = run(batches[0])  # compile + first run
    compile_s = time.time() - t0

    t0 = time.time()
    for b in batches[1:]:
        m = run(b)
    elapsed = time.time() - t0
    pairs_per_sec = BATCH * ITERS / elapsed

    result = {
        "metric": "3dmatch_registration_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(
        f"# backend={jax.default_backend()} batch={BATCH} n_points={N_POINTS} "
        f"icp_iters={ICP_ITERS} compile={compile_s:.1f}s "
        f"steady={elapsed / ITERS * 1e3:.1f}ms/batch "
        f"median_re_deg={float(jnp.median(m.re_deg)):.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
