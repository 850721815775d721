"""Chunked/requeued batched ICP must be indistinguishable from the
continuous vmapped loop — the straggler mitigation for the KITTI protocol's
ICP ``max_iteration=1000`` (`/root/reference/evaluate_kitti.py:69`) may not
change a single protocol number."""

import numpy as np
import jax.numpy as jnp
import pytest

from scream_tpu.geometry.icp import _pow2_bucket, registration_icp_batched
from scream_tpu.pipeline import register_batch, register_batch_requeue

from test_pipeline_register import _batch, _oracle


def _lanes(B=5, N=100, seed=0):
    """B pairs whose per-lane noise differs -> different convergence speeds
    (the straggler scenario the compaction exists for)."""
    rng = np.random.default_rng(seed)
    srcs, tgts = [], []
    for i in range(B):
        s = rng.standard_normal((N, 3)).astype(np.float32)
        ang = 0.1 + 0.15 * i
        c, sn = np.cos(ang), np.sin(ang)
        R = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]], np.float32)
        t = rng.standard_normal(3).astype(np.float32) * 0.1
        noise = rng.standard_normal((N, 3)).astype(np.float32) * (0.001 * (i + 1))
        srcs.append(s)
        tgts.append(s @ R.T + t + noise)
    return (jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(tgts)),
            jnp.ones((B, N), bool), jnp.ones((B, N), bool))


class TestChunkedEqualsContinuous:
    def setup_method(self):
        self.src, self.tgt, self.sm, self.tm = _lanes()

    def _run(self, chunk, max_iteration=50):
        return registration_icp_batched(
            self.src, self.tgt, 0.5, max_iteration=max_iteration,
            src_mask=self.sm, tgt_mask=self.tm, chunk=chunk,
        )

    @pytest.mark.parametrize("chunk", [1, 3, 7, 64])
    def test_transforms_iterations_match_exactly(self, chunk):
        ref = self._run(chunk=None)
        # Sanity: the lanes genuinely converge at different counts.
        assert len(set(np.asarray(ref.iterations).tolist())) >= 3
        got = self._run(chunk=chunk)
        # The carried convergence state reproduces the continuous loop's
        # iterate sequence. These fixed scenarios sit far from the 1e-6
        # convergence knife edge, so transforms and iteration counts match
        # exactly; near the edge fp graph differences can add one no-op
        # iteration (see test_randomized_equivalence).
        np.testing.assert_array_equal(np.asarray(got.transformation),
                                      np.asarray(ref.transformation))
        np.testing.assert_array_equal(np.asarray(got.iterations),
                                      np.asarray(ref.iterations))
        # Final metrics recompute in a different fused graph: tiny fp slack.
        np.testing.assert_allclose(np.asarray(got.fitness),
                                   np.asarray(ref.fitness), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.inlier_rmse),
                                   np.asarray(ref.inlier_rmse), atol=1e-5)

    def test_budget_exhaustion_mid_chunk(self):
        """max_iteration not a chunk multiple: exhausted lanes return the
        same T_pending the continuous loop does."""
        ref = self._run(chunk=None, max_iteration=4)
        got = self._run(chunk=3, max_iteration=4)
        np.testing.assert_array_equal(np.asarray(got.transformation),
                                      np.asarray(ref.transformation))
        np.testing.assert_array_equal(np.asarray(got.iterations),
                                      np.asarray(ref.iterations))

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
    def test_randomized_equivalence(self, seed):
        """Property: for random lane counts (incl. 1), random masked padding,
        random chunk sizes and budgets, the chunked driver's transforms and
        iteration counts equal the continuous loop's — lane-bookkeeping edge
        cases (simultaneous retirement, odd lane counts, full-batch
        exhaustion) included."""
        rng = np.random.default_rng(100 + seed)
        B = int(rng.integers(1, 7))
        N = 64
        srcs, tgts, masks = [], [], []
        for i in range(B):
            n_real = int(rng.integers(20, N + 1))
            s = rng.standard_normal((N, 3)).astype(np.float32)
            ang = float(rng.uniform(0.05, 0.4))
            c, sn = np.cos(ang), np.sin(ang)
            R = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]], np.float32)
            noise = rng.standard_normal((N, 3)).astype(np.float32) * \
                float(rng.uniform(0.0, 0.01))
            srcs.append(s)
            tgts.append(s @ R.T + noise)
            m = np.zeros(N, bool)
            m[:n_real] = True
            masks.append(m)
        src = jnp.asarray(np.stack(srcs))
        tgt = jnp.asarray(np.stack(tgts))
        sm = jnp.asarray(np.stack(masks))
        chunk = int(rng.integers(1, 9))
        max_it = int(rng.integers(1, 30))

        kw = dict(max_iteration=max_it, src_mask=sm, tgt_mask=sm)
        ref = registration_icp_batched(src, tgt, 0.5, **kw)
        got = registration_icp_batched(src, tgt, 0.5, chunk=chunk, **kw)
        np.testing.assert_allclose(np.asarray(got.transformation),
                                   np.asarray(ref.transformation),
                                   atol=1e-5,
                                   err_msg=f"B={B} chunk={chunk} "
                                           f"max_it={max_it}")
        # The two paths compile different graphs; when a convergence delta
        # sits within fp reduction noise of the 1e-6 criteria, one path can
        # run ONE extra iteration from the already-converged fixed point
        # (transform unchanged). Anything beyond +-1 is a bookkeeping bug.
        assert int(np.max(np.abs(np.asarray(got.iterations)
                                 - np.asarray(ref.iterations)))) <= 1

    def test_bad_chunk_raises(self):
        with pytest.raises(ValueError, match="chunk"):
            self._run(chunk=0)


class TestPow2Bucket:
    def test_values(self):
        assert [_pow2_bucket(n) for n in (1, 2, 3, 4, 5, 8, 9)] == \
            [1, 2, 4, 4, 8, 8, 16]


class TestRegisterBatchRequeue:
    def test_matches_fused_register_batch(self):
        """The eval-path wrapper: same metrics as the fused jit, noisy oracle
        so ICP has real work and acceptance actually gates."""
        b = _batch(with_info=True)
        params = (b["rot"], b["trans"])
        fused = register_batch(_oracle(noise=0.01), params, b,
                               dis_thresh=10.0, corr="src_pred",
                               icp_thresh=0.1, icp_max_iter=20)
        requeued = register_batch_requeue(_oracle(noise=0.01), params, b,
                                          dis_thresh=10.0, corr="src_pred",
                                          icp_thresh=0.1, icp_max_iter=20,
                                          icp_chunk=3)
        np.testing.assert_allclose(np.asarray(requeued.transform),
                                   np.asarray(fused.transform), atol=1e-5)
        np.testing.assert_allclose(np.asarray(requeued.re_deg),
                                   np.asarray(fused.re_deg), atol=1e-4)
        np.testing.assert_allclose(np.asarray(requeued.te),
                                   np.asarray(fused.te), atol=1e-5)
        np.testing.assert_allclose(np.asarray(requeued.rmse),
                                   np.asarray(fused.rmse), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(requeued.n_corr),
                                      np.asarray(fused.n_corr))

    def test_kitti_protocol_numbers_unchanged(self):
        """evaluate_kitti(icp_chunk=...) returns the same protocol dict."""
        from scream_tpu.data import PairLoader, SyntheticPairDataset
        from scream_tpu.eval.protocols import evaluate_kitti

        ds = SyntheticPairDataset(length=6, n_src=180, n_tgt=200, seed=3,
                                  normalize="unit_cube")
        mk = lambda: PairLoader(ds, batch_size=3, src_capacity=256,
                                tgt_capacity=256, num_workers=0)

        # The GT-oracle can't thread per-batch rot/trans through the
        # protocol loop (params are fixed), so use a model that predicts src
        # unchanged: the Kabsch init is identity-ish and ICP does the
        # aligning — real per-lane iteration spread. dis_thresh large keeps
        # every correspondence valid.
        def identity_model(params, src, tgt, sm, tm, c):
            return src

        base = evaluate_kitti(identity_model, None, mk(), dis_thresh=100.0,
                              icp_thresh=0.5, icp_max_iter=15)
        req = evaluate_kitti(identity_model, None, mk(), dis_thresh=100.0,
                             icp_thresh=0.5, icp_max_iter=15, icp_chunk=4)
        assert base["n_pairs"] == req["n_pairs"] == 6
        assert base["success_rate"] == pytest.approx(req["success_rate"])
        assert base["success_rre"] == pytest.approx(req["success_rre"], abs=1e-4)
        assert base["success_rte"] == pytest.approx(req["success_rte"], abs=1e-5)

    def test_kitti_mesh_plus_chunk(self):
        """--mesh and --icp-chunk compose: the chunk loop's host-side lane
        gathers reshard transparently under GSPMD (data-sharded batches,
        pow2-compacted lane counts not divisible by the axis included)."""
        import jax

        from scream_tpu.data import PairLoader, SyntheticPairDataset
        from scream_tpu.eval.protocols import evaluate_kitti
        from scream_tpu.parallel.mesh import make_mesh

        def identity_model(params, src, tgt, sm, tm, c):
            return src

        ds = SyntheticPairDataset(length=8, n_src=180, n_tgt=200, seed=5,
                                  normalize="unit_cube")
        mk = lambda: PairLoader(ds, batch_size=4, src_capacity=256,
                                tgt_capacity=256, num_workers=0)
        mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
        base = evaluate_kitti(identity_model, None, mk(), dis_thresh=100.0,
                              icp_thresh=0.5, icp_max_iter=25)
        got = evaluate_kitti(identity_model, None, mk(), dis_thresh=100.0,
                             icp_thresh=0.5, icp_max_iter=25, mesh=mesh,
                             icp_chunk=3)
        assert got["n_pairs"] == base["n_pairs"] == 8
        assert got["success_rate"] == pytest.approx(base["success_rate"])
        assert got["success_rre"] == pytest.approx(base["success_rre"],
                                                   abs=1e-3)
