"""Eval protocols with an oracle model: perfect predictions -> perfect recall.

The oracle must not close over per-batch GT: ``apply_fn`` is a static jit
argument of ``register_batch``, so closed-over arrays are baked in at trace
time and silently reused for later batches. Instead the test datasets carry
an identity GT (src already registered), so the oracle is simply the identity
function.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scream_tpu.data import DEMLoader, PairLoader, SyntheticPairDataset
from scream_tpu.data import transforms
from scream_tpu.data.synthetic import make_dem_patch, make_pair
from scream_tpu.eval import (
    SkipDataset,
    evaluate_3d_match,
    evaluate_3d_zero_match,
    evaluate_kitti,
    evaluate_open_gf,
)


def _identity_oracle(params, src, tgt, src_mask, tgt_mask, src_center):
    """Perfect model under identity GT: the prediction is the source itself."""
    return src


class IdentityGTPairs:
    """Synthetic pairs pre-registered into the target frame: GT = identity.

    Same item schema as SyntheticPairDataset (with info sidecars), but
    ``src`` is already in the target frame and rot/trans are I/0, so a
    closure-free oracle can predict perfectly.
    """

    def __init__(self, length=8, n_src=128, n_tgt=160, overlap=0.9, seed=21,
                 normalize="unit_sphere", with_info=True):
        self.length, self.n_src, self.n_tgt = length, n_src, n_tgt
        self.overlap, self.seed = overlap, seed
        self.normalize, self.with_info = normalize, with_info

    def __len__(self):
        return self.length

    def __getitem__(self, item):
        rng = np.random.default_rng(self.seed * 7919 + item)
        pair = make_pair(rng, self.n_src, self.n_tgt, overlap=self.overlap)
        src_world = pair["src"] @ pair["rot"].T + pair["trans"].reshape(3)
        rot = np.eye(3)
        trans = np.zeros((3, 1))
        norm = (
            transforms.normalize_unit_sphere
            if self.normalize == "unit_sphere"
            else transforms.normalize_unit_cube
        )
        src_n, tgt_n, trans_n, s, c = norm(src_world, pair["tgt"], rot, trans)
        out = {
            "src": src_n.astype(np.float32),
            "tgt": tgt_n.astype(np.float32),
            "rot": rot.astype(np.float32),
            "trans": trans_n.astype(np.float32),
            "scale": np.float32(s),
            "center": c.astype(np.float32),
        }
        if self.with_info:
            out["idx"] = np.array([item * 3, item * 3 + 2], np.int32)
            out["covariance"] = np.eye(6, dtype=np.float32) * float(self.n_src)
            out["scene"] = np.int32(item % 8)
        return out


def _loader(n=8, **kw):
    ds = IdentityGTPairs(length=n, **kw)
    return PairLoader(ds, batch_size=4, src_capacity=128, tgt_capacity=160,
                      num_workers=0)


class TestThreeDMatchProtocol:
    def test_oracle_full_recall_zero_match_mode(self):
        out = evaluate_3d_zero_match(_identity_oracle, None, _loader(),
                                     dis_thresh=10.0)
        assert out["registration_recall"] == 1.0
        assert out["n_pairs"] == 8
        assert out["rre"] < 0.1 and out["rte"] < 1e-3

    def test_oracle_recall_tgt_mode(self):
        """corr="tgt" pairs with subsampled scene points (noise up to the NN
        threshold): bookkeeping exact, recovery approximate."""
        out = evaluate_3d_match(_identity_oracle, None, _loader())
        assert out["registration_recall"] >= 0.5
        assert out["n_pairs"] == 8
        assert np.isfinite(out["rre"]) and np.isfinite(out["rte"])

    def test_per_scene_keys_and_idx_gap_filter(self):
        out = evaluate_3d_match(_identity_oracle, None, _loader())
        scene_keys = [k for k in out if k.startswith("rr/")]
        assert len(scene_keys) == 8  # 8 items -> one pair per scene, gap 2 > 1

    def test_idx_gap_filter_excludes_adjacent_pairs(self, monkeypatch):
        """The PREDATOR |idx1-idx0| > 1 filter must actually drop adjacent
        pairs from the per-scene stats while they still count in the overall
        pair totals (`/root/reference/evaluate_3d_match.py:128-138`). Fixture:
        one scene, two gap-2 pairs that SUCCEED and two gap-1 pairs that
        FAIL — with the filter the scene recall is 1.0; without it, 0.5."""
        from types import SimpleNamespace

        import scream_tpu.eval.protocols as P

        def fake_register_batch(apply_fn, params, batch, **kw):
            return SimpleNamespace(
                re_deg=np.array([1.0, 3.0, 40.0, 50.0]),
                te=np.array([0.1, 0.3, 4.0, 5.0]),
                rmse=np.array([0.1, 0.1, 0.9, 0.9]),
                n_corr=np.array([10] * 4),
            )

        monkeypatch.setattr(P, "register_batch", fake_register_batch)

        class OneBatch:
            def __iter__(self):
                yield {
                    "src": np.zeros((4, 8, 3), np.float32),
                    # gaps: 2, 2, 1, 0 — only the first two pairs are counted
                    # per-scene.
                    "idx": np.array([[0, 2], [5, 7], [10, 11], [20, 20]]),
                    "scene": np.zeros(4, np.int64),
                }

        out = P.evaluate_registration_per_scene(None, None, OneBatch())
        assert out["registration_recall"] == 1.0  # gap<=1 failures filtered
        assert out["rre"] == 2.0  # median([1, 3]): no zero-append from them
        assert out["n_pairs"] == 4  # ...but they count in the overall totals
        assert out["pair_recall"] == 0.5

    def test_missing_covariance_raises_clearly(self):
        """A loader without the redwood info sidecars must fail with a
        diagnostic ValueError, not an opaque NoneType comparison deep in the
        consume loop."""
        loader = _loader(with_info=False)
        with pytest.raises(ValueError, match="covariance sidecars"):
            evaluate_3d_match(_identity_oracle, None, loader)


class TestKitti:
    def test_skip_dataset(self):
        ds = SyntheticPairDataset(length=10, n_src=32, n_tgt=32)
        sd = SkipDataset(ds, (2, 5))
        assert len(sd) == 8

    def test_oracle_success(self):
        ds = IdentityGTPairs(length=4, n_src=128, n_tgt=128, overlap=0.9,
                             seed=5, normalize="unit_cube", with_info=False)
        loader = PairLoader(ds, batch_size=4, src_capacity=128, num_workers=0)
        out = evaluate_kitti(_identity_oracle, None, loader,
                             dis_thresh=10.0, icp_thresh=0.5)
        assert out["success_rate"] == 1.0
        assert out["n_pairs"] == 4


class TestOpenGF:
    def test_oracle_metrics(self):
        class DemDs:
            """DEM prediction == DSM ground-truth trick: dsm := dem so the
            identity apply is a perfect predictor."""

            def __len__(self):
                return 4

            def __getitem__(self, i):
                p = make_dem_patch(np.random.default_rng(i), n_dsm=64, n_dem=64)
                p["dsm"] = p["dem"].copy()
                return p

        loader = DEMLoader(DemDs(), batch_size=2, dsm_capacity=64,
                           dem_capacity=64, coarse_capacity=16, num_workers=0)

        def apply_fn(params, dsm, coarse, dsm_mask, coarse_mask):
            return dsm

        out = evaluate_open_gf(apply_fn, None, loader)
        assert out["chamfer_x1000"] < 1e-4
        assert out["height_mae_x1000"] < 1e-4
        assert out["n_patches"] == 4


class TestCenterHint:
    def test_modes(self, rng):
        """t for 3DMatch vs -R^T t for KITTI (evaluate_kitti.py:39)."""
        from scipy.spatial.transform import Rotation

        from scream_tpu.pipeline.register import gt_center_hint

        R = jnp.asarray(Rotation.random(4, random_state=np.random.RandomState(0))
                        .as_matrix(), jnp.float32)
        t = jnp.asarray(rng.standard_normal((4, 3, 1)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(gt_center_hint(R, t, "trans")),
            np.swapaxes(np.asarray(t), -1, -2), atol=1e-6)
        want = -np.einsum("bji,bjk->bik", np.asarray(R), np.asarray(t))
        np.testing.assert_allclose(
            np.asarray(gt_center_hint(R, t, "neg_rt")),
            np.swapaxes(want, -1, -2), atol=1e-6)
        import pytest

        with pytest.raises(ValueError):
            gt_center_hint(R, t, "nope")


class TestFailedPairZeroAppend:
    def test_failed_pairs_append_zeros_to_scene_stats(self, monkeypatch):
        """Reference appends RE=TE=0 for failed gap>1 pairs
        (evaluate_3d_match.py:136-138), so the per-scene median covers every
        counted pair, not just the successes."""
        from types import SimpleNamespace

        import scream_tpu.eval.protocols as P

        # 4 pairs, one scene, all gap>1: two succeed (RE 2, 4; TE 0.2, 0.4),
        # two fail. Reference semantics: median([2, 4, 0, 0]) = 1.0 and
        # median([0.2, 0.4, 0, 0]) = 0.1; success-only medians would be 3/0.3.
        def fake_register_batch(apply_fn, params, batch, **kw):
            return SimpleNamespace(
                re_deg=np.array([2.0, 4.0, 50.0, 60.0]),
                te=np.array([0.2, 0.4, 5.0, 6.0]),
                rmse=np.array([0.1, 0.1, 0.9, 0.9]),
                n_corr=np.array([10, 10, 10, 10]),
            )

        monkeypatch.setattr(P, "register_batch", fake_register_batch)

        class OneBatch:
            def __iter__(self):
                yield {
                    "src": np.zeros((4, 8, 3), np.float32),
                    "idx": np.array([[0, 5]] * 4),
                    "scene": np.zeros(4, np.int64),
                }

        out = P.evaluate_registration_per_scene(None, None, OneBatch())
        assert out["registration_recall"] == 0.5
        assert out["rre"] == 1.0  # median includes the zero-appended failures
        assert out["rte"] == 0.1
        # Overall success-only aggregates unaffected by the zero-append.
        assert out["success_rre"] == 3.0


class TestAllScenesEmptyRaises:
    def test_zero_counted_pairs_raise_instead_of_nan(self, monkeypatch):
        """When every pair is idx-gap<=1 (nothing counted anywhere), the
        protocol statistic is undefined — the evaluator must raise, not
        return NaN means that look like a (terrible but valid) result."""
        from types import SimpleNamespace

        import scream_tpu.eval.protocols as P

        def fake_register_batch(apply_fn, params, batch, **kw):
            return SimpleNamespace(
                re_deg=np.array([2.0, 4.0]),
                te=np.array([0.2, 0.4]),
                rmse=np.array([0.1, 0.1]),
                n_corr=np.array([10, 10]),
            )

        monkeypatch.setattr(P, "register_batch", fake_register_batch)

        class OneBatch:
            def __iter__(self):
                yield {
                    "src": np.zeros((2, 8, 3), np.float32),
                    # consecutive fragments: gap==1 -> filtered by the
                    # reference's idx-gap>1 rule (evaluate_3d_match.py:128)
                    "idx": np.array([[0, 1]] * 2),
                    "scene": np.zeros(2, np.int64),
                }

        with pytest.raises(ValueError, match="no counted"):
            P.evaluate_registration_per_scene(None, None, OneBatch())


class TestEvalConfigWiring:
    def test_presets(self):
        from scream_tpu.config import eval_preset

        z = eval_preset("3dzeromatch")
        assert (z.corr, z.dis_thresh, z.re_stat) == ("src_pred", 0.2, "mean")
        k = eval_preset("kitti")
        assert (k.icp_max_iter, k.center_mode, k.dis_thresh) == (1000, "neg_rt", 1.5)
        # icp_thresh=1.0 is its own reference anchor
        # (`/root/reference/evaluate_kitti.py:109`) — a regression to the
        # 3DMatch default 0.1 would run KITTI ICP at a 10x-too-tight
        # correspondence distance.
        assert k.icp_thresh == 1.0
        with pytest.raises(ValueError):
            eval_preset("nope")

    def test_task_presets_share_eval_preset(self):
        """The task presets must return the SAME eval knobs as eval_preset()
        — one home for the cited protocol constants, so CLI evaluate and
        train-time validation cannot drift apart."""
        from scream_tpu.config import (
            eval_preset,
            kitti_presets,
            opengf_presets,
            threedmatch_presets,
        )

        assert threedmatch_presets()[3] == eval_preset("3dmatch")
        assert kitti_presets()[3] == eval_preset("kitti")
        assert opengf_presets()[3] == eval_preset("opengf")

    def test_evaluate_registration_honors_every_knob(self, monkeypatch):
        """Every EvalConfig field must reach register_batch / the aggregation
        (VERDICT weak #8: rmse_thresh/re_stat were bypassed)."""
        from scream_tpu.config import EvalConfig
        from scream_tpu.eval import protocols as P

        captured = {}
        real = P.register_batch

        def spy(apply_fn, params, batch, **kw):
            captured.update(kw)
            return real(apply_fn, params, batch, **kw)

        monkeypatch.setattr(P, "register_batch", spy)
        cfg = EvalConfig(dis_thresh=10.0, corr="src_pred", icp_thresh=0.5,
                         icp_max_iter=3, re_stat="mean", rmse_thresh=1e9)
        out = P.evaluate_registration(_identity_oracle, None, _loader(4), cfg)
        assert captured["dis_thresh"] == 10.0
        assert captured["corr"] == "src_pred"
        assert captured["icp_thresh"] == 0.5
        assert captured["icp_max_iter"] == 3
        assert captured["center_mode"] == "trans"
        assert out["registration_recall"] == 1.0

    def test_aggregation_knobs_rmse_thresh_and_re_stat(self, monkeypatch):
        """rmse_thresh and re_stat act on the aggregation side (they never
        reach register_batch), so pin them with controlled metrics where the
        honored and the hardcoded-default results differ: rmse [0.1, 0.25,
        0.3] under thresh 0.28 -> 2/3 recall (default 0.2 would give 1/3),
        and success REs [1, 8] + one zero-append -> mean 3.0 (median 1.0)."""
        from types import SimpleNamespace

        from scream_tpu.config import EvalConfig
        from scream_tpu.eval import protocols as P

        def fake_register_batch(apply_fn, params, batch, **kw):
            return SimpleNamespace(
                re_deg=np.array([1.0, 8.0, 30.0]),
                te=np.array([0.1, 0.8, 3.0]),
                rmse=np.array([0.1, 0.25, 0.3]),
                n_corr=np.array([10] * 3),
            )

        monkeypatch.setattr(P, "register_batch", fake_register_batch)

        class OneBatch:
            def __iter__(self):
                yield {
                    "src": np.zeros((3, 8, 3), np.float32),
                    "idx": np.array([[0, 2]] * 3),
                    "scene": np.zeros(3, np.int64),
                }

        cfg = EvalConfig(re_stat="mean", rmse_thresh=0.28)
        out = P.evaluate_registration(None, None, OneBatch(), cfg)
        assert out["registration_recall"] == pytest.approx(2.0 / 3.0)
        assert out["rre"] == pytest.approx(3.0)  # mean([1, 8, 0]), not median
        assert out["rte"] == pytest.approx(0.3)  # mean([0.1, 0.8, 0])
