"""Data layer: augmentation GT-consistency, normalization invariants, batching."""

import numpy as np
import pytest

from scream_tpu.data import (
    PairLoader,
    SyntheticPairDataset,
    bucket_for,
    collate_pairs,
    pad_cloud,
)
from scream_tpu.data import transforms
from scream_tpu.data.synthetic import make_dem_patch, make_pair


def _apply(T, pts):
    return pts @ T[:3, :3].T + T[:3, 3]


class TestTransforms:
    def test_sample_small_se3_is_rigid(self, rng):
        T = transforms.sample_small_se3(rng, std=0.1)
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) == pytest.approx(1.0)

    def test_sample_small_statistics(self):
        rng = np.random.default_rng(0)
        angles = []
        for _ in range(500):
            T = transforms.sample_small_se3(rng, std=0.1)
            tr = np.trace(T[:3, :3])
            angles.append(np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1))))
        # angle ~ |N(0, (0.1*pi/sqrt(3))^2)| -> mean |angle| ~ 8.3 deg.
        assert 5.0 < np.mean(angles) < 13.0

    @pytest.mark.parametrize("both_sides", [True, False])
    def test_augment_preserves_gt(self, rng, both_sides):
        """After augmentation, T still registers src onto the same physical scene."""
        pair = make_pair(rng, 128, 128, overlap=1.0)
        T = np.eye(4)
        T[:3, :3], T[:3, 3:] = pair["rot"], pair["trans"]
        src_world = _apply(T, pair["src"])  # src in the tgt frame, pre-augment

        src_a, tgt_a, T_a = transforms.augment_pair(
            rng, pair["src"], pair["tgt"], T,
            jitter_std=0.0, perturb_both_sides=both_sides,
        )
        # The same physical correspondence must hold: T_a maps augmented src
        # onto where those points now live relative to the augmented tgt. When
        # only src is perturbed, T_a @ src_a == original registered position.
        got = _apply(T_a, src_a)
        if not both_sides:
            np.testing.assert_allclose(got, src_world, atol=1e-9)
        else:
            # Perturbing tgt moves the registered frame by the same perturb:
            # registered src and tgt must stay mutually consistent. Check via
            # the pairwise structure: distances between registered src points
            # and tgt points are invariant under the (rigid) frame change.
            d0 = np.linalg.norm(src_world[:5, None] - pair["tgt"][None, :5], axis=-1)
            d1 = np.linalg.norm(got[:5, None] - tgt_a[None, :5], axis=-1)
            np.testing.assert_allclose(d0, d1, atol=1e-8)

    def test_unit_sphere_normalization(self, rng):
        pair = make_pair(rng, 200, 250, overlap=0.8)
        src_n, tgt_n, trans_n, s, c = transforms.normalize_unit_sphere(
            pair["src"], pair["tgt"], pair["rot"], pair["trans"]
        )
        # Registered union has max radius 1 around the origin.
        reg = np.concatenate([src_n @ pair["rot"].T + trans_n.reshape(3), tgt_n])
        radius = np.linalg.norm(reg - reg.mean(0), axis=1).max()
        assert radius == pytest.approx(1.0, abs=1e-5)
        # GT still holds in the normalized frame for true correspondences:
        # normalized(T x) == rot @ normalized(x) + trans_n.
        x = pair["src"][:10]
        lhs = s * (_apply(np.vstack([np.hstack([pair["rot"], pair["trans"]]), [[0, 0, 0, 1]]]), x) - c)
        rhs = (s * (x - c)) @ pair["rot"].T + trans_n.reshape(3)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_unit_cube_normalization(self, rng):
        pair = make_pair(rng, 200, 200, overlap=0.8)
        src_n, tgt_n, trans_n, s, c = transforms.normalize_unit_cube(
            pair["src"], pair["tgt"], pair["rot"], pair["trans"]
        )
        reg = np.concatenate([src_n @ pair["rot"].T + trans_n.reshape(3), tgt_n])
        assert (reg.max(0) - reg.min(0)).max() == pytest.approx(2.0, abs=1e-5)


class TestSynthetic:
    def test_pair_gt_exact_for_full_overlap(self, rng):
        pair = make_pair(rng, 256, 256, overlap=1.0)
        T = np.eye(4)
        T[:3, :3], T[:3, 3:] = pair["rot"], pair["trans"]
        src_world = _apply(T, pair["src"])
        # Every registered src point lies exactly on some scene point that the
        # tgt pool also drew from: NN distance should be tiny for most points.
        d = np.linalg.norm(src_world[:, None] - pair["tgt"][None], axis=-1).min(1)
        assert np.median(d) < 0.2

    def test_zero_overlap_regime(self, rng):
        pair = make_pair(rng, 128, 128, overlap=0.0)
        assert pair["src"].shape == (128, 3)

    def test_extent_scales_scene_and_gt_holds(self, rng):
        """extent=40 yields a KITTI-class ~80 m metric scene (the bench's
        protocol-selectivity fixture); GT still registers src onto tgt and
        the whole geometry scales linearly (extent=1 is the historic case)."""
        pair = make_pair(rng, 256, 256, overlap=1.0, extent=40.0)
        span = pair["tgt"].max(0) - pair["tgt"].min(0)
        assert span.max() > 50.0, span
        T = np.eye(4)
        T[:3, :3], T[:3, 3:] = pair["rot"], pair["trans"]
        src_world = _apply(T, pair["src"])
        d = np.linalg.norm(src_world[:, None] - pair["tgt"][None], axis=-1).min(1)
        # Median NN residual scales with the scene: 0.2 * extent.
        assert np.median(d) < 0.2 * 40.0
        # extent=1 reproduces the historic (pre-knob) geometry bit-for-bit —
        # the default-arg contract every existing fixture relies on. (The
        # scene is NOT an exact scale-up across extents: the ground
        # undulation sin(3*xy) is deliberately phase-true to the metric
        # frame, like real terrain.)
        pair_default = make_pair(np.random.default_rng(7), 64, 64, overlap=1.0)
        pair1 = make_pair(np.random.default_rng(7), 64, 64, overlap=1.0,
                          extent=1.0)
        np.testing.assert_array_equal(pair1["src"], pair_default["src"])
        np.testing.assert_array_equal(pair1["trans"], pair_default["trans"])

    def test_dem_patch(self, rng):
        patch = make_dem_patch(rng, 300, 400)
        assert patch["dsm"].shape == (300, 3)
        assert patch["dem"].shape == (400, 3)
        # DSM has raised clutter: its z range exceeds the DEM's.
        assert patch["dsm"][:, 2].max() > patch["dem"][:, 2].max() + 0.05


class TestBatching:
    def test_pad_cloud(self, rng):
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        out, mask = pad_cloud(pts, 16)
        assert out.shape == (16, 3) and mask.sum() == 10
        np.testing.assert_array_equal(out[:10], pts)
        with pytest.raises(ValueError):
            pad_cloud(pts, 8)

    def test_bucket_for(self):
        assert bucket_for(100, (128, 256, 512)) == 128
        assert bucket_for(129, (128, 256, 512)) == 256
        with pytest.raises(ValueError):
            bucket_for(1000, (128, 256))

    def test_collate_and_loader(self):
        ds = SyntheticPairDataset(length=7, n_src=64, n_tgt=80, seed=1)
        loader = PairLoader(ds, batch_size=4, src_capacity=64, tgt_capacity=96,
                            shuffle=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["src"].shape == (4, 64, 3)
        assert b["tgt"].shape == (4, 96, 3)
        assert b["tgt_mask"].sum(axis=1).tolist() == [80] * 4
        assert b["trans"].shape == (4, 3, 1)

    def test_collate_with_info(self):
        ds = SyntheticPairDataset(length=3, n_src=32, n_tgt=32, with_info=True)
        b = collate_pairs([ds[i] for i in range(3)], 32)
        assert b["covariance"].shape == (3, 6, 6)
        assert b["idx"].shape == (3, 2)

    def test_deterministic_items(self):
        ds = SyntheticPairDataset(length=4, n_src=32, n_tgt=32, seed=5)
        a, b = ds[2], ds[2]
        np.testing.assert_array_equal(a["src"], b["src"])


class TestCapacityCap:
    def test_oversize_clouds_subsampled(self, tmp_path, rng):
        import os

        split = tmp_path / "3DMatch_test"
        split.mkdir(parents=True)
        np.save(split / "src0.npy", rng.standard_normal((700, 3)))
        np.save(split / "tgt0.npy", rng.standard_normal((900, 3)))
        np.save(split / "T0.npy", np.eye(4))
        from scream_tpu.data import PairDataset

        ds = PairDataset(str(tmp_path), "3DMatch_test", max_points=512)
        item = ds[0]
        assert item["src"].shape[0] == 512
        assert item["tgt"].shape[0] == 512
        # deterministic: same item twice -> same subsample
        np.testing.assert_array_equal(ds[0]["src"], item["src"])
        # strict mode errors downstream (pad_cloud), not silently
        ds_strict = PairDataset(str(tmp_path), "3DMatch_test")
        assert ds_strict[0]["src"].shape[0] == 700


class TestDevicePrefetch:
    def test_prefetch_preserves_order_and_content(self):
        from scream_tpu.data import prefetch_to_device

        batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def test_prefetch_short_iterator(self):
        from scream_tpu.data import prefetch_to_device

        out = list(prefetch_to_device(iter([{"x": np.ones(3, np.float32)}]), size=4))
        assert len(out) == 1

    def test_prefetch_empty(self):
        from scream_tpu.data import prefetch_to_device

        assert list(prefetch_to_device(iter([]), size=2)) == []


class TestBucketedLoader:
    def _make_artifacts(self, tmp_path, sizes):
        import os

        split = tmp_path / "3DMatch_test"
        split.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        for i, (ns, nt) in enumerate(sizes):
            np.save(split / f"src{i}.npy", rng.standard_normal((ns, 3)))
            np.save(split / f"tgt{i}.npy", rng.standard_normal((nt, 3)))
            np.save(split / f"T{i}.npy", np.eye(4))
        from scream_tpu.data import PairDataset

        return PairDataset(str(tmp_path), "3DMatch_test")

    def test_buckets_group_by_size(self, tmp_path):
        from scream_tpu.data import BucketedPairLoader

        sizes = [(100, 120), (90, 110), (600, 650), (700, 580), (100, 90), (95, 105)]
        ds = self._make_artifacts(tmp_path, sizes)
        loader = BucketedPairLoader(ds, batch_size=2, buckets=(128, 1024),
                                    num_workers=0)
        batches = list(loader)
        assert len(batches) == len(loader)
        caps = sorted(b["src"].shape[1] for b in batches)
        # four small pairs -> two 128-capacity batches; two big -> one 1024
        assert caps == [128, 128, 1024]
        for b in batches:
            # masks tight: every batch has at least one real point per row
            assert np.all(b["src_mask"].sum(axis=1) > 0)

    def test_interleave_and_drop_last(self, tmp_path):
        from scream_tpu.data import BucketedPairLoader

        sizes = [(50, 50)] * 5
        ds = self._make_artifacts(tmp_path, sizes)
        loader = BucketedPairLoader(ds, batch_size=2, buckets=(64,),
                                    drop_last=True, num_workers=0)
        assert len(list(loader)) == 2  # 5 items -> 2 full batches

    def test_size_probe_respects_cap(self, tmp_path):
        from scream_tpu.data import BucketedPairLoader, PairDataset

        sizes = [(500, 400)]
        self._make_artifacts(tmp_path, sizes)
        ds = PairDataset(str(tmp_path), "3DMatch_test", max_points=128)
        loader = BucketedPairLoader(ds, batch_size=1, buckets=(128, 1024),
                                    num_workers=0)
        b = next(iter(loader))
        assert b["src"].shape[1] == 128  # capped cloud lands in the small bucket


class TestHostShardDataset:
    def test_disjoint_cover(self):
        from scream_tpu.data import HostShardDataset

        base = list(range(23))
        shards = [HostShardDataset(base, shard=k, count=4) for k in range(4)]
        seen = []
        for sh in shards:
            items = [sh[i] for i in range(len(sh))]
            assert len(items) == len(sh)
            seen.extend(items)
        assert sorted(seen) == base  # disjoint, complete

    def test_defaults_single_process(self):
        from scream_tpu.data import HostShardDataset

        sh = HostShardDataset(list(range(5)))  # process 0 of 1
        assert [sh[i] for i in range(len(sh))] == [0, 1, 2, 3, 4]

    def test_out_of_range(self):
        import pytest

        from scream_tpu.data import HostShardDataset

        sh = HostShardDataset(list(range(5)), shard=1, count=2)
        assert len(sh) == 2
        with pytest.raises(IndexError):
            sh[2]


class TestLoaderRobustness:
    def test_worker_error_propagates(self):
        """A dataset error in the threaded path must raise promptly, not hang
        the consumer on a queue that never gets its sentinel."""
        from scream_tpu.data import PairLoader

        class Bad:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i == 5:
                    raise FileNotFoundError("src5.npy missing")
                rng = np.random.default_rng(i)
                return {
                    "src": rng.standard_normal((16, 3)).astype(np.float32),
                    "tgt": rng.standard_normal((16, 3)).astype(np.float32),
                    "rot": np.eye(3, dtype=np.float32),
                    "trans": np.zeros((3, 1), np.float32),
                }

        loader = PairLoader(Bad(), batch_size=4, src_capacity=32, num_workers=2)
        with pytest.raises(FileNotFoundError):
            for _ in loader:
                pass

    def test_abandoned_iteration_releases_producer(self):
        """Breaking out mid-iteration must unblock the producer thread; a
        fresh full iteration afterwards still works."""
        import threading

        from scream_tpu.data import PairLoader, SyntheticPairDataset

        ds = SyntheticPairDataset(length=16, n_src=16, n_tgt=16)
        loader = PairLoader(ds, batch_size=2, src_capacity=32, num_workers=2,
                            prefetch=1)
        before = threading.active_count()
        for _ in range(3):
            for batch in loader:
                break  # abandon with the queue full
        assert sum(1 for _ in loader) == len(loader)
        # Producer threads from the abandoned iterations must wind down.
        import time

        for _ in range(50):
            if threading.active_count() <= before + 1:
                break
            time.sleep(0.1)
        assert threading.active_count() <= before + 1


class TestAugmentationRNG:
    def test_per_item_reproducible_any_order(self):
        """Augmentation draws are per-(item, visit): reading items in any
        order or from any thread interleaving yields identical augmented
        data for a given epoch."""
        from scream_tpu.data import SyntheticPairDataset

        a = SyntheticPairDataset(length=6, n_src=32, n_tgt=32, augment=True, seed=3)
        b = SyntheticPairDataset(length=6, n_src=32, n_tgt=32, augment=True, seed=3)
        fwd = [a[i]["src"] for i in range(6)]
        rev = [b[i]["src"] for i in reversed(range(6))][::-1]
        for x, y in zip(fwd, rev):
            np.testing.assert_array_equal(x, y)

    def test_fresh_augmentation_per_epoch(self):
        from scream_tpu.data import SyntheticPairDataset

        ds = SyntheticPairDataset(length=2, n_src=32, n_tgt=32, augment=True, seed=3)
        e0 = ds[0]["src"]
        e1 = ds[0]["src"]  # second visit = next epoch
        assert not np.array_equal(e0, e1)


class TestRawUnionNormalization:
    def test_unit_sphere_raw_matches_register_pair_and_keeps_gt(self):
        """unit_sphere_raw centers on the UN-registered union — identical to
        pipeline.register_pair's GT-free normalization — while the re-derived
        translation keeps the GT exact: tgt_n == R src_n + t_n for true
        correspondences."""
        from scream_tpu.data import transforms

        rng = np.random.default_rng(8)
        src = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
        R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = rng.standard_normal((3, 1)) * 0.3
        tgt = (src @ R.T + t.reshape(3)).astype(np.float32)

        src_n, tgt_n, t_n, s, c = transforms.normalize_unit_sphere_raw(
            src, tgt, R, t)
        # register_pair's normalization: mean/max-radius of the raw union.
        union = np.concatenate([src, tgt])
        np.testing.assert_allclose(c, union.mean(0), atol=1e-6)
        np.testing.assert_allclose(
            s, 1.0 / np.max(np.linalg.norm(union - c, axis=1)), rtol=1e-6)
        # GT exactness in the normalized frame.
        np.testing.assert_allclose(
            tgt_n, src_n @ R.T + t_n.reshape(3), atol=1e-5)

    def test_unit_cube_raw_keeps_gt_and_matches_bbox(self):
        from scream_tpu.data import transforms

        rng = np.random.default_rng(12)
        src = rng.uniform(-4, 4, (60, 3)).astype(np.float32)
        R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = rng.standard_normal((3, 1)) * 0.5
        tgt = (src @ R.T + t.reshape(3)).astype(np.float32)
        src_n, tgt_n, t_n, s, c = transforms.normalize_unit_cube_raw(
            src, tgt, R, t)
        union = np.concatenate([src, tgt])
        lo, hi = union.min(0), union.max(0)
        np.testing.assert_allclose(c, (lo + hi) / 2, atol=1e-6)
        np.testing.assert_allclose(s, 2.0 / np.max(hi - lo), rtol=1e-6)
        np.testing.assert_allclose(
            tgt_n, src_n @ R.T + t_n.reshape(3), atol=1e-5)


class TestLoaderPrefetchClamp:
    def test_prefetch_zero_stays_bounded(self):
        """queue.Queue treats maxsize<=0 as UNBOUNDED — prefetch=0 must not
        let the producer buffer the whole epoch (it is clamped to 1)."""
        from scream_tpu.data import PairLoader, SyntheticPairDataset

        ds = SyntheticPairDataset(length=6, n_src=32, n_tgt=32)
        loader = PairLoader(ds, batch_size=2, src_capacity=32, prefetch=0)
        batches = list(loader)
        assert len(batches) == 3  # iterates correctly with the clamped queue


class TestSceneNamesFailFast:
    def test_with_info_missing_scene_names_raises(self, tmp_path):
        """with_info=True without info/scene_names.txt must fail fast — a
        silent None would collate every pair to scene 0 and collapse the
        per-scene recall protocol (the reference opens the file
        unconditionally, three_d_match.py:224-226)."""
        from scream_tpu.data.datasets import PairDataset

        d = tmp_path / "my_split"
        info = d / "info"
        info.mkdir(parents=True)
        np.save(d / "src0.npy", np.zeros((8, 3), np.float32))
        np.save(d / "tgt0.npy", np.zeros((8, 3), np.float32))
        np.save(d / "T0.npy", np.eye(4, dtype=np.float32))
        np.save(info / "idx0.npy", np.array([0, 2]))
        np.save(info / "covariance0.npy", np.eye(6, dtype=np.float32))
        with pytest.raises(FileNotFoundError, match="scene_names"):
            PairDataset(str(tmp_path), "my_split", with_info=True)


class TestPerturbStdWiring:
    def test_pair_dataset_forwards_perturb_std(self, tmp_path):
        """DataConfig.augment_perturb_std must actually reach augment_pair:
        perturb_std=0 + jitter_std=0 makes the augmented item identical to
        the unaugmented one (the knob was previously dropped on the floor
        and 0.1 always used)."""
        from scream_tpu.data.datasets import PairDataset

        rng = np.random.default_rng(5)
        d = tmp_path / "my_split"
        d.mkdir()
        np.save(d / "src0.npy", rng.standard_normal((32, 3)).astype(np.float32))
        np.save(d / "tgt0.npy", rng.standard_normal((32, 3)).astype(np.float32))
        np.save(d / "T0.npy", np.eye(4, dtype=np.float32))

        plain = PairDataset(str(tmp_path), "my_split", augment=False)[0]
        frozen = PairDataset(str(tmp_path), "my_split", augment=True,
                             perturb_std=0.0, jitter_std=0.0)[0]
        np.testing.assert_allclose(frozen["src"], plain["src"], atol=1e-6)
        np.testing.assert_allclose(frozen["rot"], plain["rot"], atol=1e-6)
        # ...and a nonzero std perturbs (sanity that augment still runs).
        moved = PairDataset(str(tmp_path), "my_split", augment=True,
                            perturb_std=0.1, jitter_std=0.0)[0]
        assert not np.allclose(moved["rot"], plain["rot"], atol=1e-6)


class TestCanonicalSizes:
    def test_truncated_split_warns(self, tmp_path):
        from scream_tpu.data.datasets import PairDataset

        d = tmp_path / "3DMatch_test"
        d.mkdir()
        for i in range(2):  # canonical size is 1,253
            np.save(d / f"src{i}.npy", np.zeros((4, 3), np.float32))
            np.save(d / f"tgt{i}.npy", np.zeros((4, 3), np.float32))
            np.save(d / f"T{i}.npy", np.eye(4, dtype=np.float32))
        with pytest.warns(UserWarning, match="truncated"):
            PairDataset(str(tmp_path), "3DMatch_test")

    def test_noncanonical_split_silent(self, tmp_path):
        import warnings as _w

        from scream_tpu.data.datasets import PairDataset

        d = tmp_path / "my_custom_split"
        d.mkdir()
        with _w.catch_warnings():
            _w.simplefilter("error")
            PairDataset(str(tmp_path), "my_custom_split")


class TestKittiAugmentConvention:
    def test_extrinsic_zyx_matches_scipy(self):
        """The KITTI augmentation rotation is scipy's extrinsic 'zyx'
        (`/root/reference/datasets/kitti.py:164-165`), i.e. Rx @ Ry @ Rz."""
        from scipy.spatial.transform import Rotation

        from scream_tpu.data.raw import extrinsic_zyx_rotation

        rng = np.random.default_rng(0)
        for _ in range(5):
            e = rng.random(3) * 2 * np.pi
            np.testing.assert_allclose(
                extrinsic_zyx_rotation(e),
                Rotation.from_euler("zyx", e).as_matrix(),
                atol=1e-12,
            )


class TestCollatedCache:
    """Pre-collated bucket-shard cache (`data/collated.py`): the at-scale
    eval fast path must reproduce the bucketed loader's batches exactly
    (same bucket ladder, same padding, same sidecars) with zero per-item
    work at stream time."""

    def _ds(self, tmp_path, n=11, with_info=False):
        split = tmp_path / "3DMatch_test"
        info = split / "info"
        info.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(3)
        names = []
        for i in range(n):
            ns = int(rng.integers(50, 1500))
            nt = int(rng.integers(50, 1500))
            np.save(split / f"src{i}.npy", rng.standard_normal((ns, 3)))
            np.save(split / f"tgt{i}.npy", rng.standard_normal((nt, 3)))
            np.save(split / f"T{i}.npy", np.eye(4))
            if with_info:
                np.save(info / f"covariance{i}.npy",
                        np.eye(6, dtype=np.float32))
                np.save(info / f"idx{i}.npy", np.asarray([i, i + 2]))
                names.append("7-scenes-redkitchen")
        if with_info:
            (info / "scene_names.txt").write_text("\n".join(names) + "\n")
        from scream_tpu.data import PairDataset

        return PairDataset(str(tmp_path), "3DMatch_test",
                           with_info=with_info)

    def _cat_by_cap(self, loader):
        out = {}
        for b in loader:
            cap = b["src"].shape[1]
            out.setdefault(cap, []).append(b)
        return {
            cap: {k: np.concatenate([b[k] for b in bs]) for k in bs[0]}
            for cap, bs in out.items()
        }

    def test_stream_matches_bucketed_loader_exactly(self, tmp_path):
        from scream_tpu.data import (BucketedPairLoader, CollatedPairLoader,
                                     build_collated_cache)

        ds = self._ds(tmp_path, with_info=True)
        buckets = (256, 1024, 2048)
        cache = tmp_path / "cache"
        meta = build_collated_cache(ds, str(cache), buckets=buckets,
                                    verbose=False)
        assert meta["n_items"] == len(ds)
        ref = self._cat_by_cap(BucketedPairLoader(ds, batch_size=4,
                                                  buckets=buckets))
        got = self._cat_by_cap(CollatedPairLoader(str(cache), batch_size=3))
        assert sorted(got) == sorted(ref)
        for cap in ref:
            assert sorted(got[cap]) == sorted(ref[cap])
            for k in ref[cap]:
                np.testing.assert_array_equal(got[cap][k], ref[cap][k], err_msg=f"{cap}/{k}")

    def test_build_once_then_reuse_without_touching_dataset(self, tmp_path):
        from scream_tpu.data import build_collated_cache, collated_or_build

        ds = self._ds(tmp_path, n=5)
        cache = tmp_path / "cache"
        build_collated_cache(ds, str(cache), buckets=(2048,), verbose=False)

        class _Poison:
            def __len__(self):
                return 5

            def __getitem__(self, i):
                raise AssertionError("cache present: dataset must not be read")

        loader = collated_or_build(_Poison(), str(cache), batch_size=2,
                                   buckets=(2048,))
        assert len(loader) == 3
        assert sum(len(b["src"]) for b in loader) == 5

    def test_missing_cache_raises(self, tmp_path):
        from scream_tpu.data import CollatedPairLoader

        with pytest.raises(FileNotFoundError, match="collated"):
            CollatedPairLoader(str(tmp_path / "nope"), batch_size=2)
