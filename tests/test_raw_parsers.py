"""Raw parsers: redwood gt.info, PREDATOR pkl/pth, KITTI odometry fixtures."""

import os
import pickle

import numpy as np
import pytest

from scream_tpu.data.raw import (
    KITTI_BAD_TEST_PAIR,
    KittiOdometry,
    ThreeDMatchPredator,
    load_covariance_index,
    read_redwood_info,
    save_info_sidecars,
    select_kitti_pairs,
    velo2cam_matrix,
)


def _write_gt_info(path, pairs):
    lines = []
    for (t, s), cov in pairs:
        lines.append(f"{t}\t{s}\t60")
        for row in cov:
            lines.append("\t".join(f"{x:.6e}" for x in row))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


class TestRedwoodInfo:
    def test_roundtrip(self, tmp_path):
        cov = np.arange(36, dtype=np.float32).reshape(6, 6)
        path = str(tmp_path / "scene" / "gt.info")
        _write_gt_info(path, [((3, 5), cov), ((7, 9), cov * 2)])
        recs = read_redwood_info(path)
        assert len(recs) == 2
        assert recs[0]["test_pair"] == [3, 5]
        assert recs[0]["num_fragments"] == 60
        np.testing.assert_allclose(recs[1]["covariance"], cov * 2)

    def test_covariance_index(self, tmp_path):
        cov = np.eye(6, dtype=np.float32)
        _write_gt_info(str(tmp_path / "7-scenes-redkitchen" / "gt.info"),
                       [((1, 4), cov)])
        idx = load_covariance_index(str(tmp_path))
        assert "7-scenes-redkitchen_1,4" in idx


class TestThreeDMatchPredator:
    def _make_fixture(self, tmp_path, n_pairs=2):
        import torch

        rng = np.random.default_rng(0)
        scene = "7-scenes-redkitchen"
        frag_dir = tmp_path / "data" / scene
        frag_dir.mkdir(parents=True)
        infos = {"rot": [], "trans": [], "src": [], "tgt": []}
        for i in range(n_pairs):
            a = rng.standard_normal((200, 3)).astype(np.float32)
            b = np.concatenate([a[:120], rng.standard_normal((80, 3)).astype(np.float32)])
            torch.save(torch.from_numpy(a), str(frag_dir / f"cloud_bin_{2*i}.pth"))
            torch.save(torch.from_numpy(b), str(frag_dir / f"cloud_bin_{2*i+1}.pth"))
            infos["rot"].append(np.eye(3))
            infos["trans"].append(np.zeros(3))
            infos["src"].append(f"{scene}/cloud_bin_{2*i}.pth")
            infos["tgt"].append(f"{scene}/cloud_bin_{2*i+1}.pth")
        pkl = tmp_path / "info.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(infos, f)
        _write_gt_info(
            str(tmp_path / "info" / scene / "gt.info"),
            [((2 * i + 1, 2 * i), np.eye(6, dtype=np.float32)) for i in range(n_pairs)],
        )
        return str(tmp_path / "data"), str(pkl), str(tmp_path / "info")

    def test_items_and_sidecars(self, tmp_path):
        root, pkl, info_dir = self._make_fixture(tmp_path)
        ds = ThreeDMatchPredator(root, pkl, info_dir)
        assert len(ds) == 2
        it = ds[0]
        assert it["src"].shape == (200, 3)
        assert it["idx"].tolist() == [1, 0]  # (tgt_idx, src_idx)
        assert it["scene"] == "7-scenes-redkitchen"
        # identity GT, first 120 points shared -> strong overlap signal
        assert len(it["overlap_ind"]) >= 100
        assert it["covariance"].shape == (6, 6)

        save_info_sidecars([ds[i] for i in range(2)], str(tmp_path / "out"))
        assert np.load(tmp_path / "out" / "info" / "idx0.npy").tolist() == [1, 0]
        names = (tmp_path / "out" / "info" / "scene_names.txt").read_text().split()
        assert names == ["7-scenes-redkitchen"] * 2


class TestKittiPairSelection:
    def test_d3feat_off_by_one(self):
        # frames every 6 m along x: first frame farther than 10 m from frame 0
        # is frame 2, and the reference's indexing selects next = 2 - 1 = 1.
        n = 8
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, 0, 3] = np.arange(n) * 6.0
        pairs = select_kitti_pairs(poses, list(range(n)))
        assert pairs[0] == (0, 1)
        assert pairs[1][0] == 2

    def test_velo2cam_shape(self):
        v = velo2cam_matrix()
        assert v.shape == (4, 4)
        # stored transposed: the homogeneous [0,0,0,1] is the last COLUMN and
        # the translation sits in the bottom row.
        np.testing.assert_allclose(v[:, 3], [0, 0, 0, 1], atol=1e-12)
        assert v[3, 0] == pytest.approx(-4.069766e-03)


class TestKittiOdometry:
    def _make_fixture(self, tmp_path, drive=8, n_frames=4):
        rng = np.random.default_rng(1)
        seq = tmp_path / "dataset" / "sequences" / ("%02d" % drive) / "velodyne"
        seq.mkdir(parents=True)
        poses = []
        scene = rng.uniform(-20, 20, (4000, 3)).astype(np.float32)
        for t in range(n_frames):
            offset = np.array([t * 12.0, 0.0, 0.0])
            # velodyne frame: scene shifted by -offset (sensor moves along +x)
            pts = (scene - offset).astype(np.float32)
            xyzr = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], axis=1)
            xyzr.tofile(str(seq / ("%06d.bin" % t)))
            # camera-frame pose: cam0 = velo2cam * velo
            T = np.eye(4)
            T[:3, 3] = (velo2cam_matrix().T[:3, :3] @ offset)
            poses.append(T[:3].reshape(-1))
        pose_dir = tmp_path / "dataset" / "poses"
        pose_dir.mkdir(parents=True)
        np.savetxt(str(pose_dir / ("%02d.txt" % drive)), np.asarray(poses))
        return str(tmp_path)

    def test_pairs_and_item(self, tmp_path):
        root = self._make_fixture(tmp_path)
        ds = KittiOdometry(root, mode="test", icp_max_iteration=10, strict=False)
        assert len(ds) >= 1
        it = ds[0]
        assert it["src"].shape[1] == 3
        assert it["rot"].shape == (3, 3)
        # GT registers src onto tgt: median NN distance small after transform
        reg = it["src"] @ it["rot"].T + it["trans"].reshape(3)
        from scipy.spatial import cKDTree

        d, _ = cKDTree(it["tgt"]).query(reg)
        assert np.median(d) < 1.0
        # ICP cache created
        assert len(os.listdir(os.path.join(root, "icp"))) >= 1

    def test_bad_pair_removed_only_in_test(self, tmp_path, monkeypatch):
        """The bad pair (8, 15, 58) is dropped from the TEST pair list and
        only there (`/root/reference/datasets/kitti.py:82-84`). Pose layout
        engineered so D3Feat selection yields exactly [(0, 14), (15, 58)]
        for drive 8; the train-mode list keeps both, the test-mode list
        drops the bad one."""
        assert KITTI_BAD_TEST_PAIR == (8, 15, 58)

        import scream_tpu.data.raw as raw

        seq = tmp_path / "dataset" / "sequences" / "08" / "velodyne"
        seq.mkdir(parents=True)
        # Positions along x. Chain: from 0, frames 1..14 stay within 10 m
        # (<= 8.4), frame 15 at 10.5 exceeds -> pair (0, 14), next start 15.
        # From 15, frames 16..58 stay within 10 m (<= 9.46), frame 59 at 21.5
        # exceeds -> pair (15, 58).
        x = np.empty(61)
        x[:15] = np.arange(15) * 0.6
        x[15:59] = 10.5 + np.arange(44) * 0.22
        x[59:] = [21.5, 22.5]
        poses = []
        for t in range(61):
            (seq / ("%06d.bin" % t)).touch()  # frame ids come from filenames
            T = np.eye(4)
            T[0, 3] = x[t]
            poses.append(T[:3].reshape(-1))
        pose_dir = tmp_path / "dataset" / "poses"
        pose_dir.mkdir(parents=True)
        np.savetxt(str(pose_dir / "08.txt"), np.asarray(poses))

        # Route drive 8 into both modes so the same fixture exercises each.
        monkeypatch.setitem(raw.KITTI_SEQUENCES, "train", [8])
        monkeypatch.setitem(raw.KITTI_SEQUENCES, "test", [8])

        train = KittiOdometry(str(tmp_path), mode="train", strict=False)
        assert (8, 0, 14) in train.files
        assert KITTI_BAD_TEST_PAIR in train.files  # kept outside the test split

        test = KittiOdometry(str(tmp_path), mode="test", strict=False)
        assert (8, 0, 14) in test.files
        assert KITTI_BAD_TEST_PAIR not in test.files  # dropped in test


def test_kitti_strict_fails_fast_on_missing_sequence(tmp_path):
    """A canonical split with a missing sequence must error, not silently
    shrink (the reference asserts, datasets/kitti.py:57)."""
    import pytest

    (tmp_path / "dataset" / "sequences").mkdir(parents=True)
    with pytest.raises(AssertionError, match="sequence 08"):
        KittiOdometry(str(tmp_path), mode="test")


def test_covariance_index_missing_dir_raises(tmp_path):
    import pytest

    from scream_tpu.data.raw import load_covariance_index

    with pytest.raises(FileNotFoundError):
        load_covariance_index(str(tmp_path / "not_info"))
