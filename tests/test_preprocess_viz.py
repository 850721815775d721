"""Offline preprocessors (overlap gates, artifact layout) and host viz."""

import os

import numpy as np
import pytest

from scream_tpu.data import PairDataset, OpenGFDataset
from scream_tpu.data.preprocess import (
    extract_dsm,
    make_pair_artifacts,
    overlap_indices,
    save_opengf_split,
    save_test_splits,
    save_train_split,
    tile_opengf_scene,
)
from scream_tpu.data.synthetic import make_pair
from scream_tpu.utils import viz


def _raw_pairs(n, overlap, seed=0, with_ind=False):
    """Synthetic raw pairs; optionally precompute overlap indices at a radius
    matched to the unit-scale synthetic scenes (the default 0.0375 radius is
    calibrated to 3DMatch meters)."""
    out = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        p = make_pair(rng, 400, 400, overlap=overlap)
        pair = (p["src"], p["tgt"], p["rot"], p["trans"])
        if with_ind:
            pair = pair + (overlap_indices(*pair, radius=0.15),)
        out.append(pair)
    return out


class TestOverlap:
    def test_full_overlap_high_ratio(self):
        (src, tgt, rot, trans) = _raw_pairs(1, overlap=1.0)[0]
        ind = overlap_indices(src, tgt, rot, trans, radius=0.1)
        assert len(ind) / len(src) > 0.5

    def test_zero_overlap_low_ratio(self):
        (src, tgt, rot, trans) = _raw_pairs(1, overlap=0.0)[0]
        ind = overlap_indices(src, tgt, rot, trans, radius=0.05)
        assert len(ind) / len(src) < 0.4

    def test_artifacts_shapes(self):
        (src, tgt, rot, trans) = _raw_pairs(1, overlap=0.8)[0]
        a = make_pair_artifacts(src, tgt, rot, trans, voxel_size=0.1)
        assert a["src"].shape[1] == 3 and a["src"].shape[0] <= len(src)
        assert a["T"].shape == (4, 4)
        assert 0.0 <= a["overlap_ratio"] <= 1.0


class TestSplitRules:
    def test_train_emits_zero_copies(self, tmp_path):
        pairs = _raw_pairs(2, overlap=0.1, with_ind=True) + _raw_pairs(
            2, overlap=0.9, seed=50, with_ind=True)
        n = save_train_split(iter(pairs), str(tmp_path / "train"), voxel_size=0.05)
        # low-overlap pairs emit 2 artifacts each (pair + de-overlapped copy)
        assert n >= 5
        ds = PairDataset(str(tmp_path), "train")
        assert len(ds) == n
        item = ds[0]
        assert item["src"].shape[1] == 3 and item["trans"].shape == (3, 1)

    def test_test_split_gates(self, tmp_path):
        pairs = _raw_pairs(2, overlap=0.05, seed=9, with_ind=True) + _raw_pairs(
            2, overlap=0.95, seed=90, with_ind=True)
        counts = save_test_splits(
            iter(pairs),
            match_dir=str(tmp_path / "match"),
            lo_dir=str(tmp_path / "lo"),
            zero_dir=str(tmp_path / "zero"),
            voxel_size=0.05,
        )
        # high-overlap pairs pass match+lo; low-overlap pass zero
        assert counts["match"] >= 1
        assert counts["zero"] >= 1
        assert counts["match"] + counts["zero"] >= 3


class TestOpenGFPreprocess:
    def test_extract_dsm_picks_highest(self):
        dem = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 0.1]])
        pts = np.array([
            [0.1, 0.1, 2.0],   # near dem[0], high
            [0.2, -0.1, 0.5],  # near dem[0], lower
            [5.0, 5.1, 0.3],   # near dem[1]
        ])
        dsm = extract_dsm(pts, dem, radius=0.8)
        assert dsm[0][2] == 2.0
        assert dsm[1][2] == 0.3

    def test_tile_and_save_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 220, (20000, 3)) * np.array([1, 1, 0.05])
        classes = (rng.random(20000) < 0.6) * 2  # ~60% ground (class 2)
        patches = list(tile_opengf_scene(pts, classes, tile=100.0, voxel=5.0))
        assert len(patches) >= 4  # 220m scene -> 2x2 non-overlapping tiles
        n = save_opengf_split(iter(patches), str(tmp_path / "OpenGF_test"),
                              save_centers=True)
        ds = OpenGFDataset(str(tmp_path), "test", with_centers=True)
        assert len(ds) == n
        item = ds[0]
        assert item["dsm"].shape[1] == 3
        assert item["dem_coarse"].shape[0] <= item["dem"].shape[0]
        assert "center" in item

    def test_reference_fixed_grids_fall_out_of_the_formula(self):
        """The reference uses FIXED window grids — train 17x17 @ stride 25
        on 500 m files (`process_open_gf.py:83-91`), val 5x5 @ 100 — which
        must fall out of the start formula at the canonical extents (the
        old `hi - tile/2` bound emitted an 18th row/column of partial edge
        tiles)."""
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 500, (30000, 3)) * np.array([1, 1, 0.02])
        # Pin the exact extent so the formula (not sampling luck) is tested.
        pts[0, :2] = [0.0, 0.0]
        pts[1, :2] = [500.0 - 1e-6, 500.0 - 1e-6]
        classes = np.full(len(pts), 2)
        train = list(tile_opengf_scene(pts, classes, tile=100.0, stride=25.0,
                                       voxel=20.0))
        assert len(train) == 17 * 17
        val = list(tile_opengf_scene(pts, classes, tile=100.0, voxel=20.0))
        assert len(val) == 5 * 5

    def test_center_is_3d_bbox_center_of_dsm_and_dem(self):
        """Patches are centered on the 3-D bbox center of dsm+dem including
        ELEVATION (`process_open_gf.py:237-242`) — x/y-only tile-midpoint
        centering left absolute terrain height in z."""
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 100, (5000, 3)) * np.array([1, 1, 0.1])
        pts[:, 2] += 300.0  # absolute elevation
        classes = np.full(len(pts), 2)
        (patch,) = list(tile_opengf_scene(pts, classes, tile=100.0, voxel=5.0))
        allp = np.concatenate([patch["dsm"], patch["dem"]], axis=0)
        # Centered: bbox of the saved patch straddles zero in every dim.
        np.testing.assert_allclose(
            (allp.min(axis=0) + allp.max(axis=0)) / 2, 0.0, atol=1e-3)
        assert patch["center"].shape == (3,)
        assert patch["center"][2] > 290.0  # the elevation went into center

    def test_sparse_windows_are_kept_not_renumbered(self):
        """The reference saves EVERY window (no minimum-point gate,
        `process_open_gf.py:193-263`); dropping sparse windows would
        renumber all later patches away from reference artifacts."""
        rng = np.random.default_rng(3)
        # Dense left tile, nearly-empty right tile (8 points).
        dense = rng.uniform(0, 100, (4000, 3)) * np.array([1, 1, 0.05])
        sparse = rng.uniform(0, 100, (8, 3)) * np.array([1, 1, 0.05])
        sparse[:, 0] += 100.0
        pts = np.concatenate([dense, sparse])
        pts[0, :2] = [0, 0]
        pts[1, :2] = [200 - 1e-6, 100 - 1e-6]
        classes = np.full(len(pts), 2)
        patches = list(tile_opengf_scene(pts, classes, tile=100.0, voxel=5.0))
        assert len(patches) == 2  # both windows, sparse one included
        assert min(len(p["dem"]) for p in patches) >= 1

    def test_dsm_extracted_from_downsampled_patch(self):
        """DSM points come from the voxel-downsampled patch
        (`process_open_gf.py:211-231`): a single raw outlier above a voxel
        must NOT win over the voxel centroid."""
        # One ground point; the surface cell holds 3 raw returns whose
        # centroid z is 1.0 but whose max raw z is 10.0.
        pts = np.array([
            [0.1, 0.1, 0.0],    # ground
            [0.2, 0.2, -3.0],
            [0.21, 0.2, 6.0],
            [0.2, 0.21, 0.0],
        ])
        classes = np.array([2, 0, 0, 0])
        (patch,) = list(tile_opengf_scene(pts, classes, tile=100.0, voxel=50.0))
        # Voxel 50: everything collapses to centroids; the DSM height is the
        # centroid of the full patch cell, not the raw max 6.0.
        dsm_z = patch["dsm"][:, 2] + patch["center"][2]
        assert float(dsm_z.max()) < 2.0


class TestKittiSaveSkip:
    def test_skip_items_drops_reference_test_item(self, tmp_path):
        """`process_kitti.py:44-45` drops dataset item 1 from the test split
        BEFORE numbering: artifact 1 must be source pair 2."""
        from scream_tpu.data.preprocess import save_kitti_split

        rng = np.random.default_rng(4)
        mk = lambda tag: (rng.uniform(-5, 5, (50, 3)) + tag,
                          rng.uniform(-5, 5, (50, 3)),
                          np.eye(3), np.zeros((3, 1)))
        pairs = [mk(0), mk(100), mk(200)]
        n = save_kitti_split(iter(pairs), str(tmp_path / "KITTI_test"),
                             voxel_size=0.7, skip_items=(1,))
        assert n == 2
        src1 = np.load(tmp_path / "KITTI_test" / "src1.npy")
        # Artifact 1 came from source pair 2 (mean ~ +200), not pair 1.
        assert src1[:, 0].mean() > 100


class TestViz:
    def test_depth_images_to_rgb(self):
        imgs = np.zeros((3, 2, 8, 8), np.float32) - 1.0
        imgs[:, 0, :4] = 1.0  # src bright in top half
        rgb = viz.depth_images_to_rgb(imgs)
        assert rgb.shape == (3, 8, 8, 3) and rgb.dtype == np.uint8
        # top half src yellow-ish (r > b), bottom dark
        assert rgb[0, 0, 0, 0] > rgb[0, 0, 0, 2]
        assert rgb[0, 7, 0].max() <= 1

    def test_plot_functions_save(self, tmp_path, rng):
        src = rng.standard_normal((50, 3))
        tgt = rng.standard_normal((60, 3))
        T = np.eye(4)
        viz.plot_registration(src, tgt, T, path=str(tmp_path / "reg.png"))
        viz.plot_correspondences(src, tgt, [0, 1], [2, 3],
                                 path=str(tmp_path / "corr.png"))
        viz.plot_dem_height(src, path=str(tmp_path / "dem.png"))
        viz.save_depth_image_grid(np.zeros((2, 2, 8, 8)), str(tmp_path / "grid.png"))
        for f in ("reg.png", "corr.png", "dem.png", "grid.png"):
            assert (tmp_path / f).stat().st_size > 0

    def test_stitch_patches(self):
        p1 = np.zeros((4, 3))
        p2 = np.zeros((4, 3))
        out = viz.stitch_patches([p1, p2], [np.array([0, 0]), np.array([100, 0])],
                                 scale_factor=1.0)
        assert out.shape == (8, 3)
        assert out[4:, 0].min() == 100

    def test_plot_prediction_error(self, tmp_path, rng):
        gt = rng.standard_normal((40, 3))
        pred = gt.copy()
        pred[:5] += 0.5  # mispredicted points
        viz.plot_prediction_error(pred, gt, tgt=rng.standard_normal((30, 3)),
                                  path=str(tmp_path / "err.png"))
        assert (tmp_path / "err.png").stat().st_size > 0


class TestArtifactQA:
    """Headless counterparts of the reference's preprocessing QA windows
    (process_kitti.py:80-96, process_open_gf.py:266-296)."""

    def test_check_saved_pairs(self, tmp_path):
        from scream_tpu.data.preprocess import check_saved_pairs

        pairs = _raw_pairs(2, overlap=1.0)
        n = save_train_split(pairs, str(tmp_path / "pairs"), voxel_size=0.05)
        out = tmp_path / "qa"
        stats = check_saved_pairs(str(tmp_path / "pairs"), out_dir=str(out),
                                  verbose=False)
        assert len(stats) == n
        for rec in stats:
            assert (rec["extent"] > 0).all() and rec["n_src"] > 0
        assert (out / "pair0_raw.png").exists()
        assert (out / "pair0_registered.png").exists()

    def test_check_opengf_test(self, tmp_path):
        from scream_tpu.data.preprocess import check_opengf_test

        rng = np.random.default_rng(0)
        scene = rng.uniform(0, 50, size=(4000, 3)).astype(np.float32)
        ground = scene.copy()
        ground[:, 2] = 0.0
        labels = np.ones(len(scene), np.int64) * 2  # all "ground" class
        patches = tile_opengf_scene(np.concatenate([scene], axis=0), labels,
                                    tile=25.0, stride=25.0, voxel=2.0)
        n = save_opengf_split(patches, str(tmp_path / "test"), save_centers=True)
        assert n > 0
        png = tmp_path / "scene.png"
        stats = check_opengf_test(str(tmp_path / "test"), out_path=str(png),
                                  verbose=False)
        assert stats["n_patches"] == n and stats["n_points"] > 0
        assert png.exists()


def test_check_opengf_test_empty_dir(tmp_path):
    from scream_tpu.data.preprocess import check_opengf_test

    stats = check_opengf_test(str(tmp_path), verbose=False)
    assert stats == {"n_patches": 0.0, "n_points": 0.0, "max_height": 0.0}


class TestVizHtml:
    """The interactive HTML export (utils/viz_html.py): self-contained file,
    embedded base64 float32 layers decode back bit-exact, correspondence
    lines included, oversize clouds subsampled."""

    def test_export_registration_html_roundtrip(self, tmp_path):
        import base64
        import json
        import re

        from scream_tpu.utils.viz_html import export_registration_html

        rng = np.random.default_rng(0)
        src = rng.standard_normal((200, 3)).astype(np.float32)
        tgt = rng.standard_normal((300, 3)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1, 0.0, -0.2]
        corr = (src[:50], src[:50] + 0.01)
        path = export_registration_html(
            str(tmp_path / "scene.html"), src, tgt, T_gt=T, T_est=T,
            src_pred=src + 0.05, corr=corr, title="t")
        html = open(path).read()
        assert "<canvas" in html and "</html>" in html
        data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html,
                                    re.S).group(1))
        labels = [l["label"] for l in data["layers"]]
        assert any("target" in l for l in labels)
        assert any("estimate" in l for l in labels)
        # layers decode back bit-exact
        raw = np.frombuffer(base64.b64decode(data["layers"][0]["b64"]),
                            "<f4").reshape(-1, 3)
        np.testing.assert_array_equal(raw, tgt)
        assert len(data["lines"]) == 1
        # no external references: the file must work offline
        assert "http://" not in html and "https://" not in html

    def test_subsampling_caps_large_clouds(self, tmp_path):
        import base64
        import json
        import re

        from scream_tpu.utils.viz_html import export_scene_html

        pts = np.random.default_rng(1).standard_normal((5000, 3)).astype(np.float32)
        path = export_scene_html(str(tmp_path / "s.html"),
                                 [(pts, "#fff", "big")], max_points=1000)
        data = json.loads(re.search(r"const DATA = (\{.*?\});\n",
                                    open(path).read(), re.S).group(1))
        n = len(base64.b64decode(data["layers"][0]["b64"])) // 12
        assert n == 1000
