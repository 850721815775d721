"""CLI smoke: train/evaluate on synthetic fallback, visualize on artifacts."""

import json
import os

import numpy as np
import pytest

from scream_tpu.cli import build_parser, main


class TestParser:
    def test_subcommands(self):
        p = build_parser()
        args = p.parse_args(["train", "3dmatch", "--epochs", "2"])
        assert args.task == "3dmatch" and args.epochs == 2
        args = p.parse_args(["evaluate", "3dzeromatch", "--batch-size", "4"])
        assert args.protocol == "3dzeromatch"
        with pytest.raises(SystemExit):
            p.parse_args(["train", "nope"])

    def test_bad_protocol(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["evaluate", "nope"])


class TestEvaluateSynthetic:
    def test_3dzeromatch_synthetic(self, capsys, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)  # no data dir -> synthetic fallback
        # shrink the model so the CPU run is fast
        import scream_tpu.cli as cli
        import scream_tpu.config as config

        def tiny_presets():
            m, t, d, e = config.threedmatch_presets()
            import dataclasses

            return (
                dataclasses.replace(m, d_model=32, num_heads=4, self_layers=1,
                                    cross_layers=1, dtype="float32"),
                t,
                dataclasses.replace(d, max_points=128),
                e,
            )

        monkeypatch.setitem(cli.TASKS, "3dmatch", tiny_presets)
        main(["evaluate", "3dzeromatch", "--batch-size", "8"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        metrics = json.loads(out)
        assert "registration_recall" in metrics
        assert metrics["n_pairs"] == 16


class TestVisualize:
    def test_visualize_artifacts(self, capsys, tmp_path):
        split_dir = tmp_path / "3DMatch_test"
        split_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        np.save(split_dir / "src0.npy", rng.standard_normal((50, 3)))
        np.save(split_dir / "tgt0.npy", rng.standard_normal((60, 3)))
        np.save(split_dir / "T0.npy", np.eye(4))
        main(["visualize", "--root", str(tmp_path), "--item", "0",
              "--out", str(tmp_path / "viz")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert os.path.getsize(out["gt"]) > 0
        assert os.path.getsize(out["before"]) > 0

    def test_visualize_with_params(self, capsys, tmp_path):
        """Model views: predicted src, estimated registration, error plot."""
        import jax
        import numpy as np

        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer
        from scream_tpu.utils.checkpoint import save_params

        split_dir = tmp_path / "3DMatch_test"
        split_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        np.save(split_dir / "src0.npy", rng.standard_normal((40, 3)))
        np.save(split_dir / "tgt0.npy", rng.standard_normal((50, 3)))
        np.save(split_dir / "T0.npy", np.eye(4))

        cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1, cross_layers=1,
                          dtype="float32")
        model = PointTransformer(cfg)
        import jax.numpy as jnp

        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)),
                            jnp.zeros((1, 64, 3)), jnp.ones((1, 64), bool),
                            jnp.ones((1, 64), bool), jnp.zeros((1, 1, 3)))["params"]
        save_params(str(tmp_path / "p"), params)

        main(["visualize", "--root", str(tmp_path), "--item", "0",
              "--out", str(tmp_path / "viz"), "--params", str(tmp_path / "p"),
              "--max-points", "64", "--d-model", "32",
              "--self-layers", "1", "--cross-layers", "1"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        for key in ("predicted", "estimated", "pred_error"):
            assert os.path.getsize(out[key]) > 0

    def test_visualize_capacity_covers_larger_target(self, capsys, tmp_path):
        """No --max-points and tgt much larger than src: the auto capacity
        must cover BOTH clouds (it used to be src-size-derived and crashed
        in pad_cloud for any pair with len(tgt) > len(src)+64)."""
        import jax
        import jax.numpy as jnp

        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer
        from scream_tpu.utils.checkpoint import save_params

        split_dir = tmp_path / "3DMatch_test"
        split_dir.mkdir(parents=True)
        rng = np.random.default_rng(1)
        np.save(split_dir / "src0.npy", rng.standard_normal((40, 3)))
        np.save(split_dir / "tgt0.npy", rng.standard_normal((160, 3)))
        np.save(split_dir / "T0.npy", np.eye(4))

        cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1, cross_layers=1,
                          dtype="float32")
        params = PointTransformer(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), jnp.zeros((1, 64, 3)),
            jnp.ones((1, 64), bool), jnp.ones((1, 64), bool),
            jnp.zeros((1, 1, 3)))["params"]
        save_params(str(tmp_path / "p"), params)

        main(["visualize", "--root", str(tmp_path), "--item", "0",
              "--out", str(tmp_path / "viz"), "--params", str(tmp_path / "p"),
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert os.path.getsize(out["predicted"]) > 0

    def test_visualize_kitti_split_uses_kitti_protocol(self, capsys, tmp_path,
                                                       monkeypatch):
        """A KITTI_* split routes through the KITTI protocol: the -R^T t
        hint, NN 1.5 / ICP 1.0 @ 1000 iters (asserted via a register_batch
        spy — a silent fall-through to the 3DMatch thresholds would still
        produce a finite PNG)."""
        import jax
        import jax.numpy as jnp

        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer
        from scream_tpu.utils.checkpoint import save_params

        split_dir = tmp_path / "KITTI_test"
        split_dir.mkdir(parents=True)
        rng = np.random.default_rng(2)
        np.save(split_dir / "src0.npy", rng.standard_normal((50, 3)) * 10)
        np.save(split_dir / "tgt0.npy", rng.standard_normal((50, 3)) * 10)
        np.save(split_dir / "T0.npy", np.eye(4))

        cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1, cross_layers=1,
                          dtype="float32")
        params = PointTransformer(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), jnp.zeros((1, 64, 3)),
            jnp.ones((1, 64), bool), jnp.ones((1, 64), bool),
            jnp.zeros((1, 1, 3)))["params"]
        save_params(str(tmp_path / "p"), params)

        import scream_tpu.pipeline.register as R

        captured = {}
        real_register_batch = R.register_batch

        def spy(apply_fn, params, batch, **kw):
            captured.update(kw)
            return real_register_batch(apply_fn, params, batch, **kw)

        monkeypatch.setattr(R, "register_batch", spy)

        main(["visualize", "--root", str(tmp_path), "--split", "KITTI_test",
              "--item", "0", "--out", str(tmp_path / "viz"),
              "--params", str(tmp_path / "p"), "--max-points", "64",
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert os.path.getsize(out["predicted"]) > 0
        assert np.isfinite(out["re_deg"])
        assert np.isfinite(out["te"])
        # The KITTI routing itself (`/root/reference/evaluate_kitti.py:39,
        # :106-110`): -R^T t hint, NN 1.5, ICP 1.0 @ 1000 iterations.
        assert captured["center_mode"] == "neg_rt"
        assert captured["dis_thresh"] == 1.5
        assert captured["icp_thresh"] == 1.0
        assert captured["icp_max_iter"] == 1000

    def test_evaluate_bucketed(self, capsys, tmp_path, monkeypatch):
        """--bucketed evaluates artifact data grouped by cloud size."""
        import numpy as np

        split = tmp_path / "3DMatch_test"
        info = split / "info"
        info.mkdir(parents=True)
        rng = np.random.default_rng(0)
        names = []
        for i, n in enumerate((200, 900, 220, 880)):
            np.save(split / f"src{i}.npy", rng.standard_normal((n, 3)))
            np.save(split / f"tgt{i}.npy", rng.standard_normal((n + 20, 3)))
            np.save(split / f"T{i}.npy", np.eye(4))
            np.save(info / f"idx{i}.npy", np.array([i * 3, i * 3 + 2]))
            np.save(info / f"covariance{i}.npy", np.eye(6, dtype=np.float32) * n)
            names.append("7-scenes-redkitchen")
        (info / "scene_names.txt").write_text("\n".join(names) + "\n")

        import scream_tpu.cli as cli
        import scream_tpu.config as config
        import dataclasses

        def tiny():
            m, t, d, e = config.threedmatch_presets()
            return (dataclasses.replace(m, d_model=32, num_heads=4, self_layers=1,
                                        cross_layers=1, dtype="float32"),
                    t, d, e)

        monkeypatch.setitem(cli.TASKS, "3dmatch", tiny)
        main(["evaluate", "3dmatch", "--root", str(tmp_path), "--batch-size", "2",
              "--bucketed"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_pairs"] == 4

        # --cache-dir: first call builds the collated bucket shards, second
        # streams them with zero per-item work; metrics must equal the
        # bucketed loader's exactly (same ladder, same padding).
        cache = tmp_path / "collated"
        main(["evaluate", "3dmatch", "--root", str(tmp_path), "--batch-size",
              "2", "--cache-dir", str(cache)])
        built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert built == out
        assert (cache / "collated_meta.json").exists()
        main(["evaluate", "3dmatch", "--root", str(tmp_path), "--batch-size",
              "2", "--cache-dir", str(cache)])
        reused = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert reused == out

    def test_evaluate_kitti_wires_skip_items(self, capsys, tmp_path, monkeypatch):
        """`evaluate kitti` on artifact data must wrap the dataset in
        SkipDataset((124, 142)) — the reference's skipped eval items
        (`/root/reference/evaluate_kitti.py:31-34`). Deleting the cli wiring
        would silently drift n_pairs/success_rate; this pins the call."""
        import numpy as np

        split = tmp_path / "KITTI_test"
        split.mkdir(parents=True)
        rng = np.random.default_rng(3)
        for i in range(3):
            np.save(split / f"src{i}.npy", rng.standard_normal((60, 3)) * 5)
            np.save(split / f"tgt{i}.npy", rng.standard_normal((60, 3)) * 5)
            np.save(split / f"T{i}.npy", np.eye(4))

        import dataclasses

        import scream_tpu.cli as cli
        import scream_tpu.config as config
        import scream_tpu.eval as eval_pkg

        def tiny():
            m, t, d, e = config.kitti_presets()
            return (dataclasses.replace(m, d_model=32, num_heads=4, self_layers=1,
                                        cross_layers=1, dtype="float32"),
                    t, d, dataclasses.replace(e, icp_max_iter=3))

        monkeypatch.setitem(cli.TASKS, "kitti", tiny)

        captured = {}
        real_skip = eval_pkg.SkipDataset

        class SpySkip(real_skip):
            def __init__(self, dataset, skip):
                captured["skip"] = tuple(skip)
                super().__init__(dataset, skip)

        # cli binds `from scream_tpu import eval as protocols`, so the
        # package re-export is the attribute it resolves at call time.
        monkeypatch.setattr(eval_pkg, "SkipDataset", SpySkip)
        main(["evaluate", "kitti", "--root", str(tmp_path), "--batch-size", "2",
              "--max-points", "64"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert captured["skip"] == (124, 142)
        assert out["n_pairs"] == 3  # 124/142 out of range of the tiny fixture

        # --icp-chunk routes through register_batch_requeue: identical
        # protocol numbers (the straggler mitigation is a scheduling change,
        # not a semantics change).
        main(["evaluate", "kitti", "--root", str(tmp_path), "--batch-size", "2",
              "--max-points", "64", "--experimental-icp-chunk", "2"])
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["n_pairs"] == out["n_pairs"]
        assert out2["success_rate"] == pytest.approx(out["success_rate"])
        assert out2["success_rre"] == pytest.approx(out["success_rre"], abs=1e-4)


class TestRegisterCLI:
    def test_register_two_npy_clouds(self, capsys, tmp_path):
        """`register --src a.npy --tgt b.npy` is the GT-free user flow: two
        raw clouds in, a 4x4 transform + fitness out, transform saved."""
        import numpy as np

        rng = np.random.default_rng(9)
        src = rng.uniform(-1, 1, (120, 3)).astype(np.float32)
        np.save(tmp_path / "a.npy", src)
        np.save(tmp_path / "b.npy", src + np.float32([0.05, 0.0, 0.0]))

        main(["register", "--src", str(tmp_path / "a.npy"),
              "--tgt", str(tmp_path / "b.npy"),
              "--out", str(tmp_path / "T.npy"),
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1",
              "--dtype", "float32"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        T = np.asarray(out["transform"])
        assert T.shape == (4, 4)
        assert np.isfinite(T).all()
        assert 0.0 <= out["fitness"] <= 1.0
        saved = np.load(tmp_path / "T.npy")
        np.testing.assert_allclose(saved, T, atol=1e-6)
        # Pose QUALITY is a checkpoint property (this run is a random init —
        # the warning on stderr says so); exactness is pinned by the oracle
        # test in tests/test_pipeline_register.py::TestRegisterPair.
        assert T[3, 3] == 1.0 and np.allclose(T[3, :3], 0.0)

    def test_register_manifest_batched(self, capsys, tmp_path):
        """`register --manifest pairs.txt` registers a stream of pairs
        batched, one JSON line each, in input order."""
        import numpy as np

        rng = np.random.default_rng(4)
        lines = []
        for k in range(3):
            s = rng.uniform(-1, 1, (100 + 10 * k, 3)).astype(np.float32)
            np.save(tmp_path / f"s{k}.npy", s)
            np.save(tmp_path / f"t{k}.npy", s + np.float32([0.03, 0.0, 0.0]))
            lines.append(f"{tmp_path}/s{k}.npy {tmp_path}/t{k}.npy")
        (tmp_path / "pairs.txt").write_text("\n".join(lines) + "\n")

        main(["register", "--manifest", str(tmp_path / "pairs.txt"),
              "--batch-size", "2", "--out", str(tmp_path / "T.npy"),
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1",
              "--dtype", "float32"])
        rows = [json.loads(l) for l in
                capsys.readouterr().out.strip().splitlines()]
        assert [r["pair"] for r in rows] == [0, 1, 2]
        for r in rows:
            T = np.asarray(r["transform"])
            assert T.shape == (4, 4) and np.isfinite(T).all()
            assert 0.0 <= r["fitness"] <= 1.0
        # --out in manifest mode: stacked transforms, manifest order.
        saved = np.load(tmp_path / "T.npy")
        assert saved.shape == (3, 4, 4)
        np.testing.assert_allclose(
            saved, np.stack([np.asarray(r["transform"]) for r in rows]))

    def test_register_manifest_robust_batched(self, capsys, tmp_path):
        """`register --manifest --robust --robust-starts oct24`: the whole
        manifest runs through register_pairs_robust (pairs x seeds lanes),
        same per-pair JSON contract as plain manifest mode."""
        import numpy as np

        rng = np.random.default_rng(9)
        lines = []
        for k in range(2):
            s = rng.uniform(-1, 1, (80 + 8 * k, 3)).astype(np.float32)
            np.save(tmp_path / f"s{k}.npy", s)
            np.save(tmp_path / f"t{k}.npy", s + np.float32([0.02, 0.0, 0.0]))
            lines.append(f"{tmp_path}/s{k}.npy {tmp_path}/t{k}.npy")
        (tmp_path / "pairs.txt").write_text("\n".join(lines) + "\n")

        main(["register", "--manifest", str(tmp_path / "pairs.txt"),
              "--robust", "--robust-starts", "oct24",
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1",
              "--dtype", "float32"])
        rows = [json.loads(l) for l in
                capsys.readouterr().out.strip().splitlines()]
        assert [r["pair"] for r in rows] == [0, 1]
        for r in rows:
            T = np.asarray(r["transform"])
            assert T.shape == (4, 4) and np.isfinite(T).all()
            assert 0.0 <= r["fitness"] <= 1.0
            # Robust mode surfaces the ambiguity channel per pair.
            assert isinstance(r["ambiguous"], bool)
            assert np.isfinite(r["score_margin"])
            assert np.isfinite(r["runner_up_fitness"])

    def test_register_manifest_mesh_sharded(self, capsys, tmp_path):
        """`register --manifest --mesh data=2`: the serving dispatch shards
        over the data axis; same output contract as the unsharded path."""
        import numpy as np

        rng = np.random.default_rng(6)
        lines = []
        for k in range(2):
            s = rng.uniform(-1, 1, (90, 3)).astype(np.float32)
            np.save(tmp_path / f"s{k}.npy", s)
            np.save(tmp_path / f"t{k}.npy", s + np.float32([0.02, 0.0, 0.0]))
            lines.append(f"{tmp_path}/s{k}.npy {tmp_path}/t{k}.npy")
        (tmp_path / "pairs.txt").write_text("\n".join(lines) + "\n")

        main(["register", "--manifest", str(tmp_path / "pairs.txt"),
              "--batch-size", "2", "--mesh", "data=2",
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1",
              "--dtype", "float32"])
        rows = [json.loads(l) for l in
                capsys.readouterr().out.strip().splitlines()]
        assert [r["pair"] for r in rows] == [0, 1]
        assert all(np.isfinite(r["transform"]).all() for r in rows)

    def test_register_mesh_rejected_off_manifest(self, tmp_path):
        import numpy as np

        np.save(tmp_path / "a.npy", np.zeros((8, 3), np.float32))
        with pytest.raises(SystemExit, match="manifest/scans paths only"):
            main(["register", "--src", str(tmp_path / "a.npy"),
                  "--tgt", str(tmp_path / "a.npy"), "--mesh", "data=2"])

    def test_register_mesh_indivisible_batch_fails_fast(self, tmp_path):
        """Bad --mesh/--batch-size combos exit cleanly BEFORE the model
        build / checkpoint load (no raw ValueError traceback mid-serve)."""
        import numpy as np

        np.save(tmp_path / "a.npy", np.zeros((8, 3), np.float32))
        (tmp_path / "m.txt").write_text(
            f"{tmp_path}/a.npy {tmp_path}/a.npy\n")
        with pytest.raises(SystemExit, match="must divide"):
            main(["register", "--manifest", str(tmp_path / "m.txt"),
                  "--batch-size", "6", "--mesh", "data=4"])
        with pytest.raises(SystemExit, match="--mesh"):
            main(["register", "--manifest", str(tmp_path / "m.txt"),
                  "--batch-size", "4", "--mesh", "bogus"])

    def test_register_scans_multiway(self, capsys, tmp_path):
        """`register --scans a b c` -> absolute poses in scan 0's frame
        (pose-graph sync over the serving path), --out saves (N, 4, 4)."""
        import numpy as np

        rng = np.random.default_rng(8)
        scene = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        paths = []
        for k in range(3):
            shift = np.float32([0.02 * k, 0.0, 0.0])
            np.save(tmp_path / f"scan{k}.npy",
                    scene[rng.choice(300, 250, replace=False)] - shift)
            paths.append(str(tmp_path / f"scan{k}.npy"))

        main(["register", "--scans", *paths, "--out", str(tmp_path / "P.npy"),
              "--batch-size", "3",
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1",
              "--dtype", "float32"])
        rows = [json.loads(l) for l in
                capsys.readouterr().out.strip().splitlines()]
        assert [r["scan"] for r in rows] == [0, 1, 2]
        P = np.load(tmp_path / "P.npy")
        assert P.shape == (3, 4, 4)
        np.testing.assert_allclose(P[0], np.eye(4), atol=1e-6)  # gauge
        assert np.isfinite(P).all()

    def test_register_scans_validation(self, tmp_path):
        import numpy as np

        np.save(tmp_path / "a.npy", np.zeros((8, 3), np.float32))
        a = str(tmp_path / "a.npy")
        with pytest.raises(SystemExit, match="exclusive"):
            main(["register", "--scans", a, a, "--src", a, "--tgt", a])
        with pytest.raises(SystemExit, match="at least two"):
            main(["register", "--scans", a])
        with pytest.raises(SystemExit, match="robust"):
            main(["register", "--scans", a, a, "--robust"])

    def test_register_manifest_conflicts_and_validation(self, tmp_path):
        import numpy as np

        np.save(tmp_path / "a.npy", np.zeros((8, 3), np.float32))
        (tmp_path / "m.txt").write_text(f"{tmp_path}/a.npy\n")
        with pytest.raises(SystemExit, match="exclusive"):
            main(["register", "--manifest", str(tmp_path / "m.txt"),
                  "--src", str(tmp_path / "a.npy"),
                  "--tgt", str(tmp_path / "a.npy")])
        with pytest.raises(SystemExit, match="expected 'src.npy tgt.npy'"):
            main(["register", "--manifest", str(tmp_path / "m.txt")])
        with pytest.raises(SystemExit, match="need --src and --tgt"):
            main(["register"])

    def test_evaluate_icp_chunk_validation_fails_fast(self):
        """--icp-chunk must be rejected before the model/dataset load: it
        only routes the kitti protocol, and 0/negative chunks are invalid."""
        with pytest.raises(SystemExit, match="kitti protocol only"):
            main(["evaluate", "3dmatch", "--experimental-icp-chunk", "100"])
        with pytest.raises(SystemExit, match="icp-chunk must be >= 1"):
            main(["evaluate", "kitti", "--experimental-icp-chunk", "0"])

    def test_register_reads_model_config_sidecar(self, tmp_path, monkeypatch,
                                                 capsys):
        """A checkpoint's model_config.json sidecar supplies the architecture
        AND the normalization convention; explicit flags win over it."""
        import numpy as np

        import scream_tpu.cli as cli

        np.save(tmp_path / "a.npy", np.zeros((16, 3), np.float32))
        np.save(tmp_path / "b.npy", np.zeros((16, 3), np.float32))
        ck = tmp_path / "ck"
        ck.mkdir()
        (ck / "model_config.json").write_text(json.dumps(
            {"d_model": 48, "num_heads": 4, "self_layers": 1,
             "cross_layers": 1, "normalize": "unit_cube"}))

        captured = {}

        def fake_load(params_dir, init):
            return init

        def fake_register_pair(apply_fn, params, src, tgt, normalize,
                               dis_thresh, icp_thresh, icp_max_iter,
                               passes=2):
            captured["normalize"] = normalize
            from scream_tpu.pipeline.register import PairRegistration
            return PairRegistration(np.eye(4), 1.0, 0.0, 16)

        monkeypatch.setattr("scream_tpu.utils.checkpoint.load_params",
                            fake_load)
        monkeypatch.setattr("scream_tpu.pipeline.register_pair",
                            fake_register_pair)
        main(["register", "--src", str(tmp_path / "a.npy"),
              "--tgt", str(tmp_path / "b.npy"), "--params", str(ck),
              "--dtype", "float32"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert captured["normalize"] == "unit_cube"  # from the sidecar
        assert np.asarray(out["transform"]).shape == (4, 4)

        # Explicit flag beats the sidecar.
        main(["register", "--src", str(tmp_path / "a.npy"),
              "--tgt", str(tmp_path / "b.npy"), "--params", str(ck),
              "--normalize", "unit_sphere", "--dtype", "float32"])
        assert captured["normalize"] == "unit_sphere"

    @pytest.mark.parametrize("ckpt", ["point-generator-hintfree",
                                      "kitti-generator-hintfree"])
    def test_shipped_hintfree_checkpoints_load_against_sidecar(self, ckpt):
        """Each shipped hint-free checkpoint must restore against the
        architecture its model_config.json declares — catches sidecar or
        artifact drift without running a forward pass."""
        import os

        import jax
        import jax.numpy as jnp
        import numpy as np

        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer
        from scream_tpu.utils.checkpoint import load_params

        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "params", ckpt)
        import dataclasses

        side = json.loads(open(os.path.join(root, "model_config.json")).read())
        norm = side.pop("normalize")
        assert norm in ("unit_sphere", "unit_cube")
        cfg = dataclasses.replace(ModelConfig(dtype="float32"), **side)
        model = PointTransformer(cfg)
        z = jnp.zeros((1, 8, 3))
        init = model.init(jax.random.PRNGKey(0), z, z,
                          jnp.ones((1, 8), bool), jnp.ones((1, 8), bool),
                          jnp.zeros((1, 1, 3)))["params"]
        params = load_params(root, init)
        # Restored leaves must match the declared architecture's shapes and
        # differ from the random init (i.e., real trained weights loaded).
        changed = 0
        for a, b in zip(jax.tree_util.tree_leaves(init),
                        jax.tree_util.tree_leaves(params)):
            assert a.shape == b.shape
            changed += int(not np.allclose(np.asarray(a), np.asarray(b)))
        assert changed > 0

    def test_register_rejects_bad_shape(self, tmp_path):
        import numpy as np

        np.save(tmp_path / "bad.npy", np.zeros((4, 2), np.float32))
        np.save(tmp_path / "ok.npy", np.zeros((4, 3), np.float32))
        with pytest.raises(SystemExit, match="expected an"):
            main(["register", "--src", str(tmp_path / "bad.npy"),
                  "--tgt", str(tmp_path / "ok.npy")])


class TestTrainCLI:
    def test_train_kitti_gan_uses_kitti_render_config(self, monkeypatch,
                                                      tmp_path):
        """`train kitti --gan` must apply the reference's KITTI GAN renderer
        override — rho=48, single Ry(pi) back view
        (`/root/reference/train_kitti.py:45-48`) — previously
        kitti_gan_render_config() had no caller and the GAN silently trained
        on rho=24 six-view images."""
        monkeypatch.chdir(tmp_path)
        import scream_tpu.train as train_pkg

        captured = {}

        class StubTrainer:
            def __init__(self, *a, **kw):
                captured["render_cfg"] = kw.get("render_cfg")
                captured["train_cfg"] = kw.get("train_cfg")

            def init(self):
                pass

            def restore_state(self, d):
                pass

            def fit(self, profile_dir=None):
                return {}

        monkeypatch.setattr(train_pkg, "RegistrationTrainer", StubTrainer)
        main(["train", "kitti", "--gan", "--epochs", "2", "--batch-size", "2",
              "--max-points", "64",
              "--checkpoint-dir", str(tmp_path / "ck")])
        rc = captured["render_cfg"]
        assert rc is not None
        assert rc.rho == 48.0
        assert rc.multi_view is False and rc.view_mode == "back"
        assert captured["train_cfg"].use_gan
        # ...and without --gan the default renderer stays.
        main(["train", "kitti", "--epochs", "2", "--batch-size", "2",
              "--max-points", "64",
              "--checkpoint-dir", str(tmp_path / "ck")])
        assert captured["render_cfg"].rho == 24.0

    def test_train_opengf_synthetic(self, capsys, monkeypatch, tmp_path):
        """cmd_train drives the DEM trainer end-to-end on synthetic fallback."""
        monkeypatch.chdir(tmp_path)
        import dataclasses

        import scream_tpu.cli as cli
        import scream_tpu.config as config

        def tiny():
            m, t, d, e = config.opengf_presets()
            return (dataclasses.replace(m, d_model=32, num_heads=4, self_layers=1,
                                        cross_layers=1, dtype="float32"),
                    dataclasses.replace(t, batch_size=4),
                    dataclasses.replace(d, max_points=128),
                    e)

        monkeypatch.setitem(cli.TASKS, "opengf", tiny)
        main(["train", "opengf", "--epochs", "2",
              "--checkpoint-dir", str(tmp_path / "ck")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "chamfer" in out["final_val"]
        assert os.path.isdir(tmp_path / "ck" / "best")

    def test_train_3dmatch_synthetic(self, capsys, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        import dataclasses

        import scream_tpu.cli as cli
        import scream_tpu.config as config

        def tiny():
            m, t, d, e = config.threedmatch_presets()
            return (dataclasses.replace(m, d_model=32, num_heads=4, self_layers=1,
                                        cross_layers=1, dtype="float32"),
                    dataclasses.replace(t, batch_size=4),
                    dataclasses.replace(d, max_points=128),
                    e)

        monkeypatch.setitem(cli.TASKS, "3dmatch", tiny)
        main(["train", "3dmatch", "--epochs", "2",
              "--checkpoint-dir", str(tmp_path / "ck")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "point_loss" in out["final_val"]


def test_train_multi_scale_smoke(tmp_path, capsys, monkeypatch):
    """--multi-scale trains through the bucketed loader on synthetic pairs."""
    import dataclasses

    import scream_tpu.cli as cli
    import scream_tpu.config as config

    def tiny():
        m, t, d, e = config.threedmatch_presets()
        # The forced-CPU test backend cannot execute bf16 dots.
        return (dataclasses.replace(m, d_model=32, num_heads=4, self_layers=1,
                                    cross_layers=1, dtype="float32"),
                dataclasses.replace(t, batch_size=4),
                dataclasses.replace(d, max_points=128),
                e)

    monkeypatch.setitem(cli.TASKS, "3dmatch", tiny)
    cli.main([
        "train", "3dmatch", "--root", str(tmp_path / "nodata"),
        "--epochs", "2", "--multi-scale",
        "--checkpoint-dir", str(tmp_path / "ck"),
    ])
    out = capsys.readouterr().out
    assert "final_val" in out


def test_buckets_for_cap_between_sizes():
    """A cap between canonical bucket sizes must itself become the largest
    bucket, or clouds subsampled to cap would exceed every bucket."""
    from scream_tpu.cli import _buckets_for

    assert _buckets_for(6000)[-1] == 6000
    assert _buckets_for(4096)[-1] == 4096  # exact match: no duplicate
    assert _buckets_for(4096).count(4096) == 1
    assert _buckets_for(128) == (128,)
    assert _buckets_for(6000, smallest=1024) == (1024, 2048, 4096, 6000)


def test_size_probe_does_not_materialize():
    """BucketedPairLoader's default size probe must reach SyntheticPairDataset
    size hints through wrappers without materializing items (materializing
    would also consume augmentation RNG draws)."""
    from scream_tpu.data import BucketedPairLoader, ConcatDataset, SyntheticPairDataset
    from scream_tpu.data.loader import _default_size_fn
    from scream_tpu.eval import SkipDataset

    class Exploding(SyntheticPairDataset):
        def __getitem__(self, i):
            raise AssertionError("size probe materialized an item")

    ds = ConcatDataset([
        Exploding(length=4, n_src=100, n_tgt=110),
        Exploding(length=3, n_src=200, n_tgt=210),
    ])
    assert _default_size_fn(ds, 0) == (100, 110)
    assert _default_size_fn(ds, 5) == (200, 210)
    assert _default_size_fn(SkipDataset(ds, (0,)), 0) == (100, 110)
    loader = BucketedPairLoader(ds, batch_size=2, buckets=(128, 256))
    assert len(loader._assignment[128]) == 4
    assert len(loader._assignment[256]) == 3


class TestVisualizeZeroMode:
    def _artifacts(self, tmp_path, identity=True):
        import numpy as np

        split_dir = tmp_path / "3DZeroMatch_test"
        split_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        np.save(split_dir / "src0.npy", rng.standard_normal((40, 3)))
        np.save(split_dir / "tgt0.npy", rng.standard_normal((50, 3)))
        np.save(split_dir / "T0.npy", np.eye(4))
        return split_dir

    def _params(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer
        from scream_tpu.utils.checkpoint import save_params

        cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1, cross_layers=1,
                          dtype="float32")
        params = PointTransformer(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), jnp.zeros((1, 64, 3)),
            jnp.ones((1, 64), bool), jnp.ones((1, 64), bool),
            jnp.zeros((1, 1, 3)))["params"]
        save_params(str(tmp_path / "p"), params)
        return str(tmp_path / "p")

    def test_zero_flow_emits_flow_lines(self, capsys, tmp_path):
        """--mode zero with the gate disabled emits the flow-lines PNG
        (`/root/reference/visualize_3d_match.py:98-110`)."""
        self._artifacts(tmp_path)
        p = self._params(tmp_path)
        main(["visualize", "--root", str(tmp_path), "--split", "3DZeroMatch_test",
              "--item", "0", "--out", str(tmp_path / "viz"), "--params", p,
              "--max-points", "64", "--d-model", "32", "--self-layers", "1",
              "--cross-layers", "1", "--mode", "zero", "--re-gate", "1e9"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert not out["display_gated"]
        assert os.path.getsize(out["flow"]) > 0

    def test_zero_flow_re_gate_suppresses_pngs(self, capsys, tmp_path):
        """A random-weight model registers badly; the reference's RE<3 gate
        (`visualize_3d_match.py:117`) must suppress the model-view PNGs."""
        self._artifacts(tmp_path)
        p = self._params(tmp_path)
        main(["visualize", "--root", str(tmp_path), "--split", "3DZeroMatch_test",
              "--item", "0", "--out", str(tmp_path / "viz2"), "--params", p,
              "--max-points", "64", "--d-model", "32", "--self-layers", "1",
              "--cross-layers", "1", "--mode", "zero", "--re-gate", "0.0001"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["display_gated"]
        assert "flow" not in out and "predicted" not in out
