"""The user-facing multi-chip path: trainers/CLI driving the parallel layer.

Round 1 shipped the parallel layer as a library (`scream_tpu/parallel`)
proven only by bespoke demo code; these tests pin the *user-facing* wiring:
``--mesh data=N[,seq=M]`` on the CLI, the ``mesh=`` trainer argument, and
sharded eval batches — and that DP training is numerically equivalent to
single-device training.
"""

import json

import numpy as np
import jax
import pytest

from scream_tpu.config import EvalConfig, ModelConfig, TrainConfig
from scream_tpu.data import PairLoader, SyntheticPairDataset
from scream_tpu.parallel import make_mesh, parse_mesh_spec
from scream_tpu.train import RegistrationTrainer


def _tiny_trainer(mesh=None, batch_size=8):
    ds = SyntheticPairDataset(length=16, n_src=64, n_tgt=64, seed=11)
    mk = lambda: PairLoader(ds, batch_size=batch_size, src_capacity=64,
                            shuffle=False, num_workers=0)
    return RegistrationTrainer(
        mk(), mk(),
        model_cfg=ModelConfig(d_model=32, num_heads=4, self_layers=1,
                              cross_layers=1, dtype="float32"),
        train_cfg=TrainConfig(batch_size=batch_size, epochs=3),
        eval_cfg=EvalConfig(icp_max_iter=3),
        mesh=mesh,
    )


class TestMeshSpec:
    def test_parse(self):
        m = parse_mesh_spec("data=4,seq=2")
        assert m.shape["data"] == 4 and m.shape["seq"] == 2
        assert parse_mesh_spec("auto").shape["data"] == len(jax.devices())
        assert parse_mesh_spec("seq=2").shape["data"] == len(jax.devices()) // 2

    def test_parse_model_axis(self):
        m = parse_mesh_spec("data=2,model=2")
        assert m.shape["data"] == 2 and m.shape["model"] == 2

    def test_parse_errors(self):
        with pytest.raises(ValueError, match="axis=N"):
            parse_mesh_spec("8")
        # pipe= became a supported trainer axis in round 4 (pp_flagship);
        # expert parallelism remains a library API.
        with pytest.raises(ValueError, match="unknown mesh axes"):
            parse_mesh_spec("data=4,expert=2")
        with pytest.raises(ValueError, match="model= with"):
            parse_mesh_spec("data=2,seq=2,model=2")


class TestDPTrainerEquivalence:
    def test_dp_epoch_matches_single_device(self):
        """One epoch of DP training over the 8-device mesh produces the same
        parameters as single-device training on the same batches."""
        single = _tiny_trainer(mesh=None)
        dp = _tiny_trainer(mesh=make_mesh(n_data=8))
        single.init()
        dp.init()
        for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                        jax.tree_util.tree_leaves(dp.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        single.train_epoch(1)
        dp.train_epoch(1)
        for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                        jax.tree_util.tree_leaves(dp.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

        # Sharded validation agrees too.
        m_single = single.evaluate()
        m_dp = dp.evaluate()
        assert m_dp["point_loss"] == pytest.approx(m_single["point_loss"],
                                                   rel=1e-4, abs=1e-5)

    def test_dp_seq_trainer_runs(self):
        """The 2-D (data x seq) trainer path: points shard over chips."""
        t = _tiny_trainer(mesh=make_mesh(n_data=4, n_seq=2))
        t.init()
        out = t.train_epoch(1)
        assert np.isfinite(out["point_loss"])

    def test_dp_tp_epoch_matches_single_device(self):
        """One epoch of 2-D (data x model) training — Megatron kernel
        shardings via the trainer's mesh= argument — matches single-device
        parameters (the TP analogue of the DP equivalence above)."""
        single = _tiny_trainer(mesh=None)
        tp = _tiny_trainer(mesh=make_mesh(n_data=2, n_seq=1, n_model=4))
        single.init()
        tp.init()
        single.train_epoch(1)
        tp.train_epoch(1)
        for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                        jax.tree_util.tree_leaves(tp.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_partial_trailing_batch_under_mesh(self):
        """A drop_last=False loader's trailing partial batch (here 20 % 8 =
        4 pairs on a data=8 mesh) must train, via the replicated fallback in
        parallel/dp.py — and still match single-device training."""
        def mk_trainer(mesh):
            ds = SyntheticPairDataset(length=20, n_src=64, n_tgt=64, seed=11)
            mk = lambda: PairLoader(ds, batch_size=8, src_capacity=64,
                                    shuffle=False, num_workers=0)
            return RegistrationTrainer(
                mk(), mk(),
                model_cfg=ModelConfig(d_model=32, num_heads=4, self_layers=1,
                                      cross_layers=1, dtype="float32"),
                train_cfg=TrainConfig(batch_size=8, epochs=2),
                eval_cfg=EvalConfig(icp_max_iter=3),
                mesh=mesh,
            )

        single = mk_trainer(None)
        dp = mk_trainer(make_mesh(n_data=8))
        single.init()
        dp.init()
        single.train_epoch(1)
        dp.train_epoch(1)
        for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                        jax.tree_util.tree_leaves(dp.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


class TestGANUnderMesh:
    def test_gan_mesh_routes_renderer_to_xla_and_trains(self):
        """GSPMD cannot partition the Mosaic splat custom call, so a GAN
        trainer built with a mesh must force the renderer's XLA path
        (use_pallas=False) — and one adversarial epoch must actually run
        under the 8-device mesh, updating both networks."""
        from scream_tpu.config import RenderConfig

        ds = SyntheticPairDataset(length=8, n_src=48, n_tgt=48, seed=5)
        mk = lambda: PairLoader(ds, batch_size=8, src_capacity=48,
                                shuffle=False, num_workers=0)
        tr = RegistrationTrainer(
            mk(), mk(),
            model_cfg=ModelConfig(d_model=32, num_heads=4, self_layers=1,
                                  cross_layers=1, dtype="float32"),
            train_cfg=TrainConfig(batch_size=8, epochs=2, use_gan=True),
            eval_cfg=EvalConfig(icp_max_iter=3),
            render_cfg=RenderConfig(rho=6.0, width=32, multi_view=False),
            mesh=make_mesh(n_data=8),
        )
        assert tr.render_cfg.use_pallas is False
        tr.init()
        d0 = jax.tree_util.tree_leaves(tr.disc_state.variables["params"])[0].copy()
        metrics = tr.train_epoch(1)
        assert np.isfinite(metrics["g_loss"]) and np.isfinite(metrics["d_loss"])
        d1 = jax.tree_util.tree_leaves(tr.disc_state.variables["params"])[0]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))


class TestCLIMesh:
    @pytest.fixture
    def tiny_presets(self, monkeypatch):
        import dataclasses

        import scream_tpu.cli as cli
        import scream_tpu.config as config

        def tiny():
            m, t, d, e = config.threedmatch_presets()
            return (
                dataclasses.replace(m, d_model=32, num_heads=4, self_layers=1,
                                    cross_layers=1, dtype="float32"),
                t,
                dataclasses.replace(d, max_points=128),
                dataclasses.replace(e, icp_max_iter=3),
            )

        monkeypatch.setitem(cli.TASKS, "3dmatch", tiny)
        return cli

    def test_train_with_mesh_flag(self, tiny_presets, tmp_path, capsys):
        tiny_presets.main([
            "train", "3dmatch", "--root", str(tmp_path / "none"),
            "--epochs", "2", "--batch-size", "8", "--mesh", "data=8",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        final = json.loads(out)["final_val"]
        assert np.isfinite(final["point_loss"])

    def test_train_with_tp_mesh_flag(self, tiny_presets, tmp_path, capsys):
        """Tensor parallelism is one flag away: --mesh data=2,model=2."""
        tiny_presets.main([
            "train", "3dmatch", "--root", str(tmp_path / "none"),
            "--epochs", "2", "--batch-size", "8",
            "--mesh", "data=2,model=2",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        final = json.loads(out)["final_val"]
        assert np.isfinite(final["point_loss"])

    def test_evaluate_with_mesh_flag(self, tiny_presets, tmp_path, capsys):
        tiny_presets.main([
            "evaluate", "3dzeromatch", "--root", str(tmp_path / "none"),
            "--batch-size", "8", "--mesh", "data=8", "--icp-max-iter", "3",
        ])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        metrics = json.loads(out)
        assert metrics["n_pairs"] == 16
