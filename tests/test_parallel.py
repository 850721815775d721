"""Parallel layer on the 8-device virtual CPU mesh: DP equivalence, SP parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scream_tpu.config import ModelConfig, TrainConfig
from scream_tpu.data import PairLoader, SyntheticPairDataset
from scream_tpu.models.attention import linear_attention
from scream_tpu.parallel import (
    data_parallel_step,
    make_mesh,
    sequence_parallel_linear_attention,
    shard_batch,
)
from scream_tpu.train import optim
from scream_tpu.train.steps import init_train_state, make_registration_train_step
from scream_tpu.models.point_transformer import PointTransformer


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh()
        assert m.shape["data"] == 8 and m.shape["seq"] == 1
        m2 = make_mesh(n_data=4, n_seq=2)
        assert m2.shape["data"] == 4 and m2.shape["seq"] == 2
        # An explicit smaller mesh uses the leading device subset
        # (`--mesh data=3,seq=2` on an 8-chip host runs on 6 chips)...
        m3 = make_mesh(n_data=3, n_seq=2)
        assert m3.devices.size == 6
        # ...but asking for more devices than exist fails loudly.
        with pytest.raises(ValueError, match="needs 10 devices"):
            make_mesh(n_data=5, n_seq=2)
        # A zero/negative axis (e.g. a --mesh data=4,seq=0 typo) must fail at
        # parse time, not as a cryptic 0-device sharding error downstream.
        with pytest.raises(ValueError, match="axes must be >= 1"):
            make_mesh(n_data=4, n_seq=0)
        with pytest.raises(ValueError, match="axes must be >= 1"):
            make_mesh(n_data=-2)

    def test_shard_batch_divisibility(self):
        m = make_mesh()
        batch = {"x": np.zeros((8, 4, 3), np.float32)}
        out = shard_batch(batch, m)
        assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
        with pytest.raises(AssertionError):
            shard_batch({"x": np.zeros((6, 4), np.float32)}, m)


class TestSequenceParallel:
    def test_matches_single_device(self, rng):
        mesh = make_mesh(n_data=1, n_seq=8)
        B, L, S, H, D = 2, 64, 64, 4, 8
        q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        qm = jnp.asarray(rng.random((B, L)) > 0.2)
        km = jnp.asarray(rng.random((B, S)) > 0.2)

        want = linear_attention(q, k, v, qm, km)
        got = sequence_parallel_linear_attention(mesh, q, k, v, qm, km)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_no_masks(self, rng):
        mesh = make_mesh(n_data=1, n_seq=8)
        q = jnp.asarray(rng.standard_normal((1, 32, 2, 8)), jnp.float32)
        want = linear_attention(q, q, q)
        got = sequence_parallel_linear_attention(mesh, q, q, q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestDataParallelStep:
    def test_dp_matches_single_device(self):
        """One DP train step over 8 shards == the same step on one device."""
        cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1, cross_layers=1,
                          dtype="float32")
        model = PointTransformer(cfg)
        ds = SyntheticPairDataset(length=8, n_src=48, n_tgt=48, seed=3)
        loader = PairLoader(ds, batch_size=8, src_capacity=64, tgt_capacity=64,
                            num_workers=0)
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}

        opt = optim.generator_optimizer(TrainConfig(), steps_per_epoch=10)
        variables = model.init(
            jax.random.PRNGKey(0), batch["src"], batch["tgt"],
            batch["src_mask"], batch["tgt_mask"],
            jnp.swapaxes(batch["trans"], -1, -2),
        )
        step = make_registration_train_step(model, opt)

        # The step donates its input state, so each run needs its own copy.
        copy = lambda tree: jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

        # single-device
        state0 = init_train_state(copy(variables["params"]), opt)
        s1, m1, _ = step(state0, batch)

        # data-parallel over the mesh
        mesh = make_mesh()
        state0b = init_train_state(copy(variables["params"]), opt)
        dp_step = data_parallel_step(step, mesh)
        s2, m2, _ = dp_step(state0b, batch)

        assert float(m1["point_loss"]) == pytest.approx(float(m2["point_loss"]), rel=1e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)
        l2 = jax.tree_util.tree_leaves(s2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSequenceParallelModel:
    def test_model_forward_with_sharded_points(self):
        """The full transformer forward under GSPMD with points sharded over
        the seq axis matches the unsharded result — XLA inserts the
        collectives for the linear-attention einsums automatically."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from scream_tpu.models.point_transformer import PointTransformer

        cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1, cross_layers=1,
                          dtype="float32")
        model = PointTransformer(cfg)
        mesh = make_mesh(n_data=1, n_seq=8)
        B, N = 1, 128
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        sm = jnp.ones((B, N), bool)
        center = jnp.zeros((B, 1, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), src, tgt, sm, sm, center)["params"]

        fwd = jax.jit(lambda p, s, t, m: model.apply({"params": p}, s, t, m, m, center))
        want = fwd(params, src, tgt, sm)

        seq_sh = NamedSharding(mesh, jax.sharding.PartitionSpec(None, "seq", None))
        mask_sh = NamedSharding(mesh, jax.sharding.PartitionSpec(None, "seq"))
        rep = NamedSharding(mesh, jax.sharding.PartitionSpec())
        got = fwd(
            jax.device_put(params, rep),
            jax.device_put(src, seq_sh),
            jax.device_put(tgt, seq_sh),
            jax.device_put(sm, mask_sh),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


class TestDataSeqParallelStep:
    def test_2d_matches_single_device(self):
        """One (data x seq) 2-D train step == the same step on one device."""
        from scream_tpu.parallel import data_seq_parallel_step

        cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1, cross_layers=1,
                          dtype="float32")
        model = PointTransformer(cfg)
        ds = SyntheticPairDataset(length=4, n_src=64, n_tgt=64, seed=5)
        loader = PairLoader(ds, batch_size=4, src_capacity=64, tgt_capacity=64,
                            num_workers=0)
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}

        opt = optim.generator_optimizer(TrainConfig(), steps_per_epoch=10)
        variables = model.init(
            jax.random.PRNGKey(0), batch["src"], batch["tgt"],
            batch["src_mask"], batch["tgt_mask"],
            jnp.swapaxes(batch["trans"], -1, -2),
        )
        step = make_registration_train_step(model, opt)
        copy = lambda tree: jax.tree_util.tree_map(jnp.array, tree)

        s1, m1, _ = step(init_train_state(copy(variables["params"]), opt), batch)

        mesh = make_mesh(n_data=4, n_seq=2)
        sp_step = data_seq_parallel_step(step, mesh)
        s2, m2, _ = sp_step(init_train_state(copy(variables["params"]), opt), batch)

        assert float(m1["point_loss"]) == pytest.approx(
            float(m2["point_loss"]), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
