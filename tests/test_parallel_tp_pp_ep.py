"""Tensor / pipeline / expert parallelism on the 8-device virtual CPU mesh.

Each mode is checked for *numerical equivalence* against its single-device
oracle — the sharded program must compute the same function, with the
collectives only changing where the arithmetic runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scream_tpu.config import ModelConfig, TrainConfig
from scream_tpu.data import PairLoader, SyntheticPairDataset
from scream_tpu.models.attention import AttentionBlock
from scream_tpu.models.point_transformer import PointTransformer
from scream_tpu.parallel import (
    expert_parallel_moe_ffn,
    init_moe_ffn_params,
    make_expert_mesh,
    make_mesh,
    make_pipeline_mesh,
    moe_ffn_reference,
    pipeline_parallel_apply,
    pipeline_parallel_grads,
    pipeline_train_step,
    shard_params_tensor_parallel,
    stack_stage_params,
    tensor_parallel_apply,
    tensor_parallel_specs,
    tensor_parallel_step,
)
from scream_tpu.train import optim
from scream_tpu.train.steps import init_train_state, make_registration_train_step


def _tiny_model_and_batch(seed=0, d_model=32, heads=4, B=8, N=48, cap=64):
    cfg = ModelConfig(d_model=d_model, num_heads=heads, self_layers=1,
                      cross_layers=1, dtype="float32")
    model = PointTransformer(cfg)
    ds = SyntheticPairDataset(length=B, n_src=N, n_tgt=N, seed=seed)
    loader = PairLoader(ds, batch_size=B, src_capacity=cap, tgt_capacity=cap,
                        num_workers=0)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["src"], batch["tgt"],
        batch["src_mask"], batch["tgt_mask"],
        jnp.swapaxes(batch["trans"], -1, -2),
    )["params"]
    return model, params, batch


class TestTensorParallel:
    def test_specs_column_row(self):
        model, params, _ = _tiny_model_and_batch()
        specs = tensor_parallel_specs(params)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        col = row = rep = 0
        for path, spec in flat:
            names = tuple(p.key for p in path if hasattr(p, "key"))
            if spec == jax.sharding.PartitionSpec(None, "model"):
                col += 1
                assert names[-2] in {"q_proj", "k_proj", "v_proj", "ffn_in"}
            elif spec == jax.sharding.PartitionSpec("model", None):
                row += 1
                assert names[-2] in {"merge", "ffn_out"}
            else:
                rep += 1
        # 3 blocks (stem, cross_self, cross_attn) x (4 col + 2 row) kernels.
        assert col == 12 and row == 6 and rep > 0

    def test_forward_matches_single_device(self):
        model, params, batch = _tiny_model_and_batch()
        center = jnp.swapaxes(batch["trans"], -1, -2)

        def apply_fn(p, src, tgt, sm, tm, c):
            return model.apply({"params": p}, src, tgt, sm, tm, c)

        want = jax.jit(apply_fn)(params, batch["src"], batch["tgt"],
                                 batch["src_mask"], batch["tgt_mask"], center)

        mesh = make_mesh(n_data=2, n_seq=1, n_model=4)
        fwd = tensor_parallel_apply(apply_fn, mesh, params)
        got = fwd(batch["src"], batch["tgt"], batch["src_mask"],
                  batch["tgt_mask"], center)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_train_step_matches_single_device(self):
        """One 2-D (data x model) step == the same step on one device."""
        model, params, batch = _tiny_model_and_batch()
        opt = optim.generator_optimizer(TrainConfig(), steps_per_epoch=10)
        step = make_registration_train_step(model, opt)
        copy = lambda tree: jax.tree_util.tree_map(jnp.array, tree)

        s1, m1, _ = step(init_train_state(copy(params), opt), batch)

        mesh = make_mesh(n_data=2, n_seq=1, n_model=4)
        tp_step = tensor_parallel_step(step, mesh)
        s2, m2, _ = tp_step(init_train_state(copy(params), opt), batch)

        assert float(m1["point_loss"]) == pytest.approx(
            float(m2["point_loss"]), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_params_actually_sharded(self):
        model, params, _ = _tiny_model_and_batch()
        mesh = make_mesh(n_data=1, n_seq=1, n_model=8)
        sharded = shard_params_tensor_parallel(params, mesh)
        k = sharded["trunk"]["stem_0"]["q_proj"]["kernel"]
        assert k.sharding.spec == jax.sharding.PartitionSpec(None, "model")
        # Local shard on each device is 1/8 of the columns.
        assert k.addressable_shards[0].data.shape == (k.shape[0], k.shape[1] // 8)


class TestPipelineParallel:
    def _stages(self, n_stages, d_model=32, heads=4):
        block = AttentionBlock(d_model, heads, dtype=jnp.float32)
        x = jnp.zeros((2, 16, d_model), jnp.float32)
        params = [
            block.init(jax.random.PRNGKey(i), x, x, x)["params"]
            for i in range(n_stages)
        ]
        return block, params

    @pytest.mark.parametrize("n_stages,n_micro", [(4, 8), (8, 8), (2, 3)])
    def test_matches_sequential(self, rng, n_stages, n_micro):
        d_model = 32
        block, stage_params = self._stages(n_stages, d_model)
        mesh = make_pipeline_mesh(n_stages)
        x = jnp.asarray(
            rng.standard_normal((n_micro, 2, 16, d_model)), jnp.float32)

        def stage_fn(p, h):
            return block.apply({"params": p}, h, h, h)

        # Oracle: run each microbatch through all stages sequentially.
        want = x
        for p in stage_params:
            want = jax.vmap(lambda h, p=p: stage_fn(p, h))(want)

        stacked = stack_stage_params(stage_params)
        got = pipeline_parallel_apply(stage_fn, stacked, x, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_pytree_state(self, rng):
        """Stages whose activation is a (src, tgt) tuple pipeline correctly."""
        n_stages, n_micro, d = 4, 6, 32
        block, stage_params = self._stages(n_stages, d)
        mesh = make_pipeline_mesh(n_stages)
        src = jnp.asarray(rng.standard_normal((n_micro, 1, 16, d)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((n_micro, 1, 16, d)), jnp.float32)

        def stage_fn(p, state):
            s, t = state
            return block.apply({"params": p}, s, t, t), t

        want = (src, tgt)
        for p in stage_params:
            want = jax.vmap(lambda st, p=p: stage_fn(p, st))(want)

        got = pipeline_parallel_apply(
            stage_fn, stack_stage_params(stage_params), (src, tgt), mesh)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-4)


class TestPipelineTraining:
    """GPipe *training*: gradients and optimizer steps through the pipelined
    forward must match the sequential layer stack exactly (fp32)."""

    def _setup(self, rng, n_stages=4, n_micro=8, d_model=32):
        block = AttentionBlock(d_model, 4, dtype=jnp.float32)
        x0 = jnp.zeros((2, 16, d_model), jnp.float32)
        stage_params = [
            block.init(jax.random.PRNGKey(i), x0, x0, x0)["params"]
            for i in range(n_stages)
        ]
        mesh = make_pipeline_mesh(n_stages)
        x = jnp.asarray(
            rng.standard_normal((n_micro, 2, 16, d_model)), jnp.float32)
        tgt = jnp.asarray(
            rng.standard_normal((n_micro, 2, 16, d_model)), jnp.float32)

        def stage_fn(p, h):
            return block.apply({"params": p}, h, h, h)

        def loss_fn(preds, targets):
            return jnp.mean((preds - targets) ** 2)

        def sequential_loss(stacked, x=x, tgt=tgt):
            # Oracle: scan the stage stack over every microbatch at once.
            def layer(h, p):
                return jax.vmap(lambda hh: stage_fn(p, hh))(h), None
            out, _ = jax.lax.scan(layer, x, stacked)
            return loss_fn(out, tgt)

        stacked = stack_stage_params(stage_params)
        return stage_fn, loss_fn, sequential_loss, stacked, x, tgt, mesh

    @pytest.mark.parametrize("remat", [False, True])
    def test_grads_match_sequential(self, rng, remat):
        stage_fn, loss_fn, seq_loss, stacked, x, tgt, mesh = self._setup(rng)
        want_loss, want_grads = jax.value_and_grad(seq_loss)(stacked)
        got_loss, got_grads = pipeline_parallel_grads(
            stage_fn, loss_fn, stacked, x, tgt, mesh, remat=remat)
        assert float(got_loss) == pytest.approx(float(want_loss), rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(want_grads),
                        jax.tree_util.tree_leaves(got_grads)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-5)

    def test_train_step_matches_sequential(self, rng):
        import optax

        stage_fn, loss_fn, seq_loss, stacked, x, tgt, mesh = self._setup(rng)
        opt = optax.adam(1e-3)
        copy = lambda tree: jax.tree_util.tree_map(jnp.array, tree)

        # Oracle: one adam step on the sequential loss.
        p1 = copy(stacked)
        o1 = opt.init(p1)
        loss1, g1 = jax.value_and_grad(seq_loss)(p1)
        u1, o1 = opt.update(g1, o1, p1)
        p1 = optax.apply_updates(p1, u1)

        p2 = copy(stacked)
        p2, o2, loss2 = pipeline_train_step(
            stage_fn, loss_fn, opt, p2, opt.init(p2), x, tgt, mesh)
        assert float(loss2) == pytest.approx(float(loss1), rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            # Same math, different XLA graphs (pipelined vs sequential, and
            # the block-tail LN inlining) -> ~1e-6 fp32 reassociation noise
            # through one adam step; 1e-5 matches the grads test above.
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

    def test_loss_decreases_over_steps(self, rng):
        """Three pipelined steps actually train (loss strictly decreases)."""
        import optax

        stage_fn, loss_fn, _, stacked, x, tgt, mesh = self._setup(
            rng, n_stages=2, n_micro=4)
        opt = optax.adam(1e-2)
        params, opt_state = stacked, opt.init(stacked)
        losses = []
        for _ in range(3):
            params, opt_state, loss = pipeline_train_step(
                stage_fn, loss_fn, opt, params, opt_state, x, tgt, mesh)
            losses.append(float(loss))
        assert losses[2] < losses[1] < losses[0]


class TestExpertParallel:
    @pytest.mark.parametrize("n_experts,n_shards", [(8, 8), (8, 4), (4, 2)])
    def test_matches_reference(self, rng, n_experts, n_shards):
        d, f = 16, 32
        params = init_moe_ffn_params(jax.random.PRNGKey(0), d, f, n_experts)
        x = jnp.asarray(rng.standard_normal((2, 24, d)), jnp.float32)
        want = moe_ffn_reference(params, x)
        mesh = make_expert_mesh(n_shards)
        got = expert_parallel_moe_ffn(mesh, params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_grads_match_reference(self, rng):
        """EP training works: gradients through the sharded dispatch equal
        the single-device oracle's (the shard_map psum transposes cleanly)."""
        d, f, E = 16, 32, 4
        params = init_moe_ffn_params(jax.random.PRNGKey(0), d, f, E)
        x = jnp.asarray(rng.standard_normal((2, 24, d)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((2, 24, d)), jnp.float32)
        mesh = make_expert_mesh(4)

        ref_loss = lambda p: jnp.mean((moe_ffn_reference(p, x) - tgt) ** 2)
        ep_loss = lambda p: jnp.mean(
            (expert_parallel_moe_ffn(mesh, p, x) - tgt) ** 2)
        want_l, want_g = jax.value_and_grad(ref_loss)(params)
        got_l, got_g = jax.value_and_grad(ep_loss)(params)
        assert float(got_l) == pytest.approx(float(want_l), rel=1e-6)
        for k in params:
            np.testing.assert_allclose(np.asarray(got_g[k]),
                                       np.asarray(want_g[k]), atol=1e-5)

    def test_routing_covers_all_experts(self, rng):
        """Sanity: with random inputs every expert wins somewhere, so the
        EP path exercises real routing, not a degenerate single expert."""
        d, f, E = 16, 32, 4
        params = init_moe_ffn_params(jax.random.PRNGKey(1), d, f, E)
        x = jnp.asarray(rng.standard_normal((4, 64, d)), jnp.float32)
        top = np.asarray(jnp.argmax(jax.nn.softmax(x @ params["gate"]), -1))
        assert len(np.unique(top)) == E


class TestFlagshipPipeline:
    """PP on the REAL PointTransformer (heterogeneous stack): the packed
    slot schedule (`parallel/pp_flagship.py`) must reproduce `model.apply`
    bit-exactly in fp32, train leaf-close vs the single-device step, and be
    reachable via the `--mesh pipe=N` trainer path."""

    def _fixture(self, rng, self_layers=2, cross_layers=2):
        from scream_tpu.config import ModelConfig

        cfg = ModelConfig(dtype="float32", self_layers=self_layers,
                          cross_layers=cross_layers)
        model = PointTransformer(cfg)
        B, N, M = 8, 64, 96
        src = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
        sm = jnp.asarray(rng.random((B, N)) > 0.1)
        tm = jnp.asarray(rng.random((B, M)) > 0.1)
        ctr = jnp.asarray(rng.standard_normal((B, 1, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), src, tgt, sm, tm,
                            ctr)["params"]
        return cfg, model, params, (src, tgt, sm, tm, ctr)

    @pytest.mark.parametrize("n_stages", [2, 3, 4])
    def test_forward_bit_exact(self, rng, n_stages):
        """2 and 3 divide the 6-slot schedule; 4 exercises NOOP padding."""
        from scream_tpu.parallel.pp_flagship import flagship_pp_forward

        cfg, model, params, (src, tgt, sm, tm, ctr) = self._fixture(rng)
        want = model.apply({"params": params}, src, tgt, sm, tm, ctr)
        mesh = make_pipeline_mesh(n_stages)
        got = flagship_pp_forward(params, cfg, src, tgt, sm, tm, ctr,
                                  mesh, n_micro=4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_forward_data_pipe_mesh(self, rng):
        from jax.sharding import Mesh

        from scream_tpu.parallel.pp_flagship import flagship_pp_forward

        cfg, model, params, (src, tgt, sm, tm, ctr) = self._fixture(rng)
        want = model.apply({"params": params}, src, tgt, sm, tm, ctr)
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("data", "pipe"))
        got = flagship_pp_forward(params, cfg, src, tgt, sm, tm, ctr,
                                  mesh, n_micro=2, data_axis="data")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_train_step_matches_single_device(self, rng):
        from jax.sharding import Mesh

        from scream_tpu.config import TrainConfig
        from scream_tpu.parallel.pp_flagship import (
            make_pp_registration_train_step,
        )
        from scream_tpu.train import optim
        from scream_tpu.train.steps import (
            init_train_state,
            make_registration_train_step,
        )

        cfg, model, params, (src, tgt, sm, tm, _) = self._fixture(rng)
        rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (8, 3, 3))
        trans = jnp.asarray(rng.standard_normal((8, 3, 1)) * 0.1, jnp.float32)
        batch = dict(src=src, tgt=tgt,
                     src_mask=sm.astype(jnp.float32),
                     tgt_mask=tm.astype(jnp.float32),
                     rot=rot, trans=trans)
        opt = optim.generator_optimizer(TrainConfig(), 100)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        state_a = init_train_state(copy(params), opt)
        state_b = init_train_state(copy(params), opt)

        ref_step = make_registration_train_step(model, opt)
        sa, ma, _ = ref_step(state_a, batch)

        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("data", "pipe"))
        pp_step = make_pp_registration_train_step(cfg, opt, mesh, n_micro=4,
                                                  data_axis="data")
        sb, mb, _ = pp_step(state_b, batch)

        # Forward is bit-exact (loss identical); one adam step through the
        # pipelined backward picks up ~1e-6 fp32 reassociation (microbatch
        # grad accumulation order) — same standard as TestPipelineTraining.
        assert float(mb["loss"]) == pytest.approx(float(ma["loss"]), rel=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                        jax.tree_util.tree_leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

    def test_trainer_cli_mesh_spec(self):
        """parse_mesh_spec accepts pipe=N and builds the (data, pipe) mesh;
        pipe composes with data only."""
        from scream_tpu.parallel.mesh import parse_mesh_spec

        mesh = parse_mesh_spec("data=2,pipe=4")
        assert mesh.axis_names == ("data", "pipe")
        assert mesh.shape["data"] == 2 and mesh.shape["pipe"] == 4
        with pytest.raises(ValueError, match="pipe"):
            parse_mesh_spec("seq=2,pipe=4")
