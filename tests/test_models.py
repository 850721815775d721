"""Model-layer tests: PE/attention parity with numpy oracles, masking
invariance, batch consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scream_tpu.config import ModelConfig
from scream_tpu.models import (
    PointTransformer,
    DEMTransformer,
    linear_attention,
    sinusoidal_pe,
)

TINY = ModelConfig(d_model=24, num_heads=2, self_layers=2, cross_layers=2, dtype="float32")


def np_sinusoidal_pe(xyz, d_model, n_dim=3, temperature=10000.0):
    """Independent numpy oracle for the reference PE formula
    (models/transformer.py:157-179)."""
    num_pos_feats = d_model // n_dim // 2 * 2
    padding = d_model - num_pos_feats * n_dim
    dim_t = temperature ** (2 * np.trunc(np.arange(num_pos_feats) / 2) / num_pos_feats)
    pos = xyz * 2 * np.pi
    pos_div = pos[..., None] / dim_t
    sin = np.sin(pos_div[..., 0::2])
    cos = np.cos(pos_div[..., 1::2])
    pe = np.stack([sin, cos], axis=-1).reshape(*xyz.shape[:-1], -1)
    return np.pad(pe, [(0, 0)] * (pe.ndim - 1) + [(0, padding)])


def np_linear_attention(q, k, v, eps=1e-6):
    """Numpy oracle for elu+1 linear attention (models/transformer.py:28-44)."""
    elu1 = lambda x: np.where(x > 0, x + 1.0, np.exp(x))
    Q, K = elu1(q), elu1(k)
    KV = np.einsum("bshd,bshv->bhdv", K, v)
    Z = 1.0 / (np.einsum("blhd,bhd->blh", Q, K.sum(axis=1)) + eps)
    return np.einsum("blhd,bhdv,blh->blhv", Q, KV, Z)


class TestPositionEmbedding:
    def test_matches_reference_formula(self, rng):
        xyz = rng.normal(size=(2, 17, 3)).astype(np.float32)
        ours = np.asarray(sinusoidal_pe(jnp.asarray(xyz), 256))
        ref = np_sinusoidal_pe(xyz, 256)
        assert ours.shape == (2, 17, 256)
        assert np.allclose(ours, ref, atol=1e-4)
        # padding channels are exactly zero (d_model=256, n_dim=3 -> 4 pad)
        assert (ours[..., 252:] == 0).all()

    def test_small_dims(self, rng):
        xyz = rng.normal(size=(5, 3)).astype(np.float32)
        ours = np.asarray(sinusoidal_pe(jnp.asarray(xyz), 24))
        ref = np_sinusoidal_pe(xyz, 24)
        assert np.allclose(ours, ref, atol=1e-5)


class TestLinearAttention:
    def test_matches_oracle(self, rng):
        q = rng.normal(size=(2, 9, 2, 4)).astype(np.float32)
        k = rng.normal(size=(2, 13, 2, 4)).astype(np.float32)
        v = rng.normal(size=(2, 13, 2, 4)).astype(np.float32)
        ours = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        ref = np_linear_attention(q, k, v)
        assert np.allclose(ours, ref, atol=1e-4)

    def test_kv_mask_equals_truncation(self, rng):
        """Masked padded keys/values == computing on the unpadded arrays."""
        q = rng.normal(size=(1, 6, 2, 4)).astype(np.float32)
        k = rng.normal(size=(1, 10, 2, 4)).astype(np.float32)
        v = rng.normal(size=(1, 10, 2, 4)).astype(np.float32)
        kv_mask = (np.arange(10) < 7)[None]
        ours = np.asarray(
            linear_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_mask=jnp.asarray(kv_mask)
            )
        )
        ref = np_linear_attention(q, k[:, :7], v[:, :7])
        assert np.allclose(ours, ref, atol=1e-4)


class TestQKVFusion:
    def test_fused_matches_separate_projections(self, rng):
        """Passing the same traced array as q/k/v selects the fused qkv
        matmul; distinct arrays with equal values select three separate
        matmuls. Both must agree (the fusion is a pure layout change)."""
        import numpy as np

        from scream_tpu.models.attention import AttentionBlock

        blk = AttentionBlock(64, 4, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.float32)
        params = blk.init(jax.random.PRNGKey(2), x, x, x)["params"]
        fused = blk.apply({"params": params}, x, x, x)
        # x + 0.0 twice -> three distinct tracers -> unfused branch.
        unfused = blk.apply({"params": params}, x, x + 0.0, x + 0.0)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), atol=1e-5)
        # Cross-attention kv fusion: (q, kv, kv) vs fully separate.
        y = jnp.asarray(rng.standard_normal((2, 24, 64)), jnp.float32)
        kv_fused = blk.apply({"params": params}, x, y, y)
        kv_unfused = blk.apply({"params": params}, x, y, y + 0.0)
        np.testing.assert_allclose(
            np.asarray(kv_fused), np.asarray(kv_unfused), atol=1e-5)

    def test_param_layout_unchanged(self):
        """The fused block keeps nn.Dense's {proj: {kernel}} param layout —
        shipped orbax checkpoints and the .pth converter depend on it."""
        from scream_tpu.models.attention import AttentionBlock

        blk = AttentionBlock(32, 4, dtype=jnp.float32)
        x = jnp.zeros((1, 8, 32), jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x, x, x)["params"]
        for name in ("q_proj", "k_proj", "v_proj"):
            assert set(params[name].keys()) == {"kernel"}
            assert params[name]["kernel"].shape == (32, 32)


class TestPointTransformer:
    def _init(self, cfg=TINY, n=32, m=40, batch=2, seed=0):
        rng = np.random.default_rng(seed)
        model = PointTransformer(cfg)
        src = jnp.asarray(rng.normal(size=(batch, n, 3)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(batch, m, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        return model, params, src, tgt

    def test_output_shape(self):
        model, params, src, tgt = self._init()
        out = model.apply(params, src, tgt)
        assert out.shape == (2, 32, 3)
        assert out.dtype == jnp.float32

    def test_jit_compiles(self):
        model, params, src, tgt = self._init()
        out = jax.jit(model.apply)(params, src, tgt)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_invariance(self):
        """Adding masked padding points must not change valid outputs.

        This is the core static-shape correctness property: bucketed padding
        cannot leak into real points through attention or normalization."""
        model, params, src, tgt = self._init(batch=1)
        out_ref = model.apply(params, src, tgt)

        pad_src = jnp.concatenate([src, jnp.full((1, 8, 3), 7.7)], axis=1)
        pad_tgt = jnp.concatenate([tgt, jnp.full((1, 12, 3), -3.3)], axis=1)
        src_mask = jnp.arange(40)[None] < 32
        tgt_mask = jnp.arange(52)[None] < 40
        # keep the same centroid as the unpadded call
        center = jnp.mean(src, axis=1, keepdims=True)
        out_pad = model.apply(params, pad_src, pad_tgt, src_mask, tgt_mask, center)
        assert np.allclose(np.asarray(out_pad)[:, :32], np.asarray(out_ref), atol=2e-4)

    def test_batch_consistency(self):
        """Each batch element is computed independently."""
        model, params, src, tgt = self._init(batch=2)
        out_batch = model.apply(params, src, tgt)
        out_0 = model.apply(params, src[:1], tgt[:1])
        out_1 = model.apply(params, src[1:], tgt[1:])
        assert np.allclose(np.asarray(out_batch)[0], np.asarray(out_0)[0], atol=2e-4)
        assert np.allclose(np.asarray(out_batch)[1], np.asarray(out_1)[0], atol=2e-4)

    def test_stem_weight_sharing(self):
        """PointTransformer shares stem weights between src and tgt
        (reference models/pointnet.py:50-52); DEM variant does not."""
        model, params, *_ = self._init()
        names = jax.tree_util.tree_map(lambda x: None, params["params"]["trunk"]).keys()
        assert any(n.startswith("stem_0") for n in names)
        assert not any(n.startswith("stem_src") for n in names)

    def test_default_center_is_masked_mean(self):
        """Default src_center must ignore padded rows."""
        model, params, src, tgt = self._init(batch=1)
        out_ref = model.apply(params, src, tgt)
        pad_src = jnp.concatenate([src, jnp.full((1, 8, 3), 100.0)], axis=1)
        src_mask = jnp.arange(40)[None] < 32
        out_pad = model.apply(params, pad_src, tgt, src_mask, None)
        assert np.allclose(np.asarray(out_pad)[:, :32], np.asarray(out_ref), atol=2e-4)

    def test_gradients_flow(self):
        model, params, src, tgt = self._init()

        def loss_fn(p):
            pred = model.apply(p, src, tgt)
            return jnp.sum(pred**2)

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)

    def test_loss_masked(self, rng):
        src = rng.normal(size=(2, 10, 3)).astype(np.float32)
        pred = rng.normal(size=(2, 10, 3)).astype(np.float32)
        rot = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
        trans = np.zeros((2, 3, 1), dtype=np.float32)
        full = float(
            PointTransformer.loss(jnp.asarray(pred), jnp.asarray(src), jnp.asarray(rot), jnp.asarray(trans))
        )
        expected = np.abs(pred - src).sum(-1).mean()
        assert abs(full - expected) < 1e-5
        # masked version on padded copies
        pad = np.concatenate([src, np.ones((2, 3, 3), np.float32) * 9], axis=1)
        pad_pred = np.concatenate([pred, np.zeros((2, 3, 3), np.float32)], axis=1)
        mask = np.arange(13)[None].repeat(2, 0) < 10
        masked = float(
            PointTransformer.loss(
                jnp.asarray(pad_pred), jnp.asarray(pad), jnp.asarray(rot), jnp.asarray(trans), jnp.asarray(mask)
            )
        )
        assert abs(masked - expected) < 1e-5


class TestDEMTransformer:
    def test_forward_and_separate_stems(self, rng):
        cfg = ModelConfig(d_model=24, num_heads=2, self_layers=2, cross_layers=2,
                          dtype="float32", separate_stems=True)
        model = DEMTransformer(cfg)
        dsm = jnp.asarray(rng.normal(size=(1, 20, 3)), jnp.float32)
        dem_c = jnp.asarray(rng.normal(size=(1, 8, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), dsm, dem_c)
        out = model.apply(params, dsm, dem_c)
        assert out.shape == (1, 20, 3)
        names = params["params"]["trunk"].keys()
        assert any(n.startswith("stem_src") for n in names)
        assert any(n.startswith("stem_tgt") for n in names)

    def test_bf16_forward_finite(self, rng):
        cfg = ModelConfig(d_model=24, num_heads=2, self_layers=1, cross_layers=1, dtype="bfloat16")
        model = PointTransformer(cfg)
        src = jnp.asarray(rng.normal(size=(1, 16, 3)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(1, 16, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        out = model.apply(params, src, tgt)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()


class TestRemat:
    def test_remat_training_step(self):
        """ModelConfig(remat=True) must train identically (rematerialized
        attention blocks trade recompute for activation memory)."""
        import jax
        import jax.numpy as jnp

        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer

        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
        m = jnp.ones((2, 32), bool)
        c = jnp.zeros((2, 1, 3), jnp.float32)
        rot = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        trans = jnp.zeros((2, 3, 1))

        outs = {}
        for remat in (False, True):
            cfg = ModelConfig(d_model=32, num_heads=4, self_layers=1,
                              cross_layers=1, dtype="float32", remat=remat)
            model = PointTransformer(cfg)
            params = model.init(jax.random.PRNGKey(0), src, tgt, m, m, c)["params"]

            def loss(p):
                pred = model.apply({"params": p}, src, tgt, m, m, c)
                return PointTransformer.loss(pred, src, rot, trans, m)

            l, g = jax.value_and_grad(loss)(params)
            outs[remat] = (float(l), g)
        assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(outs[False][1]),
                        jax.tree_util.tree_leaves(outs[True][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
