"""Fused attention-block tail (`ops/ffn_pallas.py`).

Three equivalence layers:
  * the unfused XLA body reproduces the literal flax module composition
    (Dense/LayerNorm/Dense/relu/Dense/LayerNorm) bit-for-bit — proof the
    AttentionBlock refactor changed nothing off-TPU;
  * the Pallas kernel (interpret mode on CPU) matches the XLA body;
  * gradients flow through the custom_vjp (whose bwd is the XLA vjp on the
    saved primals) and match the unfused path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from scream_tpu.ops.ffn_pallas import _make_block_tail, block_tail, fusable


def _rand_args(rng, R=48, d=256, hid=None, batch=2):
    hid = hid or 4 * d
    x = rng.standard_normal((batch, R, d)).astype(np.float32)
    q = rng.standard_normal((batch, R, d)).astype(np.float32)
    Wm = (rng.standard_normal((d, d)) / np.sqrt(d)).astype(np.float32)
    g1 = rng.uniform(0.5, 1.5, (d,)).astype(np.float32)
    b1 = rng.standard_normal((d,)).astype(np.float32) * 0.1
    W1 = (rng.standard_normal((d, hid)) / np.sqrt(d)).astype(np.float32)
    W2 = (rng.standard_normal((hid, d)) / np.sqrt(hid)).astype(np.float32)
    g2 = rng.uniform(0.5, 1.5, (d,)).astype(np.float32)
    b2 = rng.standard_normal((d,)).astype(np.float32) * 0.1
    return tuple(jnp.asarray(a) for a in (x, q, Wm, g1, b1, W1, W2, g2, b2))


def _flax_tail(x, q, Wm, g1, b1, W1, W2, g2, b2, dtype, norm_dtype):
    """The literal pre-refactor module composition from AttentionBlock."""
    d, hid = Wm.shape[0], W1.shape[1]
    dense = lambda feats, W: nn.Dense(
        feats, use_bias=False, dtype=dtype, param_dtype=jnp.float32
    ).bind({"params": {"kernel": W}})
    ln = lambda g, b: nn.LayerNorm(epsilon=1e-5, dtype=norm_dtype).bind(
        {"params": {"scale": g, "bias": b}})
    m = dense(d, Wm)(x)
    t = ln(g1, b1)(m + q.astype(dtype)).astype(dtype)
    h = nn.relu(dense(hid, W1)(t))
    f = dense(d, W2)(h)
    return ln(g2, b2)(q.astype(dtype) + f).astype(dtype)


class TestBlockTail:
    def test_xla_body_matches_flax_composition_f32(self):
        """The unfused fallback is bit-identical to the old flax modules."""
        args = _rand_args(np.random.default_rng(0))
        got = block_tail(*args, dtype=jnp.float32, norm_dtype=jnp.float32,
                         use_pallas=False)
        want = _flax_tail(*args, dtype=jnp.float32, norm_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_xla_body_matches_flax_composition_bf16(self):
        args = _rand_args(np.random.default_rng(1), R=32, d=128)
        got = block_tail(*args, dtype=jnp.bfloat16, norm_dtype=jnp.float32,
                         use_pallas=False)
        want = _flax_tail(*args, dtype=jnp.bfloat16, norm_dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))

    @pytest.mark.parametrize("R", [48, 256, 300])
    def test_pallas_interpret_matches_xla(self, R):
        """Kernel vs unfused body — includes row counts that exercise the
        pad-to-tile path (48, 300) and the exact-tile path (256)."""
        args = _rand_args(np.random.default_rng(2), R=R, d=128)
        fused = _make_block_tail("float32", "float32", 1e-5, True, True)
        got = fused(*args)
        want = block_tail(*args, dtype=jnp.float32, norm_dtype=jnp.float32,
                          use_pallas=False)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_pallas_interpret_bf16(self):
        args = _rand_args(np.random.default_rng(3), R=64, d=128)
        fused = _make_block_tail("bfloat16", "float32", 1e-5, True, True)
        got = np.asarray(fused(*args), np.float32)
        want = np.asarray(
            block_tail(*args, dtype=jnp.bfloat16, norm_dtype=jnp.float32,
                       use_pallas=False), np.float32)
        # bf16 matmul outputs round identically (both fp32-accumulate then
        # cast); LN stats are fp32 both ways — only elementwise fp noise.
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    def test_grad_matches_unfused(self):
        """custom_vjp bwd (XLA vjp over saved primals) == unfused autodiff."""
        args = _rand_args(np.random.default_rng(4), R=32, d=128)
        fused = _make_block_tail("float32", "float32", 1e-5, True, True)

        def loss_fused(*a):
            return jnp.sum(jnp.square(fused(*a)))

        def loss_ref(*a):
            return jnp.sum(jnp.square(
                block_tail(*a, dtype=jnp.float32, norm_dtype=jnp.float32,
                           use_pallas=False)))

        gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_fusable_gate(self):
        assert fusable(256, 1024, jnp.bfloat16)
        assert fusable(512, 2048, jnp.bfloat16)
        assert not fusable(96, 384, jnp.bfloat16)   # not MXU-aligned
        assert not fusable(1024, 4096, jnp.bfloat16)  # VMEM budget

    def test_auto_resolution_off_tpu(self):
        """On the forced-CPU test backend, use_pallas=None must take the
        XLA path (no Mosaic lowering attempted)."""
        args = _rand_args(np.random.default_rng(5), R=16, d=128)
        got = block_tail(*args, dtype=jnp.float32, norm_dtype=jnp.float32)
        want = block_tail(*args, dtype=jnp.float32, norm_dtype=jnp.float32,
                          use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestModelIntegration:
    def test_attention_block_fused_flag_equivalence(self):
        """AttentionBlock(fused_tail=interpret-pallas) == default (XLA) —
        same params, same inputs, through the real flax module."""
        from scream_tpu.models.attention import AttentionBlock

        rng = np.random.default_rng(6)
        q = jnp.asarray(rng.standard_normal((2, 40, 128)).astype(np.float32))
        mask = jnp.ones((2, 40), bool)
        blk = AttentionBlock(d_model=128, num_heads=4)
        params = blk.init(jax.random.PRNGKey(0), q, q, q, mask, mask)

        base = blk.apply(params, q, q, q, mask, mask)

        import scream_tpu.models.attention as attn_mod
        from scream_tpu.ops import ffn_pallas

        orig = ffn_pallas.block_tail

        def forced(*a, **kw):
            kw["use_pallas"] = True
            kw["interpret"] = True
            return orig(*a, **kw)

        ffn_pallas.block_tail = forced
        try:
            fused = blk.apply(params, q, q, q, mask, mask)
        finally:
            ffn_pallas.block_tail = orig
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   atol=2e-5, rtol=2e-5)

    def test_point_transformer_param_layout_unchanged(self):
        """The refactor must keep the exact param tree (checkpoints, .pth
        converter, TP specs all key on these names/shapes)."""
        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer

        cfg = ModelConfig(d_model=32, num_heads=2, self_layers=1,
                          cross_layers=1, dtype="float32")
        model = PointTransformer(cfg)
        z = jnp.zeros((1, 8, 3))
        params = model.init(jax.random.PRNGKey(0), z, z,
                            jnp.ones((1, 8), bool), jnp.ones((1, 8), bool),
                            jnp.zeros((1, 1, 3)))["params"]
        blk = params["trunk"]["stem_0"]
        assert set(blk.keys()) == {
            "q_proj", "k_proj", "v_proj", "merge", "norm1", "ffn_in",
            "ffn_out", "norm2"}
        assert blk["merge"]["kernel"].shape == (32, 32)
        assert set(blk["norm1"].keys()) == {"scale", "bias"}
        assert blk["norm1"]["scale"].shape == (32,)
        assert blk["ffn_in"]["kernel"].shape == (32, 128)
        assert blk["ffn_out"]["kernel"].shape == (128, 32)
        for leaf in jax.tree_util.tree_leaves(blk):
            assert leaf.dtype == jnp.float32
