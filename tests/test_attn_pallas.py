"""Fully fused attention block (`ops/attn_pallas.py`).

Equivalence layers mirroring `test_ffn_pallas.py`:
  * the unfused XLA body (`_block_xla`) reproduces the literal
    AttentionBlock composition — separate projections + linear attention +
    tail (the reference's MHAttention+FFN block,
    `/root/reference/models/transformer.py:47-90`);
  * the two Pallas kernels (interpret mode on CPU) match the XLA body,
    including padded/masked rows and cross-attention (L != S);
  * gradients through the custom_vjp (bwd = XLA vjp over saved primals)
    match the unfused autodiff exactly.

NOTE on degenerate losses: the block ends in LayerNorm, so
``sum(out**2)`` with unit scale/zero bias is the constant ``L*d`` and its
gradient is pure fp noise — gradient tests must project the output against
a random matrix instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scream_tpu.ops.attn_pallas import (
    _block_xla, _make_attention_block, attention_block, fusable_block)


def _rand_args(rng, B=2, L=300, S=200, d=256, H=8, hid=None, masked=True):
    hid = hid or 4 * d
    a = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    xq, xkv = a(B, L, d), a(B, S, d)
    if masked:
        qm = jnp.asarray(rng.random((B, L)) > 0.2)
        km = jnp.asarray(rng.random((B, S)) > 0.2)
    else:
        qm, km = jnp.ones((B, L), bool), jnp.ones((B, S), bool)
    Wq, Wk, Wv, Wm = a(d, d), a(d, d), a(d, d), a(d, d)
    g1, g2 = 1.0 + 0.1 * a(d), 1.0 + 0.1 * a(d)
    b1, b2 = 0.1 * a(d), 0.1 * a(d)
    W1, W2 = a(d, hid), a(hid, d)
    return (xq, xkv, qm, km, Wq, Wk, Wv, Wm, g1, b1, W1, W2, g2, b2)


def _flax_block(args, num_heads, dtype, norm_dtype):
    """The literal AttentionBlock module (unfused flax path) on an
    explicit param tree built from the raw weights."""
    from scream_tpu.models.attention import AttentionBlock

    (xq, xkv, qm, km, Wq, Wk, Wv, Wm, g1, b1, W1, W2, g2, b2) = args
    d = Wq.shape[0]
    params = {
        "q_proj": {"kernel": Wq}, "k_proj": {"kernel": Wk},
        "v_proj": {"kernel": Wv}, "merge": {"kernel": Wm},
        "norm1": {"scale": g1, "bias": b1},
        "norm2": {"scale": g2, "bias": b2},
        "ffn_in": {"kernel": W1}, "ffn_out": {"kernel": W2},
    }
    blk = AttentionBlock(d_model=d, num_heads=num_heads,
                         ffn_mult=W1.shape[1] // d, dtype=dtype,
                         norm_dtype=norm_dtype, fused_tail=False,
                         fused_attn=False)
    return blk.apply({"params": params}, xq, xkv, xkv, qm, km)


def _masked_close(got, want, qm, atol, rtol):
    m = np.asarray(qm)[..., None]
    np.testing.assert_allclose(np.asarray(got, np.float32) * m,
                               np.asarray(want, np.float32) * m,
                               atol=atol, rtol=rtol)


class TestAttentionBlockFused:
    def test_xla_body_matches_flax_composition(self):
        """_block_xla (the vjp body / fallback) == the real flax module."""
        args = _rand_args(np.random.default_rng(0))
        got = _block_xla(*args, num_heads=8, cd=jnp.float32, nd=jnp.float32,
                         attn_eps=1e-6, ln_eps=1e-5)
        want = _flax_block(args, 8, jnp.float32, jnp.float32)
        _masked_close(got, want, args[2], 1e-6, 1e-6)

    @pytest.mark.parametrize("L,S", [(256, 256), (300, 200), (100, 500)])
    def test_pallas_interpret_matches_xla_f32(self, L, S):
        """Fused kernels vs unfused body across exact-tile, pad-both, and
        cross-attention (L != S) shapes; fp32 compute keeps fp32 KV so the
        only divergence is reduction-order noise."""
        args = _rand_args(np.random.default_rng(1), L=L, S=S)
        got = attention_block(*args, num_heads=8, dtype=jnp.float32,
                              norm_dtype=jnp.float32, use_pallas=True,
                              interpret=True)
        want = attention_block(*args, num_heads=8, dtype=jnp.float32,
                               norm_dtype=jnp.float32, use_pallas=False)
        assert got.shape == want.shape == args[0].shape
        _masked_close(got, want, args[2], 3e-5, 3e-5)

    def test_pallas_interpret_bf16(self):
        """bf16 compute: the split-KV (hi + residual) apply dot keeps the
        divergence at ordinary bf16 activation rounding."""
        args = _rand_args(np.random.default_rng(2), L=200, S=300)
        got = attention_block(*args, num_heads=8, dtype=jnp.bfloat16,
                              norm_dtype=jnp.float32, use_pallas=True,
                              interpret=True)
        want = attention_block(*args, num_heads=8, dtype=jnp.bfloat16,
                               norm_dtype=jnp.float32, use_pallas=False)
        _masked_close(got, want, args[2], 5e-2, 5e-2)

    def test_fully_masked_rows_are_finite(self):
        """All-pad kv rows must not poison the statistics (normalizer is
        eps-guarded); all-pad q rows must still emit finite values."""
        args = list(_rand_args(np.random.default_rng(3), B=2, L=260, S=260))
        qm = np.ones((2, 260), bool); qm[1, 5:] = False
        km = np.ones((2, 260), bool); km[1, :] = False
        args[2], args[3] = jnp.asarray(qm), jnp.asarray(km)
        got = attention_block(*args, num_heads=8, dtype=jnp.float32,
                              norm_dtype=jnp.float32, use_pallas=True,
                              interpret=True)
        assert bool(jnp.all(jnp.isfinite(got)))
        want = attention_block(*args, num_heads=8, dtype=jnp.float32,
                               norm_dtype=jnp.float32, use_pallas=False)
        _masked_close(got, want, args[2], 3e-5, 3e-5)

    def test_grad_matches_unfused(self):
        """custom_vjp bwd == unfused autodiff, exactly (same XLA vjp graph
        over the same saved primals). Random projection loss — see module
        docstring for why sum-of-squares is degenerate here."""
        args = _rand_args(np.random.default_rng(4), L=130, S=70)
        rng = np.random.default_rng(5)
        proj = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))

        def loss(flag, *a):
            out = attention_block(*a, num_heads=8, dtype=jnp.float32,
                                  norm_dtype=jnp.float32, use_pallas=flag,
                                  interpret=flag)
            return jnp.sum(jnp.where(a[2][..., None], out * proj, 0.0))

        wi = (0, 1, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)
        gf = jax.grad(lambda *a: loss(True, *a), argnums=wi)(*args)
        gr = jax.grad(lambda *a: loss(False, *a), argnums=wi)(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_fusable_gate(self):
        assert fusable_block(256, 1024, 8, jnp.bfloat16)
        assert not fusable_block(96, 384, 8, jnp.bfloat16)   # not MXU-aligned
        assert not fusable_block(256, 1024, 3, jnp.bfloat16)  # head split
        assert not fusable_block(1024, 4096, 8, jnp.float32)  # VMEM budget

    def test_auto_resolution_off_tpu(self):
        """On the forced-CPU test backend use_pallas=None must take the XLA
        path (no Mosaic lowering attempted)."""
        args = _rand_args(np.random.default_rng(6), L=40, S=40)
        got = attention_block(*args, num_heads=8, dtype=jnp.float32,
                              norm_dtype=jnp.float32)
        want = attention_block(*args, num_heads=8, dtype=jnp.float32,
                               norm_dtype=jnp.float32, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestModelIntegration:
    def test_model_fused_attention_interpret_equivalence(self):
        """PointTransformer(fused_attention via interpret) == default XLA
        path — same params, real module, covers self- AND cross-attention
        call sites (k is v there: shared kv source)."""
        from scream_tpu.config import ModelConfig
        from scream_tpu.models.point_transformer import PointTransformer

        rng = np.random.default_rng(7)
        B, N = 2, 64
        src = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        sm = jnp.asarray(rng.random((B, N)) > 0.1)
        tm = jnp.asarray(rng.random((B, N)) > 0.1)
        ctr = jnp.zeros((B, 1, 3), np.float32)

        base_cfg = ModelConfig(d_model=128, num_heads=4, self_layers=1,
                               cross_layers=1, dtype="float32",
                               fused_attention=False, fused_block_tail=False)
        model = PointTransformer(base_cfg)
        params = model.init(jax.random.PRNGKey(0), src, tgt, sm, tm, ctr)
        want = model.apply(params, src, tgt, sm, tm, ctr)

        import scream_tpu.ops.attn_pallas as ap
        orig = ap.attention_block

        def forced(*a, **kw):
            kw["use_pallas"] = True
            kw["interpret"] = True
            return orig(*a, **kw)

        ap.attention_block = forced
        try:
            fused_cfg = ModelConfig(d_model=128, num_heads=4, self_layers=1,
                                    cross_layers=1, dtype="float32",
                                    fused_attention=True,
                                    fused_block_tail=False)
            got = PointTransformer(fused_cfg).apply(
                params, src, tgt, sm, tm, ctr)
        finally:
            ap.attention_block = orig
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4)

    def test_param_layout_unchanged(self):
        """Hoisting the tail params above the fused-attn branch must keep
        the exact param tree (checkpoints, .pth converter, TP specs)."""
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
