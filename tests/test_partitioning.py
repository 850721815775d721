"""Batch-dim SPMD partitioning of the fused Pallas ops (`ops/partitioning.py`).

The fused attention-block and block-tail kernels are embarrassingly parallel
over the pair batch; their ``custom_partitioning`` wrapper must let a
data-sharded jit run the kernel per shard — no resharding collectives, exact
parity with the unsharded op, gradients intact — while shard_map bodies
(manual axes) keep getting the raw impl.

Kernels run in interpret mode on the virtual 8-device CPU mesh (conftest).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scream_tpu.ops.attn_pallas import attention_block
from scream_tpu.ops.ffn_pallas import block_tail
from scream_tpu.parallel.mesh import is_data_only, make_mesh


def _dp_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(n, 1), ("data", "seq"))


def _tail_args(rng, B=16, R=256, d=256, hid=1024):
    x = jnp.asarray(rng.standard_normal((B, R, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, R, d)), jnp.float32)
    W = lambda a, b: jnp.asarray(
        rng.standard_normal((a, b)) / np.sqrt(a), jnp.float32)
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, (d,)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, (d,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    return (x, q, W(d, d), g1, b1, W(d, hid), W(hid, d), g2, b2)


def _attn_args(rng, B=8, L=256, S=256, d=256, hid=1024):
    xq = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    xkv = jnp.asarray(rng.standard_normal((B, S, d)), jnp.float32)
    qm = jnp.asarray(rng.uniform(size=(B, L)) > 0.2)
    km = jnp.asarray(rng.uniform(size=(B, S)) > 0.2)
    W = lambda a, b: jnp.asarray(
        rng.standard_normal((a, b)) / np.sqrt(a), jnp.float32)
    ones, zeros = jnp.ones((d,)), jnp.zeros((d,))
    return (xq, xkv, qm, km, W(d, d), W(d, d), W(d, d), W(d, d),
            ones, zeros, W(d, hid), W(hid, d), ones, zeros)


class TestIsDataOnly:
    def test_data_only_meshes(self):
        assert is_data_only(_dp_mesh())
        assert is_data_only(make_mesh(n_data=8))

    def test_seq_and_model_sharded_meshes(self):
        assert not is_data_only(make_mesh(n_data=4, n_seq=2))
        assert not is_data_only(make_mesh(n_data=4, n_model=2))


class TestBlockTailPartitioned:
    def test_dp_mesh_parity_and_no_collectives(self):
        args = _tail_args(np.random.default_rng(0))
        f = partial(block_tail, dtype=jnp.float32, norm_dtype=jnp.float32,
                    use_pallas=True, interpret=True)
        want = block_tail(*args, dtype=jnp.float32, norm_dtype=jnp.float32,
                          use_pallas=False)
        mesh = _dp_mesh()
        shb = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        sargs = tuple(jax.device_put(a, shb) for a in args[:2]) + tuple(
            jax.device_put(a, rep) for a in args[2:])
        jf = jax.jit(f)
        out = jf(*sargs)
        # Batch dim stays sharded end to end...
        assert out.sharding.spec[0] == "data"
        # ...the kernel ran per shard without gathering the activations...
        hlo = jf.lower(*sargs).compile().as_text()
        # Forced resharding can also surface as all-reduce or
        # collective-permute, not just all-gather — assert none appear.
        for coll in ("all-gather", "all-reduce", "collective-permute"):
            assert coll not in hlo
        # ...and the result is the exact unsharded op (fp32 interpret path
        # is bit-identical to the XLA body here).
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5)

    def test_dp_mesh_gradients_match_unfused(self):
        args = _tail_args(np.random.default_rng(1), B=8, R=128, d=128,
                          hid=512)
        mesh = _dp_mesh()
        shb = NamedSharding(mesh, P("data"))
        x = jax.device_put(args[0], shb)
        q = jax.device_put(args[1], shb)
        rest = args[2:]

        def loss(x, q, W1, fused):
            out = block_tail(x, q, rest[0], rest[1], rest[2], W1, rest[4],
                             rest[5], rest[6], dtype=jnp.float32,
                             norm_dtype=jnp.float32, use_pallas=fused,
                             interpret=fused)
            return jnp.sum(out ** 2)

        g_sh = jax.jit(jax.grad(partial(loss, fused=True),
                                argnums=(0, 1, 2)))(x, q, rest[3])
        g_ref = jax.jit(jax.grad(partial(loss, fused=False),
                                 argnums=(0, 1, 2)))(*args[:2], rest[3])
        for got, want in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4)


class TestAttentionBlockPartitioned:
    def test_dp_mesh_parity_and_no_collectives(self):
        args = _attn_args(np.random.default_rng(2))
        f = partial(attention_block, num_heads=8, dtype=jnp.float32,
                    norm_dtype=jnp.float32, use_pallas=True, interpret=True)
        want = attention_block(*args, num_heads=8, dtype=jnp.float32,
                               norm_dtype=jnp.float32, use_pallas=False)
        mesh = _dp_mesh()
        shb = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        sargs = tuple(jax.device_put(a, shb) for a in args[:4]) + tuple(
            jax.device_put(a, rep) for a in args[4:])
        jf = jax.jit(f)
        out = jf(*sargs)
        assert out.sharding.spec[0] == "data"
        hlo = jf.lower(*sargs).compile().as_text()
        # Forced resharding can also surface as all-reduce or
        # collective-permute, not just all-gather — assert none appear.
        for coll in ("all-gather", "all-reduce", "collective-permute"):
            assert coll not in hlo
        # fp32 configs keep fp32 KV — only benign reduction-order noise.
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-4)

    def test_dp_mesh_gradients_match_unfused(self):
        args = _attn_args(np.random.default_rng(3), B=8, L=128, S=128,
                          d=128, hid=512)
        mesh = _dp_mesh()
        shb = NamedSharding(mesh, P("data"))
        xq = jax.device_put(args[0], shb)
        rest = args[1:]

        def loss(xq, Wq, fused):
            out = attention_block(xq, rest[0], rest[1], rest[2], Wq,
                                  *rest[4:], num_heads=8, dtype=jnp.float32,
                                  norm_dtype=jnp.float32, use_pallas=fused,
                                  interpret=fused)
            return jnp.sum(out ** 2)

        g_sh = jax.jit(jax.grad(partial(loss, fused=True),
                                argnums=(0, 1)))(xq, rest[3])
        g_ref = jax.jit(jax.grad(partial(loss, fused=False),
                                 argnums=(0, 1)))(args[0], rest[3])
        for got, want in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4)

    def test_shard_map_body_uses_raw_impl(self):
        """Inside shard_map (manual axes) the op must bypass
        custom_partitioning — it is meaningless under manual sharding —
        and still compute correctly per shard."""
        args = _attn_args(np.random.default_rng(4))
        f = partial(attention_block, num_heads=8, dtype=jnp.float32,
                    norm_dtype=jnp.float32, use_pallas=True, interpret=True)
        want = attention_block(*args, num_heads=8, dtype=jnp.float32,
                               norm_dtype=jnp.float32, use_pallas=False)
        mesh = _dp_mesh()
        sm = jax.jit(shard_map(
            f, mesh=mesh,
            in_specs=(P("data"),) * 4 + (P(),) * 10,
            out_specs=P("data"), check_vma=False))
        out = sm(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-4)
