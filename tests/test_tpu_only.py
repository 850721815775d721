"""TPU-backend-only parity tests (skipped on the CPU suite).

The main suite runs on a forced-CPU platform; these validate the compiled
Pallas kernels against the XLA paths on real TPU hardware. Run with the
default (TPU) backend:

    PYTHONPATH=. python -m pytest tests/test_tpu_only.py -q -p no:cacheprovider \
        --override-ini addopts=  # bypass the CPU-forcing conftest if needed

In practice the conftest forces CPU for the whole suite; the REAL-hardware
check is `python -m scream_tpu selftest-tpu` (scream_tpu/selftest.py), which
runs these same parity checks (plus splat-VJP gradient parity) on the live
TPU backend and records the result in SELFTEST_TPU.json — run it each round,
serialized with other TPU processes (single-client tunnel).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires the TPU backend"
)


@tpu_only
def test_nn_kernel_matches_xla_on_tpu():
    from scream_tpu.geometry.pairwise import masked_square_distance
    from scream_tpu.ops.nn_pallas import nearest_neighbor_pallas

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((2000, 3)), jnp.float32)
    dst = jnp.asarray(rng.standard_normal((3000, 3)), jnp.float32)
    mask = jnp.asarray(rng.random(3000) > 0.1)
    d, i, xyz = nearest_neighbor_pallas(src, dst, mask)
    ref = masked_square_distance(src[None], dst[None], dst_mask=mask[None])[0]
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref.min(-1)), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref.argmin(-1)))


@tpu_only
def test_splat_kernel_matches_xla_on_tpu():
    from scream_tpu.ops.render import render_depth_images

    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 500, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 600, 3)), jnp.float32)
    a = render_depth_images(src, tgt, rho=24.0, width=64, use_pallas=True)
    b = render_depth_images(src, tgt, rho=24.0, width=64, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
