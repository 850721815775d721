"""Object-style Lie API (`scream_tpu.geometry.lie`) — behavior + A/B parity.

Two layers of coverage:

* Self-consistency: the wrapper classes delegate to the functional layer,
  round-trip through jit/vmap as pytrees, and obey the group axioms.
* Direct A/B against the reference's numpy classes
  (`/root/reference/lie/numpy/{so3,se3}.py`), which import only
  numpy/scipy and therefore run as-is in this container — the same
  prove-against-the-implementation standard as tests/test_torch_parity.py.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scream_tpu.geometry import se3 as se3f
from scream_tpu.geometry import so3 as so3f
from scream_tpu.geometry.lie import SE3, SO3

_REFERENCE = "/root/reference"
if _REFERENCE not in sys.path:
    sys.path.insert(0, _REFERENCE)

from lie.numpy import SE3 as RefSE3  # noqa: E402
from lie.numpy import SO3 as RefSO3  # noqa: E402

RNG = np.random.default_rng(7)


def _rand_w(shape=()):
    return RNG.standard_normal(shape + (3,)).astype(np.float32)


def _rand_vec6(shape=()):
    return (0.5 * RNG.standard_normal(shape + (6,))).astype(np.float32)


def _rand_so3(n=None):
    shape = () if n is None else (n,)
    return SO3.exp(_rand_w(shape))


def _rand_se3(n=None):
    shape = () if n is None else (n,)
    return SE3.exp(_rand_vec6(shape))


class TestContainer:
    def test_identity_shapes(self):
        assert SO3.identity().data.shape == (3, 3)
        assert SO3.identity(5).data.shape == (5, 3, 3)
        assert SE3.identity().data.shape == (4, 4)
        assert SE3.identity(5).shape == (5,)

    def test_getitem_len_stack(self):
        xs = _rand_se3(6)
        assert len(xs) == 6
        one = xs[2]
        assert one.shape == ()
        restacked = SE3.stack([xs, xs])
        assert len(restacked) == 12
        np.testing.assert_allclose(np.asarray(restacked[8].data), np.asarray(xs[2].data))

    def test_setitem_raises_set_works(self):
        xs = _rand_so3(3)
        with pytest.raises(TypeError, match="immutable"):
            xs[0] = np.eye(3)
        ys = xs.set(0, SO3.identity())
        np.testing.assert_allclose(np.asarray(ys[0].data), np.eye(3), atol=1e-6)
        # original untouched
        assert not np.allclose(np.asarray(xs[0].data), np.eye(3))

    def test_repr_str_array(self):
        x = _rand_se3(2)
        assert "SE3" in repr(x) and str(x) == "SE3[2]"
        assert np.asarray(x).shape == (2, 4, 4)

    def test_astype(self):
        assert _rand_so3(2).astype(jnp.bfloat16).data.dtype == jnp.bfloat16


class TestPytree:
    def test_jit_vmap_grad(self):
        xs = _rand_se3(4)

        @jax.jit
        def angle_sum(pose: SE3) -> jnp.ndarray:
            return jnp.sum(pose.rot.rotation_angle())

        a = angle_sum(xs)
        assert np.isfinite(float(a))

        # vmap over the batch axis of the embedded data
        per = jax.vmap(lambda p: p.rot.rotation_angle())(xs)
        np.testing.assert_allclose(np.asarray(per), np.asarray(xs.rot.rotation_angle()), atol=1e-6)

        g = jax.grad(lambda d: angle_sum(SE3(d)))(xs.data)
        assert g.shape == xs.data.shape and np.all(np.isfinite(np.asarray(g)))


class TestGroupOps:
    def test_exp_log_roundtrip(self):
        v = _rand_vec6((8,))
        np.testing.assert_allclose(np.asarray(SE3.exp(v).log()), v, atol=1e-5)
        w = 0.5 * _rand_w((8,))
        np.testing.assert_allclose(np.asarray(SO3.exp(w).log()), w, atol=1e-5)

    def test_mul_inv_identity(self):
        x = _rand_se3(5)
        e = x * x.inv()
        np.testing.assert_allclose(np.asarray(e.data), np.asarray(SE3.identity(5).data), atol=1e-5)

    def test_boxplus(self):
        x = _rand_se3()
        d = _rand_vec6()
        np.testing.assert_allclose(
            np.asarray(x.boxplus_left(d).data), np.asarray((SE3.exp(d) * x).data), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(x.boxplus_right(d).data), np.asarray((x * SE3.exp(d)).data), atol=1e-6
        )
        # pseudo chart: translation enters verbatim
        np.testing.assert_allclose(
            np.asarray(x.boxplus_left(d, pseudo=True).data),
            np.asarray((SE3.pexp(d) * x).data),
            atol=1e-6,
        )

    def test_transform_matches_functional(self):
        x = _rand_se3(3)
        pts = RNG.standard_normal((3, 17, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(x.transform(pts)),
            np.asarray(se3f.se3_transform(x.compact, pts)),
            atol=1e-6,
        )

    def test_se3_hat_vee_roundtrip(self):
        v = _rand_vec6((4,))
        H = SE3.hat(v)
        assert H.shape == (4, 4, 4)
        np.testing.assert_allclose(np.asarray(SE3.vee(H)), v, atol=1e-6)

    def test_exp_and_theta(self):
        w = _rand_w((5,))
        R, theta = SO3.exp_and_theta(w)
        # Reference keepdims shape (so3.py:85: norm(..., keepdims=True)).
        assert theta.shape == (5, 1)
        np.testing.assert_allclose(
            np.asarray(theta),
            np.linalg.norm(w, axis=-1, keepdims=True), atol=1e-6)
        np.testing.assert_allclose(np.asarray(R.data), np.asarray(SO3.exp(w).data), atol=1e-6)

    def test_jacobians_accept_instances(self):
        A, D = _rand_se3(), _rand_se3()
        for J in (
            SE3.jacob_expeD_de(D),
            SE3.jacob_Dexpe_de(D),
            SE3.jacob_dAexpeD_de(A, D),
        ):
            assert J.shape == (12, 6)
        # class output = functional output re-ordered to the reference's
        # column-major row layout
        perm = [4 * (r % 3) + r // 3 for r in range(12)]
        np.testing.assert_allclose(
            np.asarray(SE3.jacob_Dexpe_de(D)),
            np.asarray(se3f.jacob_Dexpe_de(D.compact))[perm, :],
            atol=1e-6,
        )


class TestConstructorsValidity:
    def test_from_matrix_3x4_and_4x4(self):
        x = _rand_se3(2)
        np.testing.assert_allclose(
            np.asarray(SE3.from_matrix(x.compact).data), np.asarray(x.data), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(SE3.from_matrix(x.data).data), np.asarray(x.data), atol=1e-6
        )

    def test_from_matrix_check_rejects_garbage(self):
        with pytest.raises(AssertionError):
            SO3.from_matrix(np.full((3, 3), 0.3, np.float32))
        with pytest.raises(AssertionError):
            SE3.from_matrix(np.full((4, 4), 0.3, np.float32))

    def test_from_matrix_normalize(self):
        noisy = np.asarray(_rand_so3().data) + 1e-4 * RNG.standard_normal((3, 3)).astype(np.float32)
        fixed = SO3.from_matrix(noisy, normalize=True)
        assert bool(np.asarray(fixed.is_valid()))

    def test_quaternion_roundtrips(self):
        x = _rand_so3(4)
        q = x.as_quaternion()
        np.testing.assert_allclose(
            np.asarray(SO3.from_quaternion(q).data), np.asarray(x.data), atol=1e-5
        )
        y = _rand_se3(4)
        np.testing.assert_allclose(
            np.asarray(SE3.from_rtvec(y.as_quat_trans()).data), np.asarray(y.data), atol=1e-5
        )

    def test_make_valid(self):
        noisy = SE3(np.asarray(_rand_se3().data) + 1e-3 * RNG.standard_normal((4, 4)).astype(np.float32))
        assert bool(np.asarray(noisy.make_valid().is_valid()))

    def test_sampling_deterministic(self):
        key = jax.random.PRNGKey(0)
        a = SE3.sample_small(key, size=4, std=0.1)
        b = SE3.sample_small(key, size=4, std=0.1)
        np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data))
        assert a.shape == (4,)
        assert bool(np.all(np.asarray(a.is_valid())))
        assert SO3.sample_uniform(key, 3).shape == (3,)


class TestReferenceParity:
    """Direct A/B against /root/reference/lie/numpy — same inputs, both APIs."""

    def test_so3_exp_log_vec(self):
        w = _rand_w((6,)).astype(np.float64)
        ref = RefSO3.exp(w)
        ours = SO3.exp(w)
        np.testing.assert_allclose(np.asarray(ours.data), ref.data, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.log()), ref.log(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.vec()), ref.vec(), atol=1e-5)

    def test_so3_compare_dict(self):
        a_w, b_w = _rand_w((3,)), _rand_w((3,))
        ref = RefSO3.exp(a_w).compare(RefSO3.exp(b_w))
        ours = SO3.exp(a_w).compare(SO3.exp(b_w))
        assert set(ours.keys()) == set(ref.keys()) == {"rot_deg"}
        np.testing.assert_allclose(np.asarray(ours["rot_deg"]), ref["rot_deg"], atol=1e-3)

    def test_se3_exp_vec_inv_compose_transform(self):
        v = _rand_vec6((5,)).astype(np.float64)
        ref = RefSE3.exp(v)
        ours = SE3.exp(v)
        np.testing.assert_allclose(np.asarray(ours.data), ref.data, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.vec()), ref.vec(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.inv().data), ref.inv().data, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray((ours * ours.inv()).data), (ref * ref.inv()).data, atol=1e-5
        )
        pts = RNG.standard_normal((5, 11, 3))
        np.testing.assert_allclose(np.asarray(ours.transform(pts)), ref.transform(pts), atol=1e-5)

    def test_se3_hat_vee_quat_trans(self):
        v = _rand_vec6((4,)).astype(np.float64)
        np.testing.assert_allclose(np.asarray(SE3.hat(v)), RefSE3.hat(v), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(SE3.vee(RefSE3.hat(v))), RefSE3.vee(RefSE3.hat(v)), atol=1e-6
        )
        ref = RefSE3.exp(v)
        ours = SE3.exp(v)
        q_ref = ref.as_quat_trans()
        q_ours = np.asarray(ours.as_quat_trans())
        # quaternions are sign-ambiguous; canonicalize before comparing
        sign = np.sign(q_ref[..., :1]) * np.sign(q_ours[..., :1])
        np.testing.assert_allclose(q_ours[..., :4] * sign, q_ref[..., :4], atol=1e-5)
        np.testing.assert_allclose(q_ours[..., 4:], q_ref[..., 4:], atol=1e-5)

    def test_se3_compare_dict(self):
        a, b = _rand_vec6((3,)), _rand_vec6((3,))
        ref = RefSE3.exp(a).compare(RefSE3.exp(b))
        ours = SE3.exp(a).compare(SE3.exp(b))
        assert set(ours.keys()) == set(ref.keys()) == {"rot_deg", "trans"}
        np.testing.assert_allclose(np.asarray(ours["rot_deg"]), ref["rot_deg"], atol=1e-3)
        np.testing.assert_allclose(np.asarray(ours["trans"]), ref["trans"], atol=1e-5)

    def test_se3_from_rt_from_matrix(self):
        R = np.asarray(_rand_so3(2).data, dtype=np.float64)
        t = RNG.standard_normal((2, 3, 1))
        ref = RefSE3._from_rt(RefSO3(R), t)
        ours = SE3._from_rt(SO3(R), t)
        np.testing.assert_allclose(np.asarray(ours.data), ref.data, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(SE3.from_matrix(ref.data).data), RefSE3.from_matrix(ref.data).data, atol=1e-6
        )

    def test_rotation_angle_and_jacobian(self):
        w = _rand_w((4,)).astype(np.float64)
        np.testing.assert_allclose(
            np.asarray(SO3.exp(w).rotation_angle()), RefSO3.exp(w).rotation_angle(), atol=1e-5
        )
        vA, vD = _rand_vec6().astype(np.float64), _rand_vec6().astype(np.float64)
        ref = RefSE3.jacob_dAexpeD_de(RefSE3.exp(vA), RefSE3.exp(vD), full_matrix=True)
        ours = SE3.jacob_dAexpeD_de(SE3.exp(vA), SE3.exp(vD))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
        ref_blocks = RefSE3.jacob_dAexpeD_de(
            RefSE3.exp(vA), RefSE3.exp(vD), full_matrix=False
        )
        ours_blocks = SE3.jacob_dAexpeD_de(SE3.exp(vA), SE3.exp(vD), full_matrix=False)
        assert ours_blocks.shape == (15, 3)
        np.testing.assert_allclose(np.asarray(ours_blocks), ref_blocks, atol=1e-5)
