"""Object-style Lie-group API: ``SO3`` / ``SE3`` wrapper classes.

The reference ships its Lie library twice — as numpy classes
(`/root/reference/lie/numpy/liegroupbase.py:9-117`, `so3.py:10-202`,
`se3.py:10-264`) and a torch mirror with extras
(`/root/reference/lie/torch/se3.py:113-278`). This framework's working layer
is the functional one (:mod:`scream_tpu.geometry.so3` / ``se3`` — batched,
jittable jnp functions); these classes restore the reference's *object*
surface for users migrating code written against ``lie.numpy`` /
``lie.torch``: ``SE3.exp(v) * pose.inv()``, ``pose.transform(pts)``,
``pose.rot`` / ``pose.trans``, ``boxplus_left`` and friends.

Both classes are registered as JAX pytrees, so instances flow through
``jit`` / ``vmap`` / ``grad`` and can be carried in optimizer states —
the idiomatic replacement for the torch mirror's ``.to()/.type()/.detach()``
device plumbing (`/root/reference/lie/torch/liegroupbase.py:132-143`),
none of which JAX needs.

Deliberate deltas from the reference classes (all JAX-native, documented
per-method):

* Sampling takes an explicit ``jax.random`` key instead of global numpy RNG
  state (`/root/reference/lie/numpy/so3.py:30-38`).
* Instances are immutable: ``__setitem__``
  (`/root/reference/lie/numpy/liegroupbase.py:95-96`) raises, and
  ``x.set(index, value)`` returns a new instance instead.
* ``from_matrix(check=True)`` validity asserts run only on concrete arrays
  (host-side); under tracing they are skipped — use :meth:`is_valid` for an
  on-device check.
* ``SE3.log`` works here, where BOTH reference mirrors raise
  ``NotImplementedError`` (`/root/reference/lie/numpy/se3.py:139-141`,
  `/root/reference/lie/torch/se3.py:137-141`); the V-inverse closed form is
  this package's own (Sophus-style, ``geometry/se3.py``), inverse-tested
  against ``SE3.exp``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from scream_tpu.geometry import se3 as se3f
from scream_tpu.geometry import so3 as so3f


def _concrete(x) -> bool:
    """True when ``x`` is a concrete array (safe to assert on host)."""
    return not isinstance(x, jax.core.Tracer)


class _LieBase:
    """Shared container mechanics (`/root/reference/lie/numpy/liegroupbase.py:9-117`)."""

    name = "LieGroupBase"

    def __init__(self, data):
        self.data = jnp.asarray(data)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        return obj

    # -- group ops shared verbatim across SO3/SE3 --------------------------
    def __mul__(self, other):
        """Group composition ``self . other`` (liegroupbase.py:60-61)."""
        return self.__class__(self.data @ other.data)

    def boxplus_left(self, delta: jnp.ndarray):
        """``exp(delta) * self`` (liegroupbase.py:46-48)."""
        return self.__class__.exp(delta) * self

    def boxplus_right(self, delta: jnp.ndarray):
        """``self * exp(delta)`` (liegroupbase.py:50-55, eq. 10.6)."""
        return self * self.__class__.exp(delta)

    def as_matrix(self) -> jnp.ndarray:
        return self.data

    # -- container protocol ------------------------------------------------
    def __getitem__(self, item):
        return self.__class__(self.data[item])

    def __setitem__(self, index, value):
        raise TypeError(
            f"{self.name} is immutable (JAX arrays are); use "
            f"x.set(index, value) which returns a new instance"
        )

    def set(self, index, value):
        """Out-of-place element update; the JAX-native ``__setitem__``."""
        value = value.data if isinstance(value, _LieBase) else jnp.asarray(value)
        return self.__class__(self.data.at[index].set(value))

    def __repr__(self):
        return "{} containing {}".format(self.name, str(self.data))

    def __str__(self):
        return "{}{}".format(self.name, list(self.data.shape[:-2]))

    def __array__(self):
        return np.asarray(self.data)

    @property
    def shape(self):
        return self.data.shape[:-2]

    def __len__(self):
        shape = self.shape
        return shape[0] if len(shape) >= 1 else 1

    @classmethod
    def stack(cls, transforms: List["_LieBase"]):
        """Concatenate along the leading batch axis (liegroupbase.py:113-117)."""
        return cls(jnp.concatenate([t.data for t in transforms], axis=0))

    def astype(self, dtype):
        """Dtype cast — the JAX stand-in for the torch mirror's ``.type()``."""
        return self.__class__(self.data.astype(dtype))


@jax.tree_util.register_pytree_node_class
class SO3(_LieBase):
    """Rotation as a ``(..., 3, 3)`` matrix (`/root/reference/lie/numpy/so3.py:10-202`)."""

    DIM = 9
    DOF = 3
    N = 3
    name = "SO3"

    # -- constructors ------------------------------------------------------
    @staticmethod
    def identity(size: Optional[int] = None) -> "SO3":
        if size is None:
            return SO3(jnp.eye(3))
        return SO3(jnp.broadcast_to(jnp.eye(3), (size, 3, 3)))

    @staticmethod
    def sample_uniform(key: jax.Array, size: Optional[int] = None) -> "SO3":
        """Uniform random rotations; explicit-key variant of so3.py:24-28."""
        shape = () if size is None else (size,)
        return SO3(so3f.sample_uniform(key, shape))

    @staticmethod
    def sample_small(key: jax.Array, size: Optional[int] = None, std: float = 0.1) -> "SO3":
        """Uniform axis, angle ~ N(0, std*pi/sqrt(3)) — so3.py:30-38."""
        shape = () if size is None else (size,)
        return SO3(so3f.sample_small(key, std, shape))

    @staticmethod
    def from_matrix(mat, normalize: bool = False, check: bool = True) -> "SO3":
        mat = jnp.asarray(mat)
        assert mat.shape[-2:] == (3, 3), "Matrix should be of shape ([*,] 3, 3)"
        if normalize:
            fixed = so3f.make_valid(mat)
            if check and _concrete(mat):
                assert np.allclose(
                    np.asarray(fixed), np.asarray(mat), atol=1e-3
                ), "Provided matrix too far from being valid"
            return SO3(fixed)
        if check and _concrete(mat):
            assert bool(np.all(np.asarray(so3f.is_valid(mat)))), (
                "Matrix is not a valid rotation"
            )
        return SO3(mat)

    @staticmethod
    def from_quaternion(quat, normalize: bool = False) -> "SO3":
        """wxyz unit quaternion -> SO3 (so3.py:53-58)."""
        quat = jnp.asarray(quat)
        if normalize:
            quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        return SO3(so3f.matrix_from_quat(quat))

    # -- maps --------------------------------------------------------------
    @staticmethod
    def exp(omega: jnp.ndarray) -> "SO3":
        return SO3(so3f.exp(jnp.asarray(omega)))

    @staticmethod
    def exp_and_theta(omega: jnp.ndarray) -> ("SO3", jnp.ndarray):
        """Exp that also returns the rotation angle (so3.py:81-101).

        The angle keeps the reference's keepdims shape ``(..., 1)``
        (``np.linalg.norm(..., keepdims=True)``, so3.py:85) so code ported
        against it broadcasts identically.
        """
        omega = jnp.asarray(omega)
        return SO3(so3f.exp(omega)), jnp.linalg.norm(omega, axis=-1, keepdims=True)

    def log(self) -> jnp.ndarray:
        return so3f.log(self.data)

    def inv(self) -> "SO3":
        return SO3(jnp.swapaxes(self.data, -1, -2))

    def transform(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Rotate ``([*,] N, 3)`` points (so3.py:156-161)."""
        assert len(self.shape) == pts.ndim - 2
        return jnp.swapaxes(self.data @ jnp.swapaxes(pts, -1, -2), -1, -2)

    # -- algebra -----------------------------------------------------------
    hat = staticmethod(so3f.hat)
    vee = staticmethod(so3f.vee)

    # -- comparison --------------------------------------------------------
    def rotation_angle(self) -> jnp.ndarray:
        """Angle in radians (so3.py:176-180)."""
        return so3f.rotation_angle(self.data)

    def compare(self, other: "SO3") -> Dict:
        """``{'rot_deg': ...}`` error dict (so3.py:182-187)."""
        error = self * other.inv()
        return {"rot_deg": error.rotation_angle() * 180.0 / jnp.pi}

    # -- conversions -------------------------------------------------------
    def vec(self) -> jnp.ndarray:
        """Column-major flattened 9-vector (so3.py:189-191)."""
        return jnp.swapaxes(self.data, -1, -2).reshape(*self.data.shape[:-2], 9)

    def as_quaternion(self) -> jnp.ndarray:
        return so3f.quat_from_matrix(self.data)

    def is_valid(self) -> jnp.ndarray:
        return so3f.is_valid(self.data)

    def make_valid(self) -> "SO3":
        """SVD re-orthonormalization (lie/torch/so3.py:213)."""
        return SO3(so3f.make_valid(self.data))


@jax.tree_util.register_pytree_node_class
class SE3(_LieBase):
    """Rigid transform as a ``(..., 4, 4)`` matrix (`/root/reference/lie/numpy/se3.py:10-264`).

    Stored 4x4 like the reference class; the functional layer's compact
    ``(..., 3, 4)`` form is exposed as :attr:`compact`.
    """

    DIM = 12
    DOF = 6
    N = 4
    name = "SE3"

    # -- constructors ------------------------------------------------------
    @staticmethod
    def identity(size: Optional[int] = None) -> "SE3":
        if size is None:
            return SE3(jnp.eye(4))
        return SE3(jnp.broadcast_to(jnp.eye(4), (size, 4, 4)))

    @staticmethod
    def sample_uniform(key: jax.Array, size: Optional[int] = None) -> "SE3":
        """Uniform rotation + translation in [-1, 1]^3.

        The reference's batched branch mixes ``randn`` into its uniform
        recipe (`/root/reference/lie/numpy/se3.py:30-34`) — an apparent bug;
        here both branches sample the stated uniform cube.
        """
        shape = () if size is None else (size,)
        return SE3(_lift(se3f.sample_uniform(key, shape)))

    @staticmethod
    def sample_small(key: jax.Array, size: Optional[int] = None, std: float = 0.1) -> "SE3":
        """Small pose: SO3.sample_small + N(0, std/sqrt(3)) translation (se3.py:37-44)."""
        shape = () if size is None else (size,)
        return SE3(_lift(se3f.sample_small(key, std, shape)))

    @staticmethod
    def _from_rt(rot: Union[SO3, jnp.ndarray], trans: jnp.ndarray) -> "SE3":
        """Concatenate ``([*,]3,3)`` rotation and ``([*,]3,1)`` translation (se3.py:46-63)."""
        rot_mat = rot.data if isinstance(rot, SO3) else jnp.asarray(rot)
        return SE3(_lift(se3f.se3_init(rot_mat, jnp.asarray(trans))))

    from_rt = _from_rt  # public alias; the reference name is "private" but used

    @staticmethod
    def from_rtvec(vec: jnp.ndarray, normalize: bool = False) -> "SE3":
        """7-vector [qw qx qy qz tx ty tz] -> SE3 (se3.py:65-74)."""
        vec = jnp.asarray(vec)
        if normalize:
            q = vec[..., :4] / jnp.linalg.norm(vec[..., :4], axis=-1, keepdims=True)
            if _concrete(vec):
                # Reference semantics (se3.py:71-73): normalize=True still
                # ASSERTS the quaternion was near-unit — it fixes rounding
                # drift, it does not launder a degenerate 7-vector into a
                # plausible pose.
                assert np.allclose(
                    np.asarray(q), np.asarray(vec[..., :4]), atol=1e-3
                ), "quaternion is too far from unit length to normalize"
            vec = jnp.concatenate([q, vec[..., 4:]], axis=-1)
        elif _concrete(vec):
            n = np.linalg.norm(np.asarray(vec[..., :4]), axis=-1)
            assert np.allclose(n, 1.0, atol=1e-3), "quaternion is not unit length"
        return SE3(_lift(se3f.from_quat_trans(vec)))

    @staticmethod
    def from_matrix(mat, normalize: bool = False, check: bool = True) -> "SE3":
        """Accepts ``([*,] 3, 4)`` or ``([*,] 4, 4)`` (se3.py:76-91)."""
        mat = jnp.asarray(mat)
        assert mat.shape[-2:] in [(4, 4), (3, 4)], "Matrix should be of shape ([*,] 3/4, 4)"
        compact = mat[..., :3, :]
        if normalize:
            fixed = se3f.make_valid(compact)
            if check and _concrete(mat):
                assert np.allclose(
                    np.asarray(fixed), np.asarray(compact), atol=1e-3
                ), "Original SE3 is too far from being valid"
            return SE3(_lift(fixed))
        if check and _concrete(mat):
            # Default atol (5e-5) matches the reference's deliberately loose
            # fp32 tolerance (so3_common.py:27).
            assert bool(
                np.all(np.asarray(so3f.is_valid(compact[..., :3, :3])))
            ), "Matrix is not a valid SE(3)"
        return SE3(_lift(compact))

    # -- maps --------------------------------------------------------------
    @staticmethod
    def exp(vec: jnp.ndarray) -> "SE3":
        """Tangent ``[u, w]`` -> SE3 (se3.py:99-137)."""
        return SE3(_lift(se3f.exp(jnp.asarray(vec))))

    @staticmethod
    def pexp(vec: jnp.ndarray) -> "SE3":
        """Pseudo-exp: translation verbatim (lie/torch/se3.py:113-135)."""
        return SE3(_lift(se3f.pexp(jnp.asarray(vec))))

    def log(self) -> jnp.ndarray:
        return se3f.log(self.compact)

    def plog(self) -> jnp.ndarray:
        """Inverse of :meth:`pexp`."""
        return se3f.plog(self.compact)

    def boxplus_left(self, delta: jnp.ndarray, pseudo: bool = False) -> "SE3":
        """``exp(delta) * self``; pseudo-aware (lie/torch/liegroupbase.py:51-57)."""
        return SE3(_lift(se3f.boxplus_left(self.compact, jnp.asarray(delta), pseudo)))

    def boxplus_right(self, delta: jnp.ndarray, pseudo: bool = False) -> "SE3":
        """``self * exp(delta)``; pseudo-aware (lie/torch/liegroupbase.py:59-66)."""
        return SE3(_lift(se3f.boxplus_right(self.compact, jnp.asarray(delta), pseudo)))

    def inv(self) -> "SE3":
        return SE3(_lift(se3f.se3_inv(self.compact)))

    def transform(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Apply to ``([*,] N, 3)`` points (se3.py:144-149)."""
        assert len(self.shape) == pts.ndim - 2
        return se3f.se3_transform(self.compact, pts)

    # -- algebra -----------------------------------------------------------
    @staticmethod
    def hat(v: jnp.ndarray) -> jnp.ndarray:
        """Tangent ``[u, w]`` -> 4x4 twist matrix (se3.py:151-164)."""
        v = jnp.asarray(v)
        u, w = v[..., :3], v[..., 3:]
        W = so3f.hat(w)
        top = jnp.concatenate([W, u[..., None]], axis=-1)
        bottom = jnp.zeros_like(top[..., :1, :])
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def vee(mat: jnp.ndarray) -> jnp.ndarray:
        """4x4 twist matrix -> ``[u, w]`` (se3.py:166-175)."""
        mat = jnp.asarray(mat)
        return jnp.concatenate(
            [mat[..., :3, 3], so3f.vee(mat[..., :3, :3])], axis=-1
        )

    # -- jacobians (torch extras; lie/torch/se3.py:183-278) ----------------
    # The functional layer vectorizes [R|t] row-major; the reference classes
    # column-major (consistent with their vec()). These wrappers return the
    # REFERENCE layout, so migrated code indexes the same rows.

    @staticmethod
    def jacob_expeD_de(D: "SE3", pseudo: bool = True) -> jnp.ndarray:
        """d(exp(eps).D)/d(eps) at 0, ``(...,12,6)`` (se3.py:183-209, 10.3.3)."""
        return se3f.jacob_expeD_de(_as_compact(D), pseudo)[..., _REF_ROW_ORDER, :]

    @staticmethod
    def jacob_Dexpe_de(D: "SE3") -> jnp.ndarray:
        """d(D.exp(eps))/d(eps) at 0 (se3.py:211-232, 10.3.4)."""
        return se3f.jacob_Dexpe_de(_as_compact(D))[..., _REF_ROW_ORDER, :]

    @staticmethod
    def jacob_dAexpeD_de(A: "SE3", D: "SE3", full_matrix: bool = True) -> jnp.ndarray:
        """d(A.exp(eps).D)/d(eps) at 0 (se3.py:234-278, 10.3.7).

        ``full_matrix=False`` returns the reference's ``(..., 15, 3)``
        stacked non-zero blocks [A; B; C; D; E] instead of the sparse
        ``(..., 12, 6)`` matrix.
        """
        jac = se3f.jacob_dAexpeD_de(_as_compact(A), _as_compact(D))[..., _REF_ROW_ORDER, :]
        if full_matrix:
            return jac
        return jnp.concatenate(
            [
                jac[..., 9:12, 0:3],  # block A
                jac[..., 0:3, 3:6],  # block B
                jac[..., 3:6, 3:6],  # block C
                jac[..., 6:9, 3:6],  # block D
                jac[..., 9:12, 3:6],  # block E
            ],
            axis=-2,
        )

    # -- comparison --------------------------------------------------------
    def compare(self, other: "SE3") -> Dict:
        """``{'rot_deg', 'trans'}`` error dict (se3.py:232-238)."""
        error = self * other.inv()
        return {
            "rot_deg": error.rot.rotation_angle() * 180.0 / jnp.pi,
            "trans": jnp.linalg.norm(self.trans - other.trans, axis=-1),
        }

    # -- conversions -------------------------------------------------------
    @property
    def compact(self) -> jnp.ndarray:
        """The functional layer's ``(..., 3, 4)`` working form."""
        return self.data[..., :3, :]

    @property
    def rot(self) -> SO3:
        return SO3(self.data[..., :3, :3])

    @property
    def trans(self) -> jnp.ndarray:
        return self.data[..., :3, 3]

    def vec(self) -> jnp.ndarray:
        """Column-major flattened 12-vector of ``[R|t]`` (se3.py:248-250)."""
        return jnp.swapaxes(self.compact, -1, -2).reshape(*self.data.shape[:-2], 12)

    def as_quat_trans(self) -> jnp.ndarray:
        """7-vector [qw qx qy qz tx ty tz] (se3.py:252-256)."""
        return se3f.as_quat_trans(self.compact)

    def is_valid(self) -> jnp.ndarray:
        return so3f.is_valid(self.data[..., :3, :3])

    def make_valid(self) -> "SE3":
        """Re-orthonormalize the rotation block (lie/torch/se3.py:318)."""
        return SE3(_lift(se3f.make_valid(self.compact)))


# perm[ref_row] = functional_row: reference row 3j+i (column-major over the
# 3x4 [R|t]) comes from the functional layer's row-major row 4i+j.
_REF_ROW_ORDER = tuple(4 * (r % 3) + r // 3 for r in range(12))


def _lift(compact: jnp.ndarray) -> jnp.ndarray:
    """``(..., 3, 4)`` -> ``(..., 4, 4)`` with the [0 0 0 1] bottom row."""
    return se3f.to_4x4(compact)


def _as_compact(pose: Union[SE3, jnp.ndarray]) -> jnp.ndarray:
    """Accept an SE3 instance or a raw (...,3,4)/(...,4,4) array."""
    data = pose.data if isinstance(pose, SE3) else jnp.asarray(pose)
    return data[..., :3, :]


__all__ = ["SO3", "SE3"]
