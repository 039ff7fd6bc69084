"""SE(3) rigid-transform operations, batched-first.

Poses are stored as a pair ``(R, t)`` with shapes ``[..., 3, 3]`` and
``[..., 3]`` — the world-to-camera transform ``Tcw`` convention of the
reference (Frame `mTcw`; SURVEY §2.1 Frame row).  A small pytree wrapper is
provided but plain tuples work everywhere.

Replaces g2o's ``SE3Quat`` / ``VertexSE3Expmap`` (Optimizer.cc:21-29) with
analytic exp/log and Jacobians suitable for batched Gauss-Newton.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class SE3(NamedTuple):
    """Rigid transform as a pytree: rotation [..., 3, 3], translation [..., 3]."""

    R: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(R, t)

    @staticmethod
    def from_matrix(T) -> "SE3":
        return SE3(T[..., :3, :3], T[..., :3, 3])

    def as_matrix(self):
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype),
            (*self.t.shape[:-1], 4))
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom[..., None, :]], axis=-2)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def compose(self, other: "SE3") -> "SE3":
        """self @ other (apply ``other`` first)."""
        return SE3(self.R @ other.R,
                   jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t)

    def apply(self, points):
        """Transform points [..., N, 3] (or [..., 3]) by this pose."""
        return jnp.einsum("...ij,...nj->...ni", self.R,
                          jnp.atleast_2d(points)) + self.t[..., None, :] \
            if points.ndim >= 2 else self.R @ points + self.t

    def normalize(self) -> "SE3":
        return SE3(so3.normalize_matrix(self.R), self.t)


def exp(xi) -> SE3:
    """se(3) exponential. ``xi = [rho(3), phi(3)]`` -> SE3.

    Convention matches g2o::SE3Quat::exp used by the reference's optimizer:
    translation part first is NOT used there; we use ``[omega | upsilon]``
    ordering (rotation first) throughout this codebase.
    ``xi[..., :3]`` = rotation (omega), ``xi[..., 3:]`` = translation (upsilon).
    """
    omega = xi[..., :3]
    upsilon = xi[..., 3:]
    R = so3.exp(omega)
    V = so3.left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return SE3(R, t)


def log(T: SE3):
    """SE3 -> se(3) tangent ``[omega | upsilon]``."""
    omega = so3.log(T.R)
    Vinv = so3.left_jacobian_inv(omega)
    upsilon = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([omega, upsilon], axis=-1)


def retract(T: SE3, xi) -> SE3:
    """Left-multiplicative retraction: exp(xi) * T (the g2o oplus for
    VertexSE3Expmap, which the reference's PoseOptimization relies on).

    The result is re-projected onto SO(3): solver loops retract tens of
    times per frame and f32 rotation products drift off the manifold —
    det(R) error compounds and eventually corrupts loop-closure composes.
    """
    from . import so3
    dT = exp(xi)
    out = dT.compose(T)
    return SE3(so3.orthonormalize(out.R), out.t)


def transform_points(T: SE3, pts):
    """Apply T to a point array [..., 3] with full broadcasting."""
    return jnp.einsum("...ij,...j->...i", T.R, pts) + T.t


def relative(T_a: SE3, T_b: SE3) -> SE3:
    """T_a * T_b^{-1} — the relative transform mapping frame b to frame a."""
    return T_a.compose(T_b.inverse())
