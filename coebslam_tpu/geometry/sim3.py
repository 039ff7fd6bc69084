"""Sim(3) similarity-transform operations, batched-first.

Used by loop closing: the relative transform between a current keyframe and a
loop keyframe is a 7-DoF similarity in monocular SLAM (scale drift) and the
essential-graph optimization runs over Sim3 vertices (reference
Optimizer.cc:781-1044, Sim3Solver.cc; SURVEY §2.1).

A Sim3 is ``(s, R, t)``: ``x' = s * R @ x + t``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3

_EPS = 1e-7


class Sim3(NamedTuple):
    s: jnp.ndarray            # [...] scale
    R: jnp.ndarray            # [..., 3, 3]
    t: jnp.ndarray            # [..., 3]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(jnp.ones(batch_shape, dtype=dtype),
                    jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3)),
                    jnp.zeros((*batch_shape, 3), dtype=dtype))

    @staticmethod
    def from_se3(R, t, s=None) -> "Sim3":
        if s is None:
            s = jnp.ones(t.shape[:-1], dtype=t.dtype)
        return Sim3(s, R, t)

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(s_inv, Rt,
                    -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t))

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(self.s * other.s,
                    self.R @ other.R,
                    self.s[..., None] * jnp.einsum("...ij,...j->...i",
                                                   self.R, other.t) + self.t)

    def apply(self, pts):
        """Transform points [..., 3]."""
        return (self.s[..., None]
                * jnp.einsum("...ij,...j->...i", self.R, pts) + self.t)

    def to_se3_matrix(self):
        """Recover an SE3 matrix ``[R | t/s]`` — the reference's conversion
        after essential-graph optimization (Optimizer.cc:1020-1026)."""
        top = jnp.concatenate([self.R, (self.t / self.s[..., None])[..., None]],
                              axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype),
            (*self.t.shape[:-1], 4))
        return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def _calc_w_coeffs(omega, sigma):
    """Coefficients (cI, cW, cW2) with W = cI*I + cW*hat(w) + cW2*hat(w)^2.

    Standard Sim3 closed form (Strasdat, "Local accuracy and global
    consistency for efficient SLAM", Appendix; same math as g2o's sim3.h used
    by the reference at Optimizer.cc:781ff).  Taylor fallbacks keep it finite
    at theta -> 0 and sigma -> 0.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    s = jnp.exp(sigma)
    sigma2 = sigma * sigma
    # Branch thresholds sized for float32, NOT epsilon-small: the closed
    # forms difference like (theta - sin theta)/theta^3, which loses ALL
    # f32 precision below theta ~ 1e-2 (at theta = 1e-7 the numerator
    # underflows and the jacfwd tangents go NaN — this silently disabled
    # every near-converged pose-graph iteration until round 5).  The
    # Taylor branches carry enough terms to be exact to f32 at the
    # crossover.
    small_s = jnp.abs(sigma) < 1e-3
    small_t = theta < 1e-2

    safe_sigma = jnp.where(small_s, 1.0, sigma)
    safe_sigma2 = jnp.where(small_s, 1.0, sigma2)
    safe_theta = jnp.where(small_t, 1.0, theta)
    safe_theta2 = jnp.where(small_t, 1.0, theta2)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    # cI = (s - 1)/sigma  ->  1 + sigma/2 as sigma -> 0.
    cI = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma2 / 6.0,
                   (s - 1.0) / safe_sigma)

    # sigma ~ 0 branch:
    cW_s0 = jnp.where(small_t, 0.5 - theta2 / 24.0, (1.0 - cos_t) / safe_theta2)
    cW2_s0 = jnp.where(small_t, 1.0 / 6.0 - theta2 / 120.0,
                       (theta - sin_t) / (safe_theta2 * safe_theta))

    # general sigma branch:
    a = s * sin_t
    b = s * cos_t
    c = theta2 + sigma2
    safe_c = jnp.where(c < _EPS * _EPS, 1.0, c)
    cW_gen_t = (a * sigma + (1.0 - b) * theta) / (safe_theta * safe_c)
    cW2_gen_t = (cI - ((b - 1.0) * sigma + a * theta) / safe_c) / safe_theta2
    # theta ~ 0, sigma general:
    cW_gen_t0 = ((sigma - 1.0) * s + 1.0) / safe_sigma2
    cW2_gen_t0 = (s * (0.5 * sigma2 - sigma + 1.0) - 1.0) / (safe_sigma2 * safe_sigma)
    cW_gen = jnp.where(small_t, cW_gen_t0, cW_gen_t)
    cW2_gen = jnp.where(small_t, cW2_gen_t0, cW2_gen_t)

    cW = jnp.where(small_s, cW_s0, cW_gen)
    cW2 = jnp.where(small_s, cW2_s0, cW2_gen)
    return cI, cW, cW2


def _w_matrix(omega, sigma):
    cI, cW, cW2 = _calc_w_coeffs(omega, sigma)
    W = so3.hat(omega)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return (cI[..., None, None] * eye + cW[..., None, None] * W
            + cW2[..., None, None] * WW)


def exp(xi) -> Sim3:
    """sim(3) exponential. ``xi = [omega(3) | upsilon(3) | sigma(1)]``.

    Scale s = exp(sigma); t = W(omega, sigma) @ upsilon.
    """
    omega = xi[..., :3]
    upsilon = xi[..., 3:6]
    sigma = xi[..., 6]
    R = so3.exp(omega)
    Wmat = _w_matrix(omega, sigma)
    t = jnp.einsum("...ij,...j->...i", Wmat, upsilon)
    return Sim3(jnp.exp(sigma), R, t)


def log(S: Sim3):
    """Sim3 -> sim(3) tangent ``[omega | upsilon | sigma]``.

    Inverts the translation coupling with a 3x3 solve against the same W used
    by :func:`exp`, so ``log(exp(xi)) == xi`` holds to float precision.
    """
    omega = so3.log(S.R)
    sigma = jnp.log(S.s)
    W = _w_matrix(omega, sigma)
    upsilon = jnp.linalg.solve(W, S.t[..., None])[..., 0]
    return jnp.concatenate([omega, upsilon, sigma[..., None]], axis=-1)
