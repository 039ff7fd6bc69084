"""Sim3 refinement between two keyframes — `Optimizer::OptimizeSim3`
(Optimizer.cc:1046-1241): a single Sim3 vertex with paired forward/inverse
projection edges (points of KF2 projected into KF1 through S12, and points
of KF1 into KF2 through S12^-1), Huber-robust GN with a chi2 gate between
the 5- and 10-iteration phases.

Autodiff Jacobians (forward-mode over the 7-dof tangent) — this runs once
per loop-closure candidate, well off the hot path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, OptimizerConfig
from ..geometry import camera as cam_ops
from ..geometry import sim3
from ..geometry.sim3 import Sim3


class Sim3OptResult(NamedTuple):
    S12: Sim3
    inliers: jnp.ndarray      # [N] bool (pairs surviving both directions)
    n_inliers: jnp.ndarray


def optimize_sim3(S12_init: Sim3, pts1_c1, pts2_c2, obs1, obs2, valid,
                  cam: CameraConfig, cfg: OptimizerConfig,
                  fix_scale: bool = True) -> Sim3OptResult:
    """Args:
      pts1_c1: [N, 3] matched points in KF1's camera frame.
      pts2_c2: [N, 3] the same landmarks in KF2's camera frame.
      obs1/obs2: [N, 2] pixel observations in KF1/KF2.
      fix_scale: True for RGB-D/stereo (reference bFixScale, Optimizer.cc:1050).
    """
    delta = jnp.sqrt(10.0)    # reference deltaHuber = sqrt(10)

    def residuals(xi):
        S = sim3.exp(xi).compose(S12_init)
        e1 = obs1 - cam_ops.project(cam, S.apply(pts2_c2))
        e2 = obs2 - cam_ops.project(cam, S.inverse().apply(pts1_c1))
        return e1, e2

    def gn_step(xi, active):
        e1, e2 = residuals(xi)
        J1 = jax.jacfwd(lambda x: residuals(x)[0])(xi)   # [N, 2, 7]
        J2 = jax.jacfwd(lambda x: residuals(x)[1])(xi)
        if fix_scale:
            J1 = J1.at[..., 6].set(0.0)
            J2 = J2.at[..., 6].set(0.0)

        def accum(e, J):
            c2 = jnp.sum(e * e, axis=-1)
            err = jnp.sqrt(jnp.maximum(c2, 1e-12))
            w = jnp.where(err > delta, delta / err, 1.0) * active
            H = jnp.einsum("nri,n,nrj->ij", J, w, J)
            b = jnp.einsum("nri,n,nr->i", J, w, e)
            return H, b

        H1, b1 = accum(e1, J1)
        H2, b2 = accum(e2, J2)
        H = H1 + H2 + 1e-6 * jnp.eye(7)
        if fix_scale:
            H = H.at[6, 6].set(1.0)
        # J here is d(e)/d(xi) (e = obs - proj), so GN is dxi = -H^-1 J^T W e.
        dxi = -jnp.linalg.solve(H, b1 + b2)
        if fix_scale:
            dxi = dxi.at[6].set(0.0)
        return dxi

    xi = jnp.zeros(7)
    active = valid.astype(jnp.float32)
    for _ in range(cfg.sim3_iters_first):
        xi = xi + gn_step(xi, active)
    # chi2 gate at th = 10 (Optimizer.cc:1180 th2 = 10).
    e1, e2 = residuals(xi)
    c1 = jnp.sum(e1 * e1, -1)
    c2 = jnp.sum(e2 * e2, -1)
    active = (valid & (c1 <= 10.0) & (c2 <= 10.0)).astype(jnp.float32)
    for _ in range(cfg.sim3_iters_second):
        xi = xi + gn_step(xi, active)

    e1, e2 = residuals(xi)
    inl = valid & (jnp.sum(e1 * e1, -1) <= 10.0) \
        & (jnp.sum(e2 * e2, -1) <= 10.0)
    return Sim3OptResult(S12=sim3.exp(xi).compose(S12_init), inliers=inl,
                        n_inliers=inl.sum().astype(jnp.int32))
