"""Robust pose-only Gauss-Newton — the per-frame camera solve.

TPU-native replacement for `Optimizer::PoseOptimization` (Optimizer.cc:
239-451): a single SE3 vertex with unary mono/stereo reprojection edges,
Huber kernel (delta = sqrt(5.991) mono / sqrt(7.815) stereo), optimized in
4 rounds x 10 iterations with chi-square outlier gating between rounds and
the robust kernel dropped from round 3 — the schedule at Optimizer.cc:
367-371,407,436, lifted into OptimizerConfig.

Instead of building a graph per frame, all N observations live in fixed
[N, ...] arrays with a validity mask; each GN iteration is a batched
Jacobian contraction into a 6x6 normal system — three fused einsums and a
tiny solve.  The entire 40-iteration schedule runs inside one jit with
``lax.fori_loop``; there is no host round-trip per iteration.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, OptimizerConfig
from ..geometry import se3
from ..geometry.se3 import SE3


class PoseOptResult(NamedTuple):
    pose: SE3                 # optimized Tcw
    inliers: jnp.ndarray      # [N] bool — final chi2 classification
    n_inliers: jnp.ndarray    # scalar int32
    chi2: jnp.ndarray         # [N] float32 per-observation chi2 (unrobust)


def _residual_jacobian(pose: SE3, points_w, obs, cam: CameraConfig,
                       is_stereo):
    """Batched residuals + analytic Jacobians for mono/stereo edges.

    Args:
      points_w: [N, 3] world points.
      obs: [N, 3] — (u, v, u_right); u_right < 0 marks a mono observation
        (the reference's mvuRight = -1 convention, Frame.cc:820-842).
      is_stereo: [N] bool.

    Returns:
      e: [N, 3] residual (obs - prediction), third row zeroed for mono.
      J: [N, 3, 6] Jacobian of the *prediction* wrt xi = [omega|upsilon]
         (left-multiplicative update exp(xi) . Tcw, matching g2o's
         VertexSE3Expmap oplus used by the reference).
    """
    p = se3.transform_points(pose, points_w)              # [N, 3] camera frame
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.bf * iz
    pred = jnp.stack([u, v, ur], axis=-1)

    e = obs - pred
    e = e.at[..., 2].set(jnp.where(is_stereo, e[..., 2], 0.0))

    # d(pred)/dp — [N, 3, 3]
    zeros = jnp.zeros_like(x)
    du_dp = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], axis=-1)
    dv_dp = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    dur_dp = jnp.stack([cam.fx * iz, zeros,
                        -cam.fx * x * iz2 + cam.bf * iz2], axis=-1)
    dpred_dp = jnp.stack([du_dp, dv_dp, dur_dp], axis=-2)

    # dp/dxi for left perturbation: p' ~= p + hat(omega) p + upsilon
    # => dp/domega = -hat(p), dp/dupsilon = I.
    N = p.shape[0]
    hat_p = jnp.zeros((N, 3, 3), p.dtype)
    hat_p = hat_p.at[:, 0, 1].set(-z).at[:, 0, 2].set(y)
    hat_p = hat_p.at[:, 1, 0].set(z).at[:, 1, 2].set(-x)
    hat_p = hat_p.at[:, 2, 0].set(-y).at[:, 2, 1].set(x)
    dp_dxi = jnp.concatenate([-hat_p, jnp.broadcast_to(jnp.eye(3, dtype=p.dtype),
                                                       (N, 3, 3))], axis=-1)

    J = jnp.einsum("nij,njk->nik", dpred_dp, dp_dxi)      # [N, 3, 6]
    J = J.at[:, 2, :].set(jnp.where(is_stereo[:, None], J[:, 2, :], 0.0))
    return e, J


def optimize_pose(
    pose0: SE3,
    points_w,
    obs,
    inv_sigma2,
    valid,
    cam: CameraConfig,
    cfg: OptimizerConfig,
) -> PoseOptResult:
    """Run the 4x10 robust GN schedule.

    Args:
      pose0: initial Tcw guess (motion model / reference-KF pose).
      points_w: [N, 3] map-point positions.
      obs: [N, 3] (u, v, u_right), u_right < 0 for mono.
      inv_sigma2: [N] information weight 1/sigma^2 per observation (pyramid
        level dependent, 1/1.2^(2*level) — Frame's mvInvLevelSigma2).
      valid: [N] bool — observation exists.
    """
    is_stereo = obs[..., 2] >= 0.0
    delta_huber = jnp.where(is_stereo,
                            jnp.sqrt(cfg.chi2_stereo), jnp.sqrt(cfg.chi2_mono))
    chi2_th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)

    def chi2_of(e):
        # chi2 = ||e||^2 * invSigma2 over the active dims (3 stereo, 2 mono).
        sq = jnp.sum(e * e, axis=-1)
        return sq * inv_sigma2

    def gn_round(carry, use_huber):
        pose, active = carry

        def gn_iter(_, pose):
            e, J = _residual_jacobian(pose, points_w, obs, cam, is_stereo)
            c2 = chi2_of(e)
            err = jnp.sqrt(jnp.maximum(c2, 1e-12))
            w_rob = jnp.where(use_huber & (err > delta_huber),
                              delta_huber / err, 1.0)
            w = w_rob * inv_sigma2 * active.astype(e.dtype)
            H = jnp.einsum("nri,n,nrj->ij", J, w, J)
            b = jnp.einsum("nri,n,nr->i", J, w, e)
            H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
            # e = obs - pred, pred' = pred + J dxi => min ||e - J dxi||:
            # normal equations H dxi = b.
            dxi = jnp.linalg.solve(H, b)
            # Trust-region clip: an ill-conditioned system (few/degenerate
            # matches) must not fling the pose across the map — cap the step
            # and let further iterations refine.
            norm = jnp.linalg.norm(dxi)
            dxi = dxi * jnp.minimum(1.0, 0.5 / jnp.maximum(norm, 1e-12))
            return se3.retract(pose, dxi)

        pose = jax.lax.fori_loop(0, cfg.pose_iters_per_round, gn_iter, pose)
        # Re-classify for the next round (outliers can come back, exactly as
        # the reference flips e->setLevel per round, Optimizer.cc:412-431).
        e, _ = _residual_jacobian(pose, points_w, obs, cam, is_stereo)
        c2 = chi2_of(e)
        active = valid & (c2 <= chi2_th)
        return (pose, active), c2

    # lax.scan over rounds, NOT a Python unroll: each unrolled round
    # duplicates the residual/Jacobian code (~1 MB of TPU text per copy),
    # and executable size is a first-order cost on this backend (programs
    # past the runtime's retention budget are re-shipped per dispatch).
    use_huber = jnp.arange(cfg.pose_rounds) < 2   # dropped from round 3
                                                  # (Optimizer.cc:436)
    (pose, active), chi2s = jax.lax.scan(gn_round, (pose0, valid), use_huber)
    chi2 = chi2s[-1]
    return PoseOptResult(pose=pose, inliers=active,
                         n_inliers=active.sum().astype(jnp.int32),
                         chi2=chi2)
