"""Local bundle adjustment: Schur-complement GN/LM on a covisibility window.

TPU-native replacement for `Optimizer::LocalBundleAdjustment`
(Optimizer.cc:453-779, g2o BlockSolver_6_3 with marginalized points): the
window's poses and points are optimized jointly; points are eliminated with
a Schur complement exactly as g2o's ``setMarginalized(true)`` does
(Optimizer.cc:98), leaving a dense reduced camera system (6K x 6K, K <= 32)
that a single small Cholesky solves.

Data layout is point-grouped and fixed-shape: ``[P, M]`` arrays hold up to M
window-observations per point.  Every per-iteration quantity is a batched
einsum over those arrays — no sparse graph construction, no host round
trips; the whole 5+10-iteration schedule (Optimizer.cc:659-709, lifted to
OptimizerConfig) runs in one jit.

The same kernel serves global BA (window = everything) — the reference's
GlobalBundleAdjustemnt [sic] (Optimizer.cc:41) — by passing a bigger window
with only the first keyframe fixed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, OptimizerConfig
from ..geometry import se3
from ..geometry.se3 import SE3


class BAProblem(NamedTuple):
    """Fixed-shape local-BA window.

    K = max window keyframes, P = max window points, M = max observations
    per point inside the window.
    """
    kf_R: jnp.ndarray          # [K, 3, 3] world-to-camera
    kf_t: jnp.ndarray          # [K, 3]
    kf_fixed: jnp.ndarray      # [K] bool — frontier + anchor (not updated)
    kf_valid: jnp.ndarray      # [K] bool
    pt_pos: jnp.ndarray        # [P, 3]
    pt_valid: jnp.ndarray      # [P] bool
    obs_kf: jnp.ndarray        # [P, M] int32 window-KF index (-1 empty)
    obs_uvr: jnp.ndarray       # [P, M, 3] (u, v, u_right); ur<0 => mono
    obs_w: jnp.ndarray         # [P, M] inv_sigma2
    obs_valid: jnp.ndarray     # [P, M] bool


class BAResult(NamedTuple):
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray
    pt_pos: jnp.ndarray
    obs_valid: jnp.ndarray     # post-gate classification (outliers dropped)
    chi2: jnp.ndarray          # [P, M] final per-observation chi2


def _residuals_jacobians(prob: BAProblem, cam: CameraConfig):
    """Batched residuals + Jacobians over the [P, M] observation table.

    Returns e [P,M,3], Jc [P,M,3,6], Jp [P,M,3,3], is_stereo [P,M].
    """
    kf_idx = jnp.clip(prob.obs_kf, 0)
    R = prob.kf_R[kf_idx]                    # [P, M, 3, 3]
    t = prob.kf_t[kf_idx]                    # [P, M, 3]
    X = prob.pt_pos[:, None, :]              # [P, 1, 3]
    p = jnp.einsum("pmij,pmj->pmi", R, X + jnp.zeros_like(t)) + t
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.bf * iz
    pred = jnp.stack([u, v, ur], axis=-1)
    is_stereo = prob.obs_uvr[..., 2] >= 0.0
    e = prob.obs_uvr - pred
    e = e.at[..., 2].set(jnp.where(is_stereo, e[..., 2], 0.0))

    zeros = jnp.zeros_like(x)
    du = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], axis=-1)
    dv = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    dur = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2 + cam.bf * iz2],
                    axis=-1)
    dpred_dp = jnp.stack([du, dv, dur], axis=-2)          # [P, M, 3, 3]
    dpred_dp = dpred_dp.at[..., 2, :].set(
        jnp.where(is_stereo[..., None], dpred_dp[..., 2, :], 0.0))

    # Camera: left-multiplicative xi = [omega | upsilon];
    # dp/domega = -hat(p), dp/dupsilon = I.
    hat = jnp.zeros((*p.shape[:-1], 3, 3), p.dtype)
    hat = hat.at[..., 0, 1].set(-z).at[..., 0, 2].set(y)
    hat = hat.at[..., 1, 0].set(z).at[..., 1, 2].set(-x)
    hat = hat.at[..., 2, 0].set(-y).at[..., 2, 1].set(x)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), hat.shape)
    dp_dxi = jnp.concatenate([-hat, eye], axis=-1)        # [P, M, 3, 6]
    Jc = jnp.einsum("pmij,pmjk->pmik", dpred_dp, dp_dxi)
    # Point: dp/dX = R.
    Jp = jnp.einsum("pmij,pmjk->pmik", dpred_dp, R)
    return e, Jc, Jp, is_stereo


def _gn_iteration(prob: BAProblem, cam: CameraConfig, use_huber,
                  chi2_mono: float, chi2_stereo: float, damping: float,
                  reduce_fn=None):
    """One Schur-complement GN step; returns updated poses/points.

    ``reduce_fn(S, b)`` is the distributed-assembly hook: under shard_map
    with the point axis sharded, pass ``lambda S, b: (psum(S), psum(b))`` and
    every device assembles its local partial reduced camera system, the psum
    rides ICI, and the (tiny) dense solve is computed replicated — the
    collective Schur assembly of SURVEY §5.8/§7.1."""
    K = prob.kf_R.shape[0]
    e, Jc, Jp, is_stereo = _residuals_jacobians(prob, cam)

    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_w            # [P, M]
    delta = jnp.where(is_stereo, jnp.sqrt(chi2_stereo), jnp.sqrt(chi2_mono))
    err = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_rob = jnp.where(use_huber & (err > delta), delta / err, 1.0)
    w = (w_rob * prob.obs_w
         * prob.obs_valid
         * prob.pt_valid[:, None]
         * (prob.obs_kf >= 0))                             # [P, M]

    # Per-observation blocks.
    Hcc_o = jnp.einsum("pmri,pm,pmrj->pmij", Jc, w, Jc)    # [P, M, 6, 6]
    Hpp_o = jnp.einsum("pmri,pm,pmrj->pmij", Jp, w, Jp)    # [P, M, 3, 3]
    A_o = jnp.einsum("pmri,pm,pmrj->pmij", Jc, w, Jp)      # [P, M, 6, 3]
    bc_o = jnp.einsum("pmri,pm,pmr->pmi", Jc, w, e)        # [P, M, 6]
    bp_o = jnp.einsum("pmri,pm,pmr->pmi", Jp, w, e)        # [P, M, 3]

    # Point systems.  Levenberg-style relative damping: near-singular point
    # Hessians (low-parallax tracks) otherwise break the f32 inversion.
    Hpp = Hpp_o.sum(1)                                     # [P, 3, 3]
    bp = bp_o.sum(1)                                       # [P, 3]
    diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)           # [P, 3]
    Hpp = Hpp + jnp.eye(3) * (1e-3 * diag + damping)[:, None, :]
    Hpp_inv = jnp.linalg.inv(Hpp)

    # Reduced camera system S [K, 6, 6] blocks [K, K].
    kf_idx = jnp.clip(prob.obs_kf, 0)                      # [P, M]
    S = jnp.zeros((K, K, 6, 6))
    b = jnp.zeros((K, 6))
    # Diagonal H_cc contributions.
    S = S.at[kf_idx, kf_idx].add(Hcc_o)
    b = b.at[kf_idx].add(bc_o)
    # Schur cross terms: for each point, all pairs of its observations.
    AHinv = jnp.einsum("pmij,pjk->pmik", A_o, Hpp_inv)     # [P, M, 6, 3]
    cross = jnp.einsum("pmik,pnjk->pmnij", AHinv, A_o)     # [P, M, M, 6, 6]
    i_idx = jnp.broadcast_to(kf_idx[:, :, None], cross.shape[:3])
    j_idx = jnp.broadcast_to(kf_idx[:, None, :], cross.shape[:3])
    S = S.at[i_idx, j_idx].add(-cross)
    b = b.at[kf_idx].add(-jnp.einsum("pmik,pk->pmi", AHinv, bp))

    if reduce_fn is not None:
        S, b = reduce_fn(S, b)

    # Fixed/invalid cameras: identity rows/cols, zero rhs.
    free = (~prob.kf_fixed) & prob.kf_valid
    free_f = free.astype(S.dtype)
    S = S * free_f[:, None, None, None] * free_f[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.eye(6) * jnp.where(free, damping, 1.0)[:, None, None])
    b = b * free_f[:, None]

    # Dense solve of the 6K x 6K system.
    S_dense = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dxi = jnp.linalg.solve(S_dense, b.reshape(K * 6)).reshape(K, 6)
    # Trust-region clip per camera.
    norm = jnp.linalg.norm(dxi, axis=-1, keepdims=True)
    dxi = dxi * jnp.minimum(1.0, 0.5 / jnp.maximum(norm, 1e-12))
    dxi = dxi * free_f[:, None]

    # Back-substitute points: dp = Hpp^-1 (bp - sum_m A^T dxi_kf).
    At_dxi = jnp.einsum("pmij,pmi->pmj", A_o, dxi[kf_idx])
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - At_dxi.sum(1))
    dp_norm = jnp.linalg.norm(dp, axis=-1, keepdims=True)
    dp = dp * jnp.minimum(1.0, 0.5 / jnp.maximum(dp_norm, 1e-12))
    dp = dp * prob.pt_valid[:, None].astype(dp.dtype)

    new_pose = se3.retract(SE3(prob.kf_R, prob.kf_t), dxi)
    new_pts = prob.pt_pos + dp
    return prob._replace(kf_R=new_pose.R, kf_t=new_pose.t, pt_pos=new_pts)


def optimize_local_ba(prob: BAProblem, cam: CameraConfig,
                      cfg: OptimizerConfig, reduce_fn=None) -> BAResult:
    """The reference's 5-iteration + outlier-gate + 10-iteration schedule
    (Optimizer.cc:659-709).  See _gn_iteration for ``reduce_fn``."""
    chi2_m, chi2_s = cfg.chi2_mono, cfg.chi2_stereo

    def phase(prob, n_iters, use_huber):
        def body(_, pr):
            return _gn_iteration(pr, cam, jnp.bool_(use_huber),
                                 chi2_m, chi2_s, damping=1e-5,
                                 reduce_fn=reduce_fn)
        return jax.lax.fori_loop(0, n_iters, body, prob)

    prob = phase(prob, cfg.local_ba_iters_first, True)
    # Outlier gate between phases (Optimizer.cc:676-700).
    e, _, _, is_stereo = _residuals_jacobians(prob, cam)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_w
    th = jnp.where(is_stereo, chi2_s, chi2_m)
    prob = prob._replace(obs_valid=prob.obs_valid & (chi2 <= th))
    prob = phase(prob, cfg.local_ba_iters_second, True)

    e, _, _, is_stereo = _residuals_jacobians(prob, cam)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_w
    th = jnp.where(is_stereo, chi2_s, chi2_m)
    final_valid = prob.obs_valid & (chi2 <= th)
    return BAResult(kf_R=prob.kf_R, kf_t=prob.kf_t, pt_pos=prob.pt_pos,
                    obs_valid=final_valid, chi2=chi2)
