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


def _inv3x3(H):
    """Closed-form inverse of [..., 3, 3] matrices (adjugate/determinant) —
    batched jnp.linalg.inv lowers to LU loops; this is pure VPU math."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, k = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * k - f * h
    B = c * h - b * k
    C = b * f - c * e
    D = f * g - d * k
    E = a * k - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hc = b * g - a * h
    K = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    rows = jnp.stack([jnp.stack([A, B, C], -1), jnp.stack([D, E, F], -1),
                      jnp.stack([G, Hc, K], -1)], -2)
    return rows * inv_det[..., None, None]


def _assemble(prob: BAProblem, cam: CameraConfig, use_huber,
              chi2_mono: float, chi2_stereo: float, damping: float):
    """Assemble the point-marginalized reduced camera system for one point
    block: returns (S [K,K,6,6], b [K,6], terms) where ``terms`` carries the
    per-observation quantities needed for point back-substitution.

    Layout note: all per-observation quantities live in **lane-major**
    [small..., M, P] / [small..., MP] arrays — the observation axis last.
    TPU tiles the trailing two dims to (8, 128); the naive [P, M, 6, 6]
    layout wastes ~95% of each tile on padding and made one iteration cost
    ~30 ms.  Lane-major VPU math + one-hot MXU matmuls for the reduced
    system run the same iteration in ~1 ms."""
    K = prob.kf_R.shape[0]
    P, M = prob.obs_kf.shape
    MP = M * P
    f32 = jnp.float32

    kf_idx = jnp.clip(prob.obs_kf, 0).T                    # [M, P]
    # Pose components gathered per observation, unstacked to [M, P] lanes.
    Rg = prob.kf_R[kf_idx]                                 # [M, P, 3, 3]
    tg = prob.kf_t[kf_idx]                                 # [M, P, 3]
    X = prob.pt_pos.T[:, None, :]                          # [3, 1, P]
    R = [[Rg[..., i, j] for j in range(3)] for i in range(3)]   # [M,P] each
    t = [tg[..., i] for i in range(3)]

    px = R[0][0] * X[0] + R[0][1] * X[1] + R[0][2] * X[2] + t[0]
    py = R[1][0] * X[0] + R[1][1] * X[1] + R[1][2] * X[2] + t[1]
    pz = R[2][0] * X[0] + R[2][1] * X[1] + R[2][2] * X[2] + t[2]
    iz = 1.0 / jnp.maximum(pz, 1e-6)
    iz2 = iz * iz

    u = cam.fx * px * iz + cam.cx
    v = cam.fy * py * iz + cam.cy
    ur = u - cam.bf * iz
    obs = prob.obs_uvr.transpose(2, 1, 0)                  # [3, M, P]
    is_stereo = obs[2] >= 0.0
    e = [obs[0] - u, obs[1] - v,
         jnp.where(is_stereo, obs[2] - ur, 0.0)]           # 3 x [M, P]

    # d(pred)/dp rows (3 obs rows x 3 point coords), each [M, P].
    dur_z = jnp.where(is_stereo, -cam.fx * px * iz2 + cam.bf * iz2, 0.0)
    dur_x = jnp.where(is_stereo, cam.fx * iz, 0.0)
    zero = jnp.zeros_like(px)
    dpred = [[cam.fx * iz, zero, -cam.fx * px * iz2],
             [zero, cam.fy * iz, -cam.fy * py * iz2],
             [dur_x, zero, dur_z]]

    # Camera Jacobian: dp/dxi with xi = [omega | upsilon];
    # dp/domega = -hat(p) => columns [0..2]; dp/dupsilon = I => [3..5].
    hat = [[zero, pz, -py, jnp.ones_like(px), zero, zero],
           [-pz, zero, px, zero, jnp.ones_like(px), zero],
           [py, -px, zero, zero, zero, jnp.ones_like(px)]]
    Jc = [[sum(dpred[r][s] * hat[s][i] for s in range(3)) for i in range(6)]
          for r in range(3)]                               # [3][6] of [M, P]
    # Point Jacobian: dpred/dX = dpred/dp . R.
    Jp = [[sum(dpred[r][s] * R[s][j] for s in range(3)) for j in range(3)]
          for r in range(3)]                               # [3][3] of [M, P]

    chi2 = sum(ei * ei for ei in e) * prob.obs_w.T         # [M, P]
    delta = jnp.where(is_stereo, jnp.sqrt(chi2_stereo), jnp.sqrt(chi2_mono))
    err = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_rob = jnp.where(use_huber & (err > delta), delta / err, 1.0)
    w = (w_rob * prob.obs_w.T * prob.obs_valid.T
         * prob.pt_valid[None, :] * (prob.obs_kf.T >= 0))  # [M, P]

    # Point Hessian/rhs: sum over rows r and observations m -> [P] lanes.
    Hpp = jnp.stack([jnp.stack(
        [sum(Jp[r][i] * w * Jp[r][j] for r in range(3)).sum(0)
         for j in range(3)], -1) for i in range(3)], -2)   # [P, 3, 3]
    bp = [sum(Jp[r][s] * w * e[r] for r in range(3)).sum(0)
          for s in range(3)]                               # 3 x [P]
    diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp = Hpp + jnp.eye(3) * (1e-3 * diag + damping)[:, None, :]
    Hpp_inv = _inv3x3(Hpp)                                 # [P, 3, 3]
    Hi = [[Hpp_inv[:, i, j] for j in range(3)] for i in range(3)]

    # Per-observation camera blocks, weighted.
    wJc = [[w * Jc[r][i] for i in range(6)] for r in range(3)]
    # A[i][j] = sum_r Jc[r][i] w Jp[r][j]  -> [M, P]
    A = [[sum(wJc[r][i] * Jp[r][j] for r in range(3)) for j in range(3)]
         for i in range(6)]
    # AHinv[i][s] = sum_j A[i][j] Hpp_inv[j][s] (Hi broadcast over M).
    AHinv = [[sum(A[i][j] * Hi[j][s] for j in range(3)) for s in range(3)]
             for i in range(6)]

    onehot = (kf_idx.reshape(1, MP)
              == jnp.arange(K)[:, None]).astype(f32)       # [K, MP]

    # Diagonal H_cc: Hcc[i,j] = sum_r Jc[r][i] w Jc[r][j]; reduce with the
    # one-hot as a [K, MP] x [MP, 36] matmul.
    Hcc_flat = jnp.stack([sum(wJc[r][i] * Jc[r][j] for r in range(3))
                          .reshape(MP)
                          for i in range(6) for j in range(6)], -1)
    S_diag = (onehot @ Hcc_flat).reshape(K, 6, 6)
    bc_flat = jnp.stack([sum(wJc[r][i] * e[r] for r in range(3)).reshape(MP)
                         for i in range(6)], -1)           # [MP, 6]
    b = onehot @ bc_flat                                   # [K, 6]

    # Schur cross terms couple every PAIR of observations (m, n) of the same
    # point: S[k,l] -= sum_p (sum_{m in k} AHinv_m)(sum_{n in l} A_n)^T.
    # Sum over M per point first (VPU, M is small), then one MXU matmul
    # contracting over P.
    oh_mp = (kf_idx[None, :, :]
             == jnp.arange(K)[:, None, None]).astype(f32)   # [K, M, P]
    T = jnp.stack([jnp.stack(
        [(oh_mp * AHinv[i][s][None]).sum(1) for s in range(3)], 1)
        for i in range(6)], 1)                              # [K, 6, 3, P]
    U = jnp.stack([jnp.stack(
        [(oh_mp * A[j][s][None]).sum(1) for s in range(3)], 1)
        for j in range(6)], 1)                              # [K, 6, 3, P]
    cross = (T.reshape(K * 18, P) @ U.reshape(K * 18, P).T
             ).reshape(K, 6, 3, K, 6, 3)
    S = -jnp.einsum("kisljs->klij", cross)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(S_diag)
    # b correction: b[k,i] -= sum_p T[k,i,s,p] bp[s][p].
    bp_sp = jnp.stack(bp)                                  # [3, P]
    b = b - jnp.einsum("kisp,sp->ki", T, bp_sp)

    terms = dict(A=A, Hi=Hi, bp=bp, onehot=onehot, M=M, P=P)
    return S, b, terms


def _solve_cameras(S, b, kf_fixed, kf_valid, damping):
    """Dense solve of the (masked) 6K x 6K reduced camera system -> dxi."""
    K = S.shape[0]
    free = (~kf_fixed) & kf_valid
    free_f = free.astype(S.dtype)
    S = S * free_f[:, None, None, None] * free_f[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.eye(6) * jnp.where(free, damping, 1.0)[:, None, None])
    b = b * free_f[:, None]
    S_dense = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dxi = jnp.linalg.solve(S_dense, b.reshape(K * 6)).reshape(K, 6)
    # Trust-region clip per camera.
    norm = jnp.linalg.norm(dxi, axis=-1, keepdims=True)
    dxi = dxi * jnp.minimum(1.0, 0.5 / jnp.maximum(norm, 1e-12))
    return dxi * free_f[:, None]


def _backsub(terms, dxi, pt_valid, pt_pos):
    """Point back-substitution: dp = Hpp^-1 (bp - sum_m A^T dxi_kf)."""
    A, Hi, bp, onehot = terms["A"], terms["Hi"], terms["bp"], terms["onehot"]
    M, P = terms["M"], terms["P"]
    dxi_mp = (dxi.T @ onehot).reshape(6, M, P)
    Atd = [sum(A[i][j] * dxi_mp[i] for i in range(6)).sum(0)
           for j in range(3)]                              # 3 x [P]
    rhs = [bp[j] - Atd[j] for j in range(3)]
    dp = jnp.stack([sum(Hi[s][j] * rhs[j] for j in range(3))
                    for s in range(3)], -1)                # [P, 3]
    dp_norm = jnp.linalg.norm(dp, axis=-1, keepdims=True)
    dp = dp * jnp.minimum(1.0, 0.5 / jnp.maximum(dp_norm, 1e-12))
    dp = dp * pt_valid[:, None].astype(dp.dtype)
    return pt_pos + dp


def _gn_iteration(prob: BAProblem, cam: CameraConfig, use_huber,
                  chi2_mono: float, chi2_stereo: float, damping: float,
                  reduce_fn=None):
    """One Schur-complement GN step; returns updated poses/points.

    ``reduce_fn(S, b)`` is the distributed-assembly hook: under shard_map
    with the point axis sharded, pass ``lambda S, b: (psum(S), psum(b))`` and
    every device assembles its local partial reduced camera system, the psum
    rides ICI, and the (tiny) dense solve is computed replicated — the
    collective Schur assembly of SURVEY §5.8/§7.1."""
    S, b, terms = _assemble(prob, cam, use_huber, chi2_mono, chi2_stereo,
                            damping)
    if reduce_fn is not None:
        S, b = reduce_fn(S, b)
    dxi = _solve_cameras(S, b, prob.kf_fixed, prob.kf_valid, damping)
    new_pts = _backsub(terms, dxi, prob.pt_valid, prob.pt_pos)
    new_pose = se3.retract(SE3(prob.kf_R, prob.kf_t), dxi)
    return prob._replace(kf_R=new_pose.R, kf_t=new_pose.t, pt_pos=new_pts)


def _gn_iteration_chunked(prob: BAProblem, cam: CameraConfig, use_huber,
                          chi2_mono: float, chi2_stereo: float,
                          damping: float, n_blocks: int, reduce_fn=None):
    """One GN step over a problem too large for a single assembly: the
    point axis is processed in ``n_blocks`` blocks under ``lax.scan`` —
    pass 1 accumulates the reduced camera system (the Schur cross terms are
    point-separable, so block sums are exact), pass 2 recomputes each
    block's terms (rematerialization: FLOPs are free, HBM is not) and
    back-substitutes its points.  This is the global-BA engine
    (Optimizer::GlobalBundleAdjustemnt [sic], Optimizer.cc:41-237)."""
    K = prob.kf_R.shape[0]
    P, M = prob.obs_kf.shape
    assert P % n_blocks == 0, (P, n_blocks)
    PB = P // n_blocks

    def block(i):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * PB, PB, axis=0)
        return prob._replace(pt_pos=sl(prob.pt_pos),
                             pt_valid=sl(prob.pt_valid),
                             obs_kf=sl(prob.obs_kf),
                             obs_uvr=sl(prob.obs_uvr),
                             obs_w=sl(prob.obs_w),
                             obs_valid=sl(prob.obs_valid))

    def acc(carry, i):
        S, b = carry
        Sb, bb, _ = _assemble(block(i), cam, use_huber, chi2_mono,
                              chi2_stereo, damping)
        return (S + Sb, b + bb), None

    init = (jnp.zeros((K, K, 6, 6)), jnp.zeros((K, 6)))
    (S, b), _ = jax.lax.scan(acc, init, jnp.arange(n_blocks))
    if reduce_fn is not None:
        # Distributed assembly: each device's point shard contributed its
        # partial reduced camera system; one psum merges them over ICI and
        # the dense solve below runs replicated (SURVEY §5.8).
        S, b = reduce_fn(S, b)
    dxi = _solve_cameras(S, b, prob.kf_fixed, prob.kf_valid, damping)

    def back(_, i):
        blk = block(i)
        _, _, terms = _assemble(blk, cam, use_huber, chi2_mono, chi2_stereo,
                                damping)
        return None, _backsub(terms, dxi, blk.pt_valid, blk.pt_pos)

    _, new_blocks = jax.lax.scan(back, None, jnp.arange(n_blocks))
    new_pts = new_blocks.reshape(P, 3)
    new_pose = se3.retract(SE3(prob.kf_R, prob.kf_t), dxi)
    return prob._replace(kf_R=new_pose.R, kf_t=new_pose.t, pt_pos=new_pts)


def optimize_global_ba(prob: BAProblem, cam: CameraConfig,
                       cfg: OptimizerConfig, n_blocks: int = 8,
                       reduce_fn=None) -> BAResult:
    """Full-map bundle adjustment (GlobalBundleAdjustemnt, Optimizer.cc:41):
    every keyframe and point in one problem, point blocks streamed through
    the Schur assembly under lax.scan so HBM stays bounded.  The reference
    runs 10 LM iterations with Huber kernels (LoopClosing.cc:651).

    ``reduce_fn``: distributed-assembly hook (see _gn_iteration) — under
    shard_map with points sharded, each device streams only its shard's
    blocks and one psum per iteration merges the camera system."""
    def body(_, pr):
        return _gn_iteration_chunked(pr, cam, jnp.bool_(True),
                                     cfg.chi2_mono, cfg.chi2_stereo,
                                     damping=1e-5, n_blocks=n_blocks,
                                     reduce_fn=reduce_fn)

    prob = jax.lax.fori_loop(0, cfg.global_ba_iters, body, prob)
    e, _, _, is_stereo = _residuals_jacobians(prob, cam)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_w
    th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    final_valid = prob.obs_valid & (chi2 <= th)
    return BAResult(kf_R=prob.kf_R, kf_t=prob.kf_t, pt_pos=prob.pt_pos,
                    obs_valid=final_valid, chi2=chi2)


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
