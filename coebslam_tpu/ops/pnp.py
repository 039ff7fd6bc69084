"""Depth-free PnP: batched EPnP + vmapped RANSAC.

Replaces `PnPsolver` (PnPsolver.cc:67-341, itself EPnP + RANSAC over
4-point minimal sets) for relocalization without per-keypoint depth —
the monocular path, and a depth-independent fallback for RGB-D
(`Tracking::Relocalization`, Tracking.cc:1417-1580).

TPU-native design: the reference iterates RANSAC hypotheses one at a
time on the CPU (PnPsolver::iterate); here all hypotheses are solved as
one vmapped batch of small dense linear-algebra problems (12x12 eigh for
the null space, 6x4 least squares for the betas, a fixed-iteration
Gauss-Newton polish on the betas) and scored against all correspondences
with one [H, N] reprojection pass — MXU-shaped work, no data-dependent
control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from ..geometry import camera as cam_ops
from .procrustes import umeyama

_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _control_points(X, w):
    """Weighted EPnP control points: centroid + principal axes of the
    world cloud (EPnP paper §3.1; PnPsolver::choose_control_points)."""
    wn = w / jnp.maximum(w.sum(), 1e-9)
    c0 = jnp.einsum("n,ni->i", wn, X)
    Xc = X - c0
    cov = jnp.einsum("n,ni,nj->ij", wn, Xc, Xc)
    eval_, evec = jnp.linalg.eigh(cov)          # ascending
    # Guard degenerate (planar/linear) clouds: floor the spread.
    scale = jnp.sqrt(jnp.maximum(eval_, 1e-8))
    ctrl = c0[None] + (evec * scale[None, :]).T  # rows: 3 axes
    return jnp.concatenate([c0[None], ctrl], 0)  # [4, 3]


def _barycentric(X, ctrl):
    """alphas st X_i = sum_j alpha_ij ctrl_j, sum_j alpha_ij = 1."""
    B = (ctrl[1:] - ctrl[0]).T                   # [3, 3]
    beta = jnp.linalg.solve(
        B + 1e-9 * jnp.eye(3), (X - ctrl[0]).T).T   # [N, 3]
    a0 = 1.0 - beta.sum(-1, keepdims=True)
    return jnp.concatenate([a0, beta], -1)       # [N, 4]


def _rho(ctrl):
    return jnp.stack([jnp.sum((ctrl[i] - ctrl[j]) ** 2)
                      for i, j in _PAIRS])


def _cam_ctrl(V, betas):
    """Camera-frame control points from null-space basis + betas."""
    return jnp.einsum("k,kij->ij", betas, V)     # [4, 3]


def _beta_residual(V, betas, rho):
    cc = _cam_ctrl(V, betas)
    d = jnp.stack([jnp.sum((cc[i] - cc[j]) ** 2) for i, j in _PAIRS])
    return d - rho


def _gauss_newton_betas(V, betas0, rho, iters: int = 5):
    """Polish betas on the 6 inter-control-point distance constraints
    (PnPsolver::gauss_newton); fixed iterations, batched-safe."""
    def step(betas, _):
        J = jax.jacfwd(lambda b: _beta_residual(V, b, rho))(betas)  # [6,4]
        r = _beta_residual(V, betas, rho)
        JtJ = J.T @ J + 1e-6 * jnp.eye(4)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        return betas - delta, None
    betas, _ = jax.lax.scan(step, betas0, None, length=iters)
    return betas


class PnPResult(NamedTuple):
    R: jnp.ndarray           # [3, 3] world -> camera
    t: jnp.ndarray           # [3]
    err2: jnp.ndarray        # mean squared reprojection error (diagnostic)


def epnp(X, uv, w, cam: CameraConfig) -> PnPResult:
    """Weighted EPnP for n >= 4 correspondences (rows with w=0 ignored).

    Args:
      X: [N, 3] world points.  uv: [N, 2] pixels.  w: [N] weights.
    """
    ctrl_w = _control_points(X, w)
    alphas = _barycentric(X, ctrl_w)             # [N, 4]
    rho = _rho(ctrl_w)

    # M^T M accumulated directly (rows weighted): M rows are
    #   [a_j fx, 0, a_j (cx - u)] and [0, a_j fy, a_j (cy - v)]  j=0..3
    du = cam.cx - uv[:, 0]
    dv = cam.cy - uv[:, 1]
    zeros = jnp.zeros_like(du)
    fx = jnp.full_like(du, cam.fx)
    fy = jnp.full_like(du, cam.fy)
    row_u = jnp.stack([fx, zeros, du], -1)       # [N, 3]
    row_v = jnp.stack([zeros, fy, dv], -1)
    # M_u[i] = kron(alphas[i], row_u[i]) : [N, 12]
    Mu = (alphas[:, :, None] * row_u[:, None, :]).reshape(-1, 12)
    Mv = (alphas[:, :, None] * row_v[:, None, :]).reshape(-1, 12)
    MtM = (Mu * w[:, None]).T @ Mu + (Mv * w[:, None]).T @ Mv   # [12, 12]
    _, vecs = jnp.linalg.eigh(MtM)               # ascending eigvalues
    V = vecs[:, :4].T.reshape(4, 4, 3)           # 4 smallest null vectors

    # Case N=1 closed form (find_betas_approx ... degenerate but a start):
    def beta1_of(v):
        cc = v.reshape(4, 3)
        num = jnp.stack([jnp.linalg.norm(cc[i] - cc[j]) * jnp.sqrt(rho[k])
                         for k, (i, j) in enumerate(_PAIRS)]).sum()
        den = jnp.stack([jnp.sum((cc[i] - cc[j]) ** 2)
                         for i, j in _PAIRS]).sum()
        return num / jnp.maximum(den, 1e-12)

    def solve_case(betas0):
        betas = _gauss_newton_betas(V, betas0, rho)
        cc = _cam_ctrl(V, betas)                 # [4, 3]
        pc = alphas @ cc                         # [N, 3]
        # Resolve the global sign: depths must be positive.
        sign = jnp.where(jnp.einsum("n,n->", w, pc[:, 2]) < 0, -1.0, 1.0)
        pc = pc * sign
        _, R, t = umeyama(X, pc, weights=w)
        proj = cam_ops.project(cam, X @ R.T + t)
        err2 = jnp.einsum("n,n->", w, jnp.sum((proj - uv) ** 2, -1)) \
            / jnp.maximum(w.sum(), 1e-9)
        return PnPResult(R, t, err2)

    # Three beta initializations (the reference tries cases N=1,2,3 and
    # keeps the best, PnPsolver::compute_pose): dominant vector, dominant
    # pair, spread.  GN polish pulls each into its local optimum.
    b1 = beta1_of(V[0].reshape(12))
    cands = [
        jnp.array([1.0, 0.0, 0.0, 0.0]) * b1,
        jnp.array([1.0, 0.1, 0.0, 0.0]) * b1,
        jnp.array([1.0, 0.1, 0.1, 0.1]) * b1,
    ]
    results = [solve_case(b) for b in cands]
    errs = jnp.stack([r.err2 for r in results])
    best = jnp.argmin(errs)
    Rs = jnp.stack([r.R for r in results])
    ts = jnp.stack([r.t for r in results])
    return PnPResult(Rs[best], ts[best], errs[best])


class PnPRansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray     # [N] bool
    n_inliers: jnp.ndarray   # int32


def ransac_epnp(X, uv, valid, key, cam: CameraConfig, *,
                n_hypotheses: int = 64, sample_size: int = 6,
                px_threshold: float = 5.99 ** 0.5 * 2.0) -> PnPRansacResult:
    """RANSAC EPnP: vmapped minimal solves + one [H, N] scoring pass +
    weighted re-solve on the best consensus set (PnPsolver::iterate +
    refine).  ``sample_size=6`` trades a slightly larger sample for far
    better EPnP conditioning than the minimal 4."""
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits[None, :],
                                 shape=(n_hypotheses, sample_size))
    w_one = jnp.ones(sample_size)

    def one(i):
        r = epnp(X[i], uv[i], w_one, cam)
        return r.R, r.t

    R_h, t_h = jax.vmap(one)(idx)
    pc = jnp.einsum("hij,nj->hni", R_h, X) + t_h[:, None, :]
    proj = cam_ops.project(cam, pc)
    err = jnp.linalg.norm(proj - uv[None], axis=-1)
    ok = (err < px_threshold) & (pc[..., 2] > 0.05) & valid[None, :]
    counts = ok.sum(-1)
    best = jnp.argmax(counts)

    # Weighted full re-solve on the consensus set.
    w = ok[best].astype(jnp.float32)
    enough = counts[best] >= 4
    r = epnp(X, uv, w + (1.0 - enough) * 1e-3, cam)
    pc = X @ r.R.T + r.t
    proj = cam_ops.project(cam, pc)
    err = jnp.linalg.norm(proj - uv, axis=-1)
    inl = (err < px_threshold) & (pc[:, 2] > 0.05) & valid
    # Fall back to the best raw hypothesis if the re-solve regressed.
    use_refit = inl.sum() >= counts[best]
    R = jnp.where(use_refit, r.R, R_h[best])
    t = jnp.where(use_refit, r.t, t_h[best])
    inliers = jnp.where(use_refit, inl, ok[best])
    return PnPRansacResult(R, t, inliers,
                           inliers.sum().astype(jnp.int32))
