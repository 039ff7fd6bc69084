"""Two-view monocular initialization: batched H/F RANSAC + motion recovery.

Replaces `Initializer.cc` (931 LoC; SURVEY §2.1 Initializer row): the
reference fits a homography and a fundamental matrix in two std::threads
(Initializer.cc:104-105); here both models' hypothesis batches evaluate in
one device program.  Model selection keeps the reference's rule
``RH = SH / (SH + SF) > 0.40 -> homography`` (Initializer.cc:112-121) with
the same truncated symmetric-transfer scoring, and motion recovery implements
Faugeras' 8-hypothesis homography decomposition and the 4-way essential
decomposition with cheirality/parallax arbitration (ReconstructH/F, CheckRT).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from . import fundamental as fmod

TH_F = 3.841      # chi2(1) 95% — F distance score threshold
TH_H = 5.991      # chi2(2) — H transfer score threshold
GAMMA = 5.991     # score offset (Initializer.cc CheckFundamental/Homography)


# --------------------------------------------------------------------- #
# homography estimation
# --------------------------------------------------------------------- #

def _dlt_homography(p1, p2):
    """H from >= 4 correspondences via DLT ([K, 2] normalized coords)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)          # [2K, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _h_transfer_error(H, p1, p2):
    """Symmetric transfer squared errors ([N] each direction)."""
    ones = jnp.ones((*p1.shape[:-1], 1), p1.dtype)
    x1h = jnp.concatenate([p1, ones], axis=-1)
    x2h = jnp.concatenate([p2, ones], axis=-1)
    Hx1 = x1h @ H.T
    Hx1 = Hx1[..., :2] / jnp.where(jnp.abs(Hx1[..., 2:]) < 1e-9, 1e-9,
                                   Hx1[..., 2:])
    Hinv = jnp.linalg.inv(H)
    Hx2 = x2h @ Hinv.T
    Hx2 = Hx2[..., :2] / jnp.where(jnp.abs(Hx2[..., 2:]) < 1e-9, 1e-9,
                                   Hx2[..., 2:])
    e12 = jnp.sum((Hx1 - p2) ** 2, axis=-1)
    e21 = jnp.sum((Hx2 - p1) ** 2, axis=-1)
    return e21, e12


class TwoViewModels(NamedTuple):
    H: jnp.ndarray
    F: jnp.ndarray
    score_h: jnp.ndarray
    score_f: jnp.ndarray
    inliers_h: jnp.ndarray
    inliers_f: jnp.ndarray


def fit_models(p1, p2, valid, key, n_hypotheses: int = 200,
               sigma: float = 1.0) -> TwoViewModels:
    """Fit H and F with batched RANSAC and the reference's truncated scores
    (Initializer.cc:305-457: score += gamma - chi2 for chi2 < gamma)."""
    inv_s2 = 1.0 / (sigma * sigma)
    k1, k2 = jax.random.split(key)
    logits = jnp.where(valid, 0.0, -1e9)

    # ---- homography (4-point samples) ----
    idx_h = jax.random.categorical(k1, logits[None], shape=(n_hypotheses, 4))
    H_h = jax.vmap(lambda i: _dlt_homography(p1[i], p2[i]))(idx_h)

    def score_h_fn(H):
        e21, e12 = _h_transfer_error(H, p1, p2)
        c21, c12 = e21 * inv_s2, e12 * inv_s2
        ok = (c21 < TH_H) & (c12 < TH_H) & valid
        score = jnp.where(c21 < TH_H, GAMMA - c21, 0.0) \
            + jnp.where(c12 < TH_H, GAMMA - c12, 0.0)
        return jnp.sum(score * valid), ok

    scores_h, inl_h = jax.vmap(score_h_fn)(H_h)
    best_h = jnp.argmax(scores_h)

    # ---- fundamental (8-point samples) ----
    idx_f = jax.random.categorical(k2, logits[None], shape=(n_hypotheses, 8))
    F_h = jax.vmap(lambda i: fmod._eight_point(p1[i], p2[i]))(idx_f)

    def score_f_fn(F):
        d12 = fmod.epipolar_distance(F, p1, p2) ** 2 * inv_s2
        d21 = fmod.epipolar_distance(F.T, p2, p1) ** 2 * inv_s2
        ok = (d12 < TH_F) & (d21 < TH_F) & valid
        score = jnp.where(d12 < TH_F, GAMMA - d12, 0.0) \
            + jnp.where(d21 < TH_F, GAMMA - d21, 0.0)
        return jnp.sum(score * valid), ok

    scores_f, inl_f = jax.vmap(score_f_fn)(F_h)
    best_f = jnp.argmax(scores_f)

    return TwoViewModels(
        H=H_h[best_h], F=F_h[best_f],
        score_h=scores_h[best_h], score_f=scores_f[best_f],
        inliers_h=inl_h[best_h], inliers_f=inl_f[best_f])


# --------------------------------------------------------------------- #
# triangulation + hypothesis checking
# --------------------------------------------------------------------- #

def triangulate_dlt(P1, P2, p1, p2):
    """Batched linear triangulation ([N, 2] normalized coords, [3, 4]
    projection matrices) -> [N, 3] (the reference's Triangulate,
    Initializer.h:70).

    Solved inhomogeneously (fix X4=1): A[:, :3] X = -A[:, 3] via 3x3 normal
    equations with a closed-form adjugate inverse.  The reference's
    homogeneous SVD nullspace differs only for points near infinity, which
    every caller's depth/parallax gates reject anyway — and batched
    `jnp.linalg.svd` on [N, 4, 4] lowers to sequential Jacobi sweeps on
    TPU (~1 s per 20k matrices), while this is three fused VPU ops."""
    rows = jnp.stack([
        p1[:, 0, None] * P1[2] - P1[0],
        p1[:, 1, None] * P1[2] - P1[1],
        p2[:, 0, None] * P2[2] - P2[0],
        p2[:, 1, None] * P2[2] - P2[1],
    ], axis=1)                                       # [N, 4, 4]
    A = rows[:, :, :3]                               # [N, 4, 3]
    b = -rows[:, :, 3]                               # [N, 4]
    AtA = jnp.einsum("nri,nrj->nij", A, A)           # [N, 3, 3]
    Atb = jnp.einsum("nri,nr->ni", A, b)             # [N, 3]
    # Tikhonov floor keeps degenerate (zero-parallax) rows finite; their
    # solutions fail the callers' chi2/parallax gates.
    AtA = AtA + 1e-9 * jnp.eye(3, dtype=AtA.dtype)
    return jnp.einsum("nij,nj->ni", _inv3x3(AtA), Atb)


def _inv3x3(H):
    """Closed-form inverse of [..., 3, 3] matrices (adjugate/determinant)."""
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
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    rows = jnp.stack([jnp.stack([A, B, C], -1), jnp.stack([D, E, F], -1),
                      jnp.stack([G, Hc, K], -1)], -2)
    return rows * inv_det[..., None, None]


def check_rt(R, t, p1, p2, valid, sigma: float = 1.0):
    """Cheirality + reprojection + parallax filter for one (R, t) hypothesis
    (Initializer::CheckRT semantics).  Points in NORMALIZED camera coords.

    Returns (n_good, X [N, 3], good [N], median parallax cos).
    """
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_dlt(P1, P2, p1, p2)

    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]

    # Parallax between the two rays.
    C2 = -R.T @ t
    r1 = X
    r2 = X - C2
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)

    # Reprojection in normalized coords, scaled by sigma in pixels happens
    # at the caller (we use a fixed normalized threshold tied to focal).
    e1 = jnp.sum((X[:, :2] / jnp.where(jnp.abs(z1[:, None]) < 1e-9, 1e-9,
                                       z1[:, None]) - p1) ** 2, -1)
    e2 = jnp.sum((X2[:, :2] / jnp.where(jnp.abs(z2[:, None]) < 1e-9, 1e-9,
                                        z2[:, None]) - p2) ** 2, -1)

    good = valid & (z1 > 0) & (z2 > 0) & (cos_par < 0.99998)
    return good, X, e1 + e2, cos_par


def decompose_essential(E):
    """E -> 4 (R, t) hypotheses (DecomposeE, Initializer.cc)."""
    u, _, vt = jnp.linalg.svd(E)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def decompose_homography(H):
    """Faugeras SVD decomposition of a (normalized-coordinate) homography
    into 8 (R, t, n) hypotheses (ReconstructH, Initializer.cc)."""
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = (aux1, aux1, -aux1, -aux1)
    x3s = (aux3, -aux3, aux3, -aux3)

    def mat3(rows):
        return jnp.stack([jnp.stack(r) for r in rows])

    zero = jnp.zeros(())
    one = jnp.ones(())
    hyps = []

    # d' > 0 branch.
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                  * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sts = (aux_st, -aux_st, -aux_st, aux_st)
    for i in range(4):
        x1, x3, st = x1s[i], x3s[i], sts[i]
        Rp = mat3([[ct, zero, -st], [zero, one, zero], [st, zero, ct]])
        R = s * U @ Rp @ Vt
        t = U @ (jnp.stack([x1, zero, -x3]) * (d1 - d3))
        n = V @ jnp.stack([x1, zero, x3])
        hyps.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-9), n))

    # d' < 0 branch.
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                  * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sps = (aux_sp, -aux_sp, -aux_sp, aux_sp)
    for i in range(4):
        x1, x3, sp = x1s[i], x3s[i], sps[i]
        Rp = mat3([[cp, zero, sp], [zero, -one, zero], [sp, zero, -cp]])
        R = s * U @ Rp @ Vt
        t = U @ (jnp.stack([x1, zero, x3]) * (d1 + d3))
        n = V @ jnp.stack([x1, zero, x3])
        hyps.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-9), n))
    return hyps


class ReconstructionResult(NamedTuple):
    ok: jnp.ndarray           # bool scalar
    R: jnp.ndarray            # [3, 3]
    t: jnp.ndarray            # [3] (unit scale)
    points: jnp.ndarray       # [N, 3]
    good: jnp.ndarray         # [N] bool triangulated
    used_homography: bool


def reconstruct(p1_px, p2_px, valid, cam: CameraConfig, key,
                n_hypotheses: int = 200, sigma: float = 1.0,
                min_triangulated: int = 50) -> ReconstructionResult:
    """Full two-view initialization: fit H+F, select by RH > 0.40, recover
    motion, arbitrate hypotheses by triangulation support."""
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    p1 = (p1_px - jnp.asarray([cx, cy])) / jnp.asarray([fx, fy])
    p2 = (p2_px - jnp.asarray([cx, cy])) / jnp.asarray([fx, fy])
    sigma_n = sigma / fx

    # Models are fit in PIXEL coords (threshold semantics match reference).
    models = fit_models(p1_px, p2_px, valid, key, n_hypotheses, sigma)
    rh = models.score_h / jnp.maximum(models.score_h + models.score_f, 1e-9)
    use_h = bool(rh > 0.40)

    thr_n2 = (4.0 * sigma_n) ** 2

    def eval_hyps(hyps, inliers):
        best = None
        for (R, t, *_) in hyps:
            good, X, err, cos_par = check_rt(R, t, p1, p2, inliers)
            good = good & (err < thr_n2)
            n_good = int(good.sum())
            if best is None or n_good > best[0]:
                best = (n_good, R, t, X, good)
        return best

    if use_h:
        hyps = decompose_homography(_pixels_to_normalized_h(models.H, cam))
        best = eval_hyps(hyps, models.inliers_h)
    else:
        K = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        E = K.T @ models.F @ K
        hyps = [(R, t) for (R, t) in decompose_essential(E)]
        best = eval_hyps(hyps, models.inliers_f)

    n_good, R, t, X, good = best
    ok = jnp.asarray(n_good >= min_triangulated)
    return ReconstructionResult(ok=ok, R=R, t=t, points=X, good=good,
                                used_homography=use_h)


def reconstruct_graph(p1_px, p2_px, valid, cam: CameraConfig, key,
                      n_hypotheses: int = 200, sigma: float = 1.0,
                      min_triangulated: int = 50) -> ReconstructionResult:
    """Fully JITTABLE two-view initialization: both model paths (8
    Faugeras homography hypotheses + 4 essential (R,t)) are evaluated
    in-graph and the RH rule selects between them with `where`, so the
    zero-sync realtime monocular path can initialize with NO host
    readback (the host `reconstruct` above keeps the reference-shaped
    early-exit control flow for the host pipeline; Initializer.cc:44)."""
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    p1 = (p1_px - jnp.asarray([cx, cy])) / jnp.asarray([fx, fy])
    p2 = (p2_px - jnp.asarray([cx, cy])) / jnp.asarray([fx, fy])
    sigma_n = sigma / fx
    thr_n2 = (4.0 * sigma_n) ** 2

    models = fit_models(p1_px, p2_px, valid, key, n_hypotheses, sigma)
    rh = models.score_h / jnp.maximum(models.score_h + models.score_f, 1e-9)
    use_h = rh > 0.40

    hyps_h = decompose_homography(_pixels_to_normalized_h(models.H, cam))
    Km = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    E = Km.T @ models.F @ Km
    hyps_f = decompose_essential(E)
    R_h = jnp.stack([h[0] for h in hyps_h])
    t_h = jnp.stack([h[1] for h in hyps_h])
    R_f = jnp.stack([h[0] for h in hyps_f])
    t_f = jnp.stack([h[1] for h in hyps_f])
    R_f8 = jnp.concatenate([R_f, R_f])           # pad 4 -> 8
    t_f8 = jnp.concatenate([t_f, t_f])
    Rs = jnp.where(use_h, R_h, R_f8)
    ts = jnp.where(use_h, t_h, t_f8)
    inl = jnp.where(use_h, models.inliers_h, models.inliers_f)

    def ev(R, t):
        good, X, err, _ = check_rt(R, t, p1, p2, inl, sigma=sigma_n)
        good = good & (err < thr_n2)
        return good.sum(), X, good

    ns, Xs, goods = jax.vmap(ev)(Rs, ts)
    b = jnp.argmax(ns)
    ok = ns[b] >= min_triangulated
    return ReconstructionResult(ok=ok, R=Rs[b], t=ts[b], points=Xs[b],
                                good=goods[b], used_homography=use_h)


def _pixels_to_normalized_h(H_px, cam: CameraConfig):
    """Convert a pixel-coordinate homography to normalized coords:
    Hn = K^-1 H K."""
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    return Kinv @ H_px @ K
