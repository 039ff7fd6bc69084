"""Batched fundamental-matrix estimation: normalized 8-point + vmapped RANSAC.

Replaces `cv::findFundamentalMat(..., FM_RANSAC)` in the COEB motion check
(Frame.cc:370): instead of an early-exit sequential RANSAC loop, all H
hypotheses are generated and scored in parallel (SURVEY §7.1 "batched RANSAC
everywhere") — a fixed-shape computation that fits the TPU, and with
H ~ hundreds it explores more hypotheses than OpenCV's adaptive loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FundamentalResult(NamedTuple):
    F: jnp.ndarray            # [3, 3]
    inliers: jnp.ndarray      # [N] bool
    n_inliers: jnp.ndarray    # int32


def _normalize_points(pts, valid):
    """Hartley normalization: zero-mean, mean distance sqrt(2)."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    centered = pts - mean
    scale = jnp.sqrt(2.0) / jnp.maximum(
        (jnp.linalg.norm(centered, axis=-1) * w).sum() / n, 1e-9)
    T = jnp.array([[scale, 0.0, -scale * mean[0]],
                   [0.0, scale, -scale * mean[1]],
                   [0.0, 0.0, 1.0]], dtype=pts.dtype)
    return centered * scale, T


def _design_rows(p1, p2):
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    return jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                      jnp.ones_like(x1)], axis=-1)        # [..., K, 9]


def _eight_point(p1, p2):
    """F from a MINIMAL 8-correspondence sample (normalized coords).

    Gauge-fixes f9 = 1 and solves the square 8x8 system A[:, :8] f =
    -A[:, 8] directly — full f32 accuracy on the unsquared system, and a
    batched LU is a few KB of code where a vmapped SVD unrolls to ~16 MB.
    (Samples whose true f9 ~ 0 yield poor hypotheses; RANSAC's scoring
    discards them, and the final refit uses the exact SVD nullspace.)
    Scoring skips the rank-2 projection (ranking is insensitive to it);
    the final refit applies it exactly."""
    A = _design_rows(p1, p2)
    f8 = jnp.linalg.solve(A[..., :8], -A[..., 8])
    return jnp.concatenate([f8, jnp.ones_like(f8[..., :1])],
                           axis=-1).reshape(3, 3)


def epipolar_distance(F, p1, p2):
    """Point-to-epiline distance of p2 against F @ p1 (the reference's check
    at Frame.cc:372-385: |a x + b y + c| / sqrt(a^2 + b^2))."""
    ones = jnp.ones((*p1.shape[:-1], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    line = x1 @ F.T                                     # [N, 3] (a, b, c)
    num = jnp.abs(jnp.sum(line[..., :2] * p2, axis=-1) + line[..., 2])
    den = jnp.linalg.norm(line[..., :2], axis=-1)
    return num / jnp.maximum(den, 1e-9)


def find_fundamental_ransac(p1, p2, valid, key, *, n_hypotheses: int = 256,
                            threshold: float = 1.0) -> FundamentalResult:
    """RANSAC F estimation over correspondences p1 <-> p2 ([N, 2] each).

    All hypotheses are solved and scored as one batch; the best-inlier
    hypothesis is refit on its inlier set (one extra 8-point solve on all
    inliers via weighting).
    """
    n = p1.shape[0]
    p1n, T1 = _normalize_points(p1, valid)
    p2n, T2 = _normalize_points(p2, valid)

    # Sample 8 indices per hypothesis among valid correspondences: draw from
    # a categorical over the validity mask.
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits[None, :],
                                 shape=(n_hypotheses, 8))   # [H, 8]

    F_h = jax.vmap(lambda i: _eight_point(p1n[i], p2n[i]))(idx)  # [H, 3, 3]
    d = jax.vmap(lambda F: epipolar_distance(F, p1n, p2n))(F_h)  # [H, N]
    # Normalized-coordinate threshold: map pixel threshold through T2 scale.
    thr_n = threshold * T2[0, 0]
    inl = (d < thr_n) & valid[None, :]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)

    # Refit on the best hypothesis's inliers with a weighted 8-point (zero
    # rows for outliers keep the shape static).
    # The refit runs ONCE (not vmapped), so the exact SVD is affordable
    # code-wise and avoids the Gram matrix's squared conditioning, which
    # caps the hypothesis solver's f32 accuracy at ~2 px.
    sel = inl[best]
    w = sel.astype(p1.dtype)[:, None]
    A = _design_rows(p1n, p2n) * w
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    F = (u * s.at[2].set(0.0)[None, :]) @ vt2

    # De-normalize: F_px = T2^T F T1.
    F_px = T2.T @ F @ T1
    norm = jnp.maximum(jnp.abs(F_px).max(), 1e-12)
    F_px = F_px / norm

    d_px = epipolar_distance(F_px, p1, p2)
    inliers = (d_px < threshold) & valid
    return FundamentalResult(F=F_px, inliers=inliers,
                             n_inliers=inliers.sum().astype(jnp.int32))
