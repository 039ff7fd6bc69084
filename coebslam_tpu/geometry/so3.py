"""SO(3) rotation-group operations, batched-first.

All functions broadcast over leading dimensions and are pure jnp, so they can
be vmapped/jitted freely.  These replace the reference's scattered Eigen /
g2o::SE3Quat quaternion code (Converter.cc; SURVEY §2.1 Converter row) with a
single well-tested Lie-group module.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def vee(W):
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w):
    """Exponential map so(3) -> SO(3) via Rodrigues, numerically safe at 0.

    [..., 3] -> [..., 3, 3].
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS ** 2))
    # Taylor-safe coefficients: sin(t)/t and (1-cos(t))/t^2.  The branch
    # threshold is sized for f32: (1 - cos t) loses all precision below
    # t ~ 3e-4 (1-cos < ulp(1)), so switch to the series well above that.
    small = theta2 < 1e-4                      # theta < 1e-2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def log(R):
    """Logarithm map SO(3) -> so(3): [..., 3, 3] -> [..., 3].

    Autodiff-safe: the pose-graph optimizer differentiates through this at
    exactly-identity residuals, where a naive arccos/0-division formulation
    produces NaN gradients (infinite d(arccos)/dx at 1, and 0/0 in the
    untaken `where` branch — both branches are evaluated under jacfwd).
    Near theta=pi accuracy degrades gracefully (the SLAM solvers only take
    log of small incremental rotations).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Clip strictly inside (-1, 1): keeps d(arccos) finite.  The value error
    # at the clip boundary is ~5e-4 rad — far below solver noise.
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = jnp.arccos(cos_theta)
    sin_theta = jnp.sin(theta)
    # w = theta/(2 sin theta) * vee(R - R^T); near 0 the factor -> 1/2.
    sin_safe = jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, sin_theta)
    factor = jnp.where(jnp.abs(sin_theta) < _EPS,
                       0.5 + theta * theta / 12.0,
                       theta / (2.0 * sin_safe))
    antisym = vee(R - jnp.swapaxes(R, -1, -2))
    w = factor[..., None] * antisym

    # Near theta = pi the antisymmetric part vanishes and the above is
    # ill-conditioned.  Recover the axis from the quadratic form
    # n_i^2 = (R_ii - cos)/(1 - cos), with relative signs from the symmetric
    # off-diagonal entries pivoted on the largest component.
    near_pi = theta > 3.0
    one_minus_cos = jnp.maximum(1.0 - cos_theta, _EPS)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    n_abs = jnp.sqrt(jnp.maximum(
        (diag - cos_theta[..., None]) / one_minus_cos[..., None], 0.0))
    sym = 0.5 * (R + jnp.swapaxes(R, -1, -2))  # S_ij = n_i n_j (1-cos) + cos δ
    k = jnp.argmax(n_abs, axis=-1)
    # signs_i = sign(S[k, i]) gives n_i relative to n_k > 0 (i == k row gives
    # S[k,k] = n_k^2(1-cos)+cos which can be negative only if n_k small — but
    # k is the largest component so S[k,k] > 0 near pi).
    row_k = jnp.take_along_axis(
        sym, k[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    signs = jnp.where(row_k >= 0.0, 1.0, -1.0)
    axis = n_abs * signs
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    # Orient using the (possibly tiny) antisymmetric part: sin(theta) >= 0 for
    # theta in [0, pi], so axis . antisym must be >= 0.  At exactly pi both
    # signs are equivalent.
    dot = jnp.sum(axis * antisym, axis=-1, keepdims=True)
    axis = axis * jnp.where(dot < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis
    return jnp.where(near_pi[..., None], w_pi, w)


def left_jacobian(w):
    """Left Jacobian J_l of SO(3): [..., 3] -> [..., 3, 3].

    exp(w) translation coupling for SE(3) exp: V = J_l(w).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS ** 2))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * WW


def left_jacobian_inv(w):
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS ** 2))
    small = theta2 < _EPS
    half = theta * 0.5
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS))
                    / jnp.maximum(theta2, _EPS ** 2))
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * WW


def quat_to_matrix(q):
    """Unit quaternion (w, x, y, z) -> rotation matrix. [..., 4] -> [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def matrix_to_quat(R):
    """Rotation matrix -> unit quaternion (w, x, y, z), branchless.

    Uses the four candidate square roots and selects the best-conditioned one
    (largest pivot), so it is vmappable without data-dependent branching.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate 0: pivot on trace.
    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # Candidate 1: pivot on m00.
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # Candidate 2: pivot on m11.
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # Candidate 3: pivot on m22.
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11],
                       axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4 candidates, 4]
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def orthonormalize(R, iterations: int = 2):
    """Project a near-rotation back onto SO(3) by Newton polar iteration:
    R <- 1.5 R - 0.5 R R^T R (quadratic convergence for small drift).

    The per-frame pose chaining composes hundreds of f32 3x3 products; the
    accumulated scale drift (det != 1) is invisible to the solvers until a
    loop correction multiplies the drifted rotations together — so every
    pose-producing path re-projects.  Cheap (two 3x3 matmuls per iteration),
    differentiable, no SVD.
    """
    for _ in range(iterations):
        R = 1.5 * R - 0.5 * R @ jnp.swapaxes(R, -1, -2) @ R
    return R


def normalize_matrix(R):
    """Re-orthonormalize a drifting rotation matrix via SVD projection."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate([jnp.ones_like(det[..., None]),
                         jnp.ones_like(det[..., None]),
                         det[..., None]], axis=-1)
    return (u * d[..., None, :]) @ vt
