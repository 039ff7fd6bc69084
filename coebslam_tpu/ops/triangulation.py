"""Epipolar-guided two-keyframe matching + triangulation.

Replaces `LocalMapping::CreateNewMapPoints`'s inner loop (LocalMapping.cc:
208-453) and `ORBmatcher::SearchForTriangulation` (ORBmatcher.cc:657): for a
keyframe pair, unassociated keypoints are matched under an epipolar-band
penalty on the full Hamming matrix, triangulated with batched DLT, and gated
by cheirality, parallax arbitration, reprojection chi2 and scale consistency
— the exact gate set of the reference, evaluated for all candidates at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import CameraConfig, MatcherConfig, OrbConfig
from ..geometry import se3 as se3_mod
from ..geometry.se3 import SE3
from . import matching
from .initializer_ops import triangulate_dlt


def fundamental_from_poses(T1: SE3, T2: SE3, cam: CameraConfig):
    """F12 such that x2^T F12 x1 = 0 (pixel coords) — the reference's
    ComputeF12 (LocalMapping.cc:537)."""
    R12 = T1.R @ T2.R.T
    t12 = T1.t - R12 @ T2.t
    # x1^T E x2 ... careful: we define rel transform c2->c1: p1 = R12 p2 + t12.
    tx = jnp.asarray([[0.0, -t12[2], t12[1]],
                      [t12[2], 0.0, -t12[0]],
                      [-t12[1], t12[0], 0.0]])
    E = tx @ R12          # x1^T E x2 = 0
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    F = Kinv.T @ E @ Kinv  # x1_px^T F x2_px = 0
    return F


class TriangulationResult(NamedTuple):
    idx2: jnp.ndarray        # [N1] matched slot in KF2 (-1 none)
    points: jnp.ndarray      # [N1, 3] world positions
    good: jnp.ndarray        # [N1] bool — survived every gate


def triangulate_pair(
    uv1, desc1_signed, valid1, level1,
    uv2, desc2_signed, valid2, level2, ur2,
    T1: SE3, T2: SE3,
    cam: CameraConfig, orb: OrbConfig, mcfg: MatcherConfig,
    chi2_mono: float = 5.991,
) -> TriangulationResult:
    """Match + triangulate candidate keypoints of KF1 against KF2.

    Inputs are per-keyframe fixed-shape arrays; ``valid*`` should already
    exclude keypoints that carry a map point.
    """
    # Epipolar band: distance of x2 to F12 x1 below 3.84 * sigma2
    # (ORBmatcher.cc:750 CheckDistEpipolarLine).
    F12 = fundamental_from_poses(T1, T2, cam)
    ones1 = jnp.ones((uv1.shape[0], 1))
    l2 = jnp.concatenate([uv1, ones1], axis=1) @ F12.T     # lines in image 2
    num = jnp.abs(l2[:, None, 0] * uv2[None, :, 0]
                  + l2[:, None, 1] * uv2[None, :, 1] + l2[:, None, 2])
    den = jnp.sqrt(l2[:, None, 0] ** 2 + l2[:, None, 1] ** 2 + 1e-12)
    dist = num / den                                        # [N1, N2]
    sigma2 = orb.scale_factor ** (2.0 * level2.astype(jnp.float32))
    band_ok = dist < 3.84 * jnp.sqrt(sigma2)[None, :]

    d = matching.hamming_matrix(desc1_signed, desc2_signed)
    d = d + jnp.where(band_ok, 0.0, matching.BIG)
    res = matching.match(d, max_distance=mcfg.th_low, ratio=mcfg.nn_ratio_bow,
                         mutual=True, row_valid=valid1, col_valid=valid2)

    # Triangulate matched pairs in normalized coords through both poses.
    K_off = jnp.asarray([cam.cx, cam.cy])
    K_f = jnp.asarray([cam.fx, cam.fy])
    p1n = (uv1 - K_off) / K_f
    uv2m = uv2[jnp.clip(res.idx, 0)]
    p2n = (uv2m - K_off) / K_f
    P1 = jnp.concatenate([T1.R, T1.t[:, None]], axis=1)
    P2 = jnp.concatenate([T2.R, T2.t[:, None]], axis=1)
    X = triangulate_dlt(P1, P2, p1n, p2n)                   # world coords

    # Gates (LocalMapping.cc:319-433).
    pc1 = se3_mod.transform_points(T1, X)
    pc2 = se3_mod.transform_points(T2, X)
    cheir = (pc1[:, 2] > 0.02) & (pc2[:, 2] > 0.02)

    # Parallax between viewing rays.
    C1 = -T1.R.T @ T1.t
    C2 = -T2.R.T @ T2.t
    r1 = X - C1
    r2 = X - C2
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)
    parallax_ok = cos_par < 0.9998

    # Reprojection chi2 in both views.
    def reproj_err(pc, uv_obs):
        u = cam.fx * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-6) + cam.cx
        v = cam.fy * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-6) + cam.cy
        return (u - uv_obs[:, 0]) ** 2 + (v - uv_obs[:, 1]) ** 2

    s1 = orb.scale_factor ** (2.0 * level1.astype(jnp.float32))
    lvl2m = level2[jnp.clip(res.idx, 0)].astype(jnp.float32)
    s2 = orb.scale_factor ** (2.0 * lvl2m)
    chi_ok = (reproj_err(pc1, uv1) < chi2_mono * s1) \
        & (reproj_err(pc2, uv2m) < chi2_mono * s2)

    # Scale consistency: distance ratio must agree with the octave ratio
    # (LocalMapping.cc:411-433, ratioFactor = 1.5 * scaleFactor).
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_octave = (orb.scale_factor
                    ** (level1.astype(jnp.float32) - lvl2m))
    rf = 1.5 * orb.scale_factor
    scale_ok = (ratio_dist < ratio_octave * rf) \
        & (ratio_dist > ratio_octave / rf)

    good = res.valid & cheir & parallax_ok & chi_ok & scale_ok
    return TriangulationResult(
        idx2=jnp.where(good, res.idx, -1), points=X, good=good)
