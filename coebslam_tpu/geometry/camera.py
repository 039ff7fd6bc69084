"""Pinhole camera model: projection, unprojection, undistortion, frustum test.

Replaces the reference's scattered OpenCV calls — `cv::undistortPoints`
(Frame.cc:597), manual projection in `Frame::isInFrustum` (Frame.cc:445) and
`ORBmatcher::SearchByProjection` — with batched jnp functions keyed off
:class:`coebslam_tpu.config.CameraConfig`.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraConfig


def intrinsic_matrix(cam: CameraConfig, dtype=jnp.float32):
    return jnp.array([[cam.fx, 0.0, cam.cx],
                      [0.0, cam.fy, cam.cy],
                      [0.0, 0.0, 1.0]], dtype=dtype)


def project(cam: CameraConfig, pts_cam):
    """Project camera-frame 3D points [..., 3] to pixel coords [..., 2].

    Points behind the camera project to garbage; callers must combine with
    the ``z > 0`` validity mask (see :func:`in_frustum`).
    """
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pts_cam[..., 0] / z_safe + cam.cx
    v = cam.fy * pts_cam[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: CameraConfig, pts_cam):
    """Project to (u, v, u_right) — the reference's 3-channel stereo
    observation (virtual right camera, Frame.cc:820-842): u_r = u - bf/z."""
    uv = project(cam, pts_cam)
    z = jnp.where(jnp.abs(pts_cam[..., 2]) < 1e-9, 1e-9, pts_cam[..., 2])
    ur = uv[..., 0] - cam.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def unproject(cam: CameraConfig, uv, depth):
    """Back-project pixels [..., 2] with depth [...] to camera-frame 3D
    points [..., 3] (reference Frame::UnprojectStereo, Frame.cc:844)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: CameraConfig, xy):
    """Apply the radial-tangential (plumb-bob) model to normalized coords."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
    x_d = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    y_d = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([x_d, y_d], axis=-1)


def undistort_points(cam: CameraConfig, uv, iterations: int = 8):
    """Iteratively undistort pixel coordinates (cv::undistortPoints
    semantics, fixed-point iteration — same algorithm OpenCV uses).

    [..., 2] pixels -> [..., 2] undistorted pixels.  With zero distortion this
    is the identity (the TUM fr3 config ships k=p=0).
    """
    if cam.k1 == cam.k2 == cam.p1 == cam.p2 == cam.k3 == 0.0:
        return uv
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy = jnp.stack([x0, y0], axis=-1)
    guess = xy
    for _ in range(iterations):
        d = distort_normalized(cam, guess) - guess
        guess = xy - d
    return jnp.stack([guess[..., 0] * cam.fx + cam.cx,
                      guess[..., 1] * cam.fy + cam.cy], axis=-1)


def in_frustum(cam: CameraConfig, pts_cam, margin: float = 0.0):
    """Boolean mask: points in front of the camera and inside image bounds.

    Mirrors Frame::isInFrustum's depth+bounds checks (Frame.cc:445); the
    viewing-angle and scale checks live with the map point logic.
    """
    z_ok = pts_cam[..., 2] > 1e-6
    uv = project(cam, pts_cam)
    u_ok = (uv[..., 0] >= -margin) & (uv[..., 0] < cam.width + margin)
    v_ok = (uv[..., 1] >= -margin) & (uv[..., 1] < cam.height + margin)
    return z_ok & u_ok & v_ok
