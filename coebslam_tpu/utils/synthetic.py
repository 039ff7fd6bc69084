"""Synthetic RGB-D world: ray-cast textured planes with exact depth + poses.

The reference validates by replaying TUM RGB-D bags (SURVEY §4); this
environment has no dataset and no egress, so the integration tests and the
benchmark render their own world instead: a textured box room (5 planes)
ray-cast per pixel, optionally with moving textured quads standing in for
walking people (exact ground-truth boxes for detector-free dynamic-filter
tests — the deterministic fake detector SURVEY §4 calls for).

Everything is jnp and jittable; a whole sequence renders on-device.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import CameraConfig
from ..geometry import se3
from ..geometry.se3 import SE3

TEX_SIZE = 512


class Plane(NamedTuple):
    origin: jnp.ndarray   # [3] a corner point of the rectangle
    e1: jnp.ndarray       # [3] first edge vector (defines tex u, length = extent)
    e2: jnp.ndarray       # [3] second edge vector (tex v)
    tex: jnp.ndarray      # [T, T] float32 texture in [0, 255]


class MovingQuad(NamedTuple):
    """A textured rectangle moving along a linear path — the dynamic object."""
    half_w: float
    half_h: float
    center0: jnp.ndarray     # [3] world position at t=0
    velocity: jnp.ndarray    # [3] units/frame
    tex: jnp.ndarray         # [T, T]


def _smooth_noise(rng: np.random.RandomState, size=TEX_SIZE, octaves=4):
    """Aperiodic multi-scale texture: band-passed white noise.

    Grid-based value noise (kron / zoom upsampling of coarse lattices) puts
    visually identical corners on a regular lattice; with BRIEF descriptors
    those alias at the lattice pitch and tracking can lock onto a shifted
    self-consistent match set (observed experimentally as sudden 8-px-scale
    pose jumps).  Filtered white noise has no lattice — every corner's
    neighbourhood is unique.
    """
    from scipy.ndimage import gaussian_filter

    img = np.zeros((size, size), np.float32)
    for o in range(octaves):
        sigma = 1.5 * (2 ** o)
        layer = gaussian_filter(rng.randn(size, size).astype(np.float32),
                                sigma=sigma)
        # Normalize band energy, weight coarse bands slightly higher.
        layer /= max(layer.std(), 1e-6)
        img += layer * (1.3 ** o)
    img -= img.min()
    img /= img.max()
    return (img * 255.0).astype(np.float32)


def make_room(seed: int = 0, size: float = 6.0,
              height: float = 2.5) -> Tuple[Plane, ...]:
    """A box room centred at origin: floor, ceiling, and three walls, each
    with an independent high-contrast texture.

    The room is realistically squat (2.5 m tall by default) so floor and
    ceiling stay in view even when the camera faces a distant wall — a
    view of nothing but one far plane is a depth-degenerate geometry that
    destabilizes any visual-odometry z estimate.
    """
    rng = np.random.RandomState(seed)
    s = size / 2.0
    h = height / 2.0

    def plane(origin, e1, e2):
        return Plane(jnp.asarray(origin, jnp.float32),
                     jnp.asarray(e1, jnp.float32),
                     jnp.asarray(e2, jnp.float32),
                     jnp.asarray(_smooth_noise(rng)))

    return (
        # back wall (z = +s), facing -z
        plane([-s, -h, s], [size, 0, 0], [0, height, 0]),
        # left wall (x = -s)
        plane([-s, -h, -s], [0, 0, size], [0, height, 0]),
        # right wall (x = +s)
        plane([s, -h, -s], [0, 0, size], [0, height, 0]),
        # floor (y = +h; camera convention: +y down)
        plane([-s, h, -s], [size, 0, 0], [0, 0, size]),
        # ceiling (y = -h)
        plane([-s, -h, -s], [size, 0, 0], [0, 0, size]),
    )


def make_walker(seed: int = 1, start=(-1.5, 0.2, 2.5),
                velocity=(0.03, 0.0, 0.0), half_w=0.35,
                half_h=0.8) -> MovingQuad:
    """A person-sized textured quad translating through the room."""
    rng = np.random.RandomState(seed)
    return MovingQuad(half_w, half_h,
                      jnp.asarray(start, jnp.float32),
                      jnp.asarray(velocity, jnp.float32),
                      jnp.asarray(_smooth_noise(rng)))


def _sample_tex(tex, u, v):
    """Bilinear texture lookup, u/v in [0, 1]."""
    t = tex.shape[0]
    x = jnp.clip(u, 0.0, 1.0) * (t - 1)
    y = jnp.clip(v, 0.0, 1.0) * (t - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, t - 1)
    y1 = jnp.minimum(y0 + 1, t - 1)
    fx, fy = x - x0, y - y0
    v00, v01 = tex[y0, x0], tex[y0, x1]
    v10, v11 = tex[y1, x0], tex[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _intersect_plane(plane: Plane, origin, dirs):
    """Ray-rectangle intersection.

    Args:
      origin: [3] camera centre in world.
      dirs: [H, W, 3] ray directions in world (z-unnormalized camera rays).
    Returns: (t, gray) with t = +inf where missed.
    """
    n = jnp.cross(plane.e1, plane.e2)
    n = n / jnp.linalg.norm(n)
    denom = jnp.einsum("hwc,c->hw", dirs, n)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    t = jnp.einsum("c,c->", plane.origin - origin, n) / denom
    hit = origin + t[..., None] * dirs
    rel = hit - plane.origin
    len1sq = jnp.dot(plane.e1, plane.e1)
    len2sq = jnp.dot(plane.e2, plane.e2)
    u = jnp.einsum("hwc,c->hw", rel, plane.e1) / len1sq
    v = jnp.einsum("hwc,c->hw", rel, plane.e2) / len2sq
    ok = (t > 1e-4) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    gray = _sample_tex(plane.tex, u, v)
    return jnp.where(ok, t, jnp.inf), gray


def render(cam: CameraConfig, pose_cw: SE3, planes: Tuple[Plane, ...],
           quad: Optional[MovingQuad] = None, frame_idx=0):
    """Render one RGB-D frame.

    Returns:
      gray: [H, W] float32 in [0, 255]
      depth: [H, W] float32 metres (camera z)
      box: [4] float32 (xmin, ymin, xmax, ymax) of the moving quad in px,
        all -1 if absent/out of view.
      dyn_mask: [H, W] bool — pixels covered by the moving quad.
    """
    h, w = cam.height, cam.width
    us = jnp.arange(w, dtype=jnp.float32)
    vs = jnp.arange(h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, vs)
    # Camera rays with z = 1 so the ray parameter equals camera depth.
    dirs_cam = jnp.stack([(uu - cam.cx) / cam.fx,
                          (vv - cam.cy) / cam.fy,
                          jnp.ones_like(uu)], axis=-1)
    pose_wc = pose_cw.inverse()
    dirs_w = jnp.einsum("ij,hwj->hwi", pose_wc.R, dirs_cam)
    origin = pose_wc.t

    depth = jnp.full((h, w), jnp.inf)
    gray = jnp.zeros((h, w))
    for plane in planes:
        t, g = _intersect_plane(plane, origin, dirs_w)
        closer = t < depth
        depth = jnp.where(closer, t, depth)
        gray = jnp.where(closer, g, gray)

    box = jnp.full((4,), -1.0)
    dyn_mask = jnp.zeros((h, w), bool)
    if quad is not None:
        center = quad.center0 + quad.velocity * jnp.asarray(frame_idx, jnp.float32)
        qplane = Plane(
            origin=center + jnp.asarray([-quad.half_w, -quad.half_h, 0.0]),
            e1=jnp.asarray([2.0 * quad.half_w, 0.0, 0.0]),
            e2=jnp.asarray([0.0, 2.0 * quad.half_h, 0.0]),
            tex=quad.tex)
        tq, gq = _intersect_plane(qplane, origin, dirs_w)
        closer = tq < depth
        depth = jnp.where(closer, tq, depth)
        gray = jnp.where(closer, gq, gray)
        dyn_mask = closer
        any_hit = closer.any()
        idx_u = jnp.where(closer, uu, jnp.inf)
        idx_v = jnp.where(closer, vv, jnp.inf)
        xmin = jnp.min(idx_u)
        ymin = jnp.min(idx_v)
        xmax = jnp.max(jnp.where(closer, uu, -jnp.inf))
        ymax = jnp.max(jnp.where(closer, vv, -jnp.inf))
        box = jnp.where(any_hit,
                        jnp.stack([xmin, ymin, xmax, ymax]),
                        jnp.full((4,), -1.0))

    depth = jnp.where(jnp.isinf(depth), 0.0, depth)   # 0 = no depth (TUM style)
    return gray, depth, box, dyn_mask


def camera_trajectory(n_frames: int, radius: float = 0.4,
                      forward: float = 0.0) -> list:
    """Smooth looping trajectory of world-to-camera poses: the camera orbits
    slightly while looking at the back wall — enough parallax for SLAM,
    bounded so the room stays in view.  Returns a list of SE3 (Tcw)."""
    poses = []
    for i in range(n_frames):
        a = 2.0 * np.pi * i / max(n_frames, 1)
        # camera centre in world
        c = np.array([radius * np.sin(a), 0.15 * np.sin(2 * a),
                      -1.2 + forward * i + 0.1 * np.cos(a)], np.float32)
        yaw = 0.12 * np.sin(a)
        pitch = 0.06 * np.cos(a)
        Rwc = (_rot_y(yaw) @ _rot_x(pitch)).astype(np.float32)
        Rcw = Rwc.T
        tcw = -Rcw @ c
        poses.append(SE3(jnp.asarray(Rcw), jnp.asarray(tcw)))
    return poses


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
