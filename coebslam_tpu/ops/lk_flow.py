"""Pyramidal Lucas-Kanade optical flow + Harris/Shi-Tomasi corner selection.

TPU-native replacement for the OpenCV calls at the heart of the COEB motion
check (`Frame::ProcessMovingObject`, Frame.cc:311-393):
  cv::goodFeaturesToTrack(..., 1000, 0.01, 8, ..., 3, true, 0.04)
  cv::cornerSubPix
  cv::calcOpticalFlowPyrLK

Everything is batched over the N tracked points: patch gathers are bilinear
[N, W, W] tensors, the LK normal equations are 2x2 einsum solves, and the
whole coarse-to-fine iteration runs inside one jit.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import grid_select, pyramid


# --------------------------------------------------------------------- #
# corner selection (goodFeaturesToTrack semantics)
# --------------------------------------------------------------------- #

def _structure_tensor(img, block: int = 3):
    """Per-pixel 2x2 structure tensor summed over a block window."""
    # Sobel gradients (cv::goodFeaturesToTrack uses Sobel aperture 3).
    pad = jnp.pad(img, 1, mode="edge")
    gx = (pad[1:-1, 2:] - pad[1:-1, :-2]) * 2.0 \
        + (pad[:-2, 2:] - pad[:-2, :-2]) + (pad[2:, 2:] - pad[2:, :-2])
    gy = (pad[2:, 1:-1] - pad[:-2, 1:-1]) * 2.0 \
        + (pad[2:, 2:] - pad[:-2, 2:]) + (pad[2:, :-2] - pad[:-2, :-2])
    gx = gx / 8.0
    gy = gy / 8.0

    def box(x):
        p = jnp.pad(x, block // 2, mode="edge")
        out = jnp.zeros_like(x)
        for dy in range(block):
            for dx in range(block):
                out = out + p[dy:dy + x.shape[0], dx:dx + x.shape[1]]
        return out

    return box(gx * gx), box(gx * gy), box(gy * gy)


def harris_response(img, k: float = 0.04, block: int = 3):
    """Harris corner response (the reference passes useHarrisDetector=true,
    k=0.04 — Frame.cc:333)."""
    a, b, c = _structure_tensor(img, block)
    det = a * c - b * b
    trace = a + c
    return det - k * trace * trace


def min_eig_response(img, block: int = 3):
    """Shi-Tomasi minimum-eigenvalue response (goodFeaturesToTrack default)."""
    a, b, c = _structure_tensor(img, block)
    half_tr = 0.5 * (a + c)
    rad = jnp.sqrt(jnp.maximum(half_tr * half_tr - (a * c - b * b), 0.0))
    return half_tr - rad


def good_features(img, n_points: int, quality: float = 0.01,
                  min_distance: int = 8, use_harris: bool = True):
    """Select up to n_points corners (goodFeaturesToTrack semantics):
    response > quality * max_response, spatially separated by ~min_distance,
    strongest first.  Returns (uv [n,2] float32 (x, y), valid [n])."""
    resp = harris_response(img) if use_harris else min_eig_response(img)
    resp = jnp.where(resp > quality * jnp.max(resp), resp, 0.0)
    # NMS + cell-quantized spacing approximates the min-distance suppression.
    from . import fast as fast_mod
    resp_nms = fast_mod.nms_3x3(resp)
    yx, score, valid = grid_select.select_grid_topk(
        resp_nms, cell_size=max(min_distance, 4), k_per_cell=1,
        n_out=n_points)
    # Sub-pixel refinement (cornerSubPix stand-in).
    off = fast_mod.subpixel_refine(resp, yx)
    uv = jnp.stack([yx[:, 1] + off[:, 1], yx[:, 0] + off[:, 0]], axis=-1)
    return jnp.where(valid[:, None], uv, -1.0), valid


# --------------------------------------------------------------------- #
# bilinear patch sampling
# --------------------------------------------------------------------- #

def bilinear_gather(img, centers, size: int):
    """Gather [N, size, size] patches at float centers (x, y) with bilinear
    interpolation; edge-clamped."""
    h, w = img.shape
    half = (size - 1) / 2.0
    d = jnp.arange(size, dtype=jnp.float32) - half
    xs = centers[:, 0:1] + d[None, :]                 # [N, size]
    ys = centers[:, 1:2] + d[None, :]
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)                  # [N, size]
    fy = jnp.clip(ys - y0, 0.0, 1.0)

    # [N, size(y), size(x)]
    v00 = img[y0[:, :, None], x0[:, None, :]]
    v01 = img[y0[:, :, None], x0[:, None, :] + 1]
    v10 = img[y0[:, :, None] + 1, x0[:, None, :]]
    v11 = img[y0[:, :, None] + 1, x0[:, None, :] + 1]
    fx_b = fx[:, None, :]
    fy_b = fy[:, :, None]
    return ((1 - fy_b) * ((1 - fx_b) * v00 + fx_b * v01)
            + fy_b * ((1 - fx_b) * v10 + fx_b * v11))


# --------------------------------------------------------------------- #
# pyramidal LK
# --------------------------------------------------------------------- #

class FlowResult(NamedTuple):
    points: jnp.ndarray     # [N, 2] tracked positions in the next image
    valid: jnp.ndarray      # [N] bool — converged and stayed in bounds
    error: jnp.ndarray      # [N] mean |residual| over the window (cv err)


def lk_flow(prev_levels: List[jnp.ndarray], next_levels: List[jnp.ndarray],
            points, *, window: int = 21, iterations: int = 10,
            eps: float = 0.01) -> FlowResult:
    """Track ``points`` ([N, 2] (x, y) in level-0 coords of ``prev``) into
    ``next``.  ``prev_levels``/``next_levels`` are matching image pyramids
    (plain 2x-downsampled or the ORB 1.2x pyramid both work; levels are
    aligned by their shape ratio).
    """
    n_levels = len(prev_levels)
    h0, w0 = prev_levels[0].shape
    # Scale factors per level relative to level 0.
    scales = [prev_levels[l].shape[1] / w0 for l in range(n_levels)]
    v = jnp.zeros_like(points)          # displacement at current level

    for lvl in range(n_levels - 1, -1, -1):
        s = scales[lvl]
        prev_img = prev_levels[lvl]
        next_img = next_levels[lvl]
        p_lvl = points * s              # source positions at this level
        if lvl != n_levels - 1:
            v = v * (scales[lvl] / scales[lvl + 1])

        patch_prev = bilinear_gather(prev_img, p_lvl, window)
        # Spatial gradients of prev patch (central differences).
        gpx = bilinear_gather(prev_img, p_lvl + jnp.array([1.0, 0.0]), window)
        gmx = bilinear_gather(prev_img, p_lvl - jnp.array([1.0, 0.0]), window)
        gpy = bilinear_gather(prev_img, p_lvl + jnp.array([0.0, 1.0]), window)
        gmy = bilinear_gather(prev_img, p_lvl - jnp.array([0.0, 1.0]), window)
        ix = 0.5 * (gpx - gmx)
        iy = 0.5 * (gpy - gmy)
        gxx = jnp.sum(ix * ix, axis=(1, 2))
        gxy = jnp.sum(ix * iy, axis=(1, 2))
        gyy = jnp.sum(iy * iy, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        det_safe = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)

        def body(_, v):
            patch_next = bilinear_gather(next_img, p_lvl + v, window)
            di = patch_prev - patch_next
            bx = jnp.sum(di * ix, axis=(1, 2))
            by = jnp.sum(di * iy, axis=(1, 2))
            dvx = (gyy * bx - gxy * by) / det_safe
            dvy = (gxx * by - gxy * bx) / det_safe
            return v + jnp.stack([dvx, dvy], axis=-1)

        v = jax.lax.fori_loop(0, iterations, body, v)

    tracked = points + v
    h, w = next_levels[0].shape
    in_bounds = (tracked[:, 0] >= 0) & (tracked[:, 0] < w - 1) \
        & (tracked[:, 1] >= 0) & (tracked[:, 1] < h - 1)
    patch_next = bilinear_gather(next_levels[0], tracked, window)
    patch_prev0 = bilinear_gather(prev_levels[0], points, window)
    err = jnp.mean(jnp.abs(patch_prev0 - patch_next), axis=(1, 2))
    # cv status: small enough error and well-conditioned system.
    valid = in_bounds & jnp.isfinite(err)
    return FlowResult(points=tracked, valid=valid, error=err)


def build_flow_pyramid(img, n_levels: int = 4) -> List[jnp.ndarray]:
    """Standard 2x pyramid for LK (cv::buildOpticalFlowPyramid semantics)."""
    levels = [img]
    for _ in range(1, n_levels):
        prev = levels[-1]
        h, w = prev.shape
        levels.append(pyramid.resize_bilinear(prev, (h // 2, w // 2)))
    return levels
