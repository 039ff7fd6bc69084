"""FAST-9/16 corner detection as a dense, batched map operation.

TPU-native replacement for the reference's per-cell OpenCV FAST calls
(`ORBextractor::ComputeKeyPointsOctTree`, ORBextractor.cc:771-850): instead
of looping over 30-px cells on the host, we compute the corner-score map for
the whole level in one fused pass (16 shifted comparisons + arc reduction —
pure VPU work that XLA fuses into a few kernels), then do spatial selection
with :mod:`coebslam_tpu.ops.grid_select`.

Score definition matches OpenCV's FAST_9_16 corner score (the largest
threshold at which the pixel remains a corner), so NMS and top-k ranking
order candidates the same way the reference's extractor does.
"""
from __future__ import annotations

import jax.numpy as jnp

# Bresenham circle of radius 3, 16 points in circular order, as (dy, dx)
# (row, col) — the standard FAST-16 test set.
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LENGTH = 9  # FAST-9: at least 9 contiguous circle pixels


def _circle_stack(img):
    """[H, W] -> [16, H, W]: the circle-neighbor intensities per pixel.

    Borders use edge padding; border keypoints are masked out downstream by
    the edge-threshold margin anyway.
    """
    padded = jnp.pad(img, 3, mode="edge")
    h, w = img.shape
    return jnp.stack(
        [padded[3 + dy:3 + dy + h, 3 + dx:3 + dx + w]
         for (dy, dx) in CIRCLE_OFFSETS], axis=0)


def strength_map(img):
    """Dense FAST-9/16 corner-strength map (no threshold gate).

    For every arc start s, the weakest element of the 9-long arc determines
    the largest threshold at which that arc fires:
      bright arc strength_s = min_{j<9} diff[(s+j) % 16]
      dark   arc strength_s = min_{j<9} -diff[(s+j) % 16]
    Strength = max_s max(bright_s, dark_s); a pixel is a corner at threshold
    t iff strength > t.  This equals OpenCV's FAST corner score on corners
    and extends continuously below threshold — which makes it usable for
    sub-pixel interpolation around maxima.
    """
    circle = _circle_stack(img)            # [16, H, W]
    diff = circle - img[None]              # [16, H, W]
    diff_ext = jnp.concatenate([diff, diff[:ARC_LENGTH - 1]], axis=0)  # [24,H,W]
    bright_min = jnp.stack(
        [jnp.min(diff_ext[s:s + ARC_LENGTH], axis=0) for s in range(16)], axis=0)
    dark_min = jnp.stack(
        [jnp.min(-diff_ext[s:s + ARC_LENGTH], axis=0) for s in range(16)], axis=0)
    return jnp.maximum(jnp.max(bright_min, axis=0), jnp.max(dark_min, axis=0))


def fast_score_map(img, threshold: float):
    """Dense FAST-9/16 corner-score map.

    Args:
      img: [H, W] float32 grayscale in [0, 255].
      threshold: detection threshold t (e.g. 20 or 7; the COEB masked mode
        raises these to 30/10, ORBextractor.cc:775-784).

    Returns:
      score: [H, W] float32 — 0 where not a corner; otherwise the OpenCV
        corner score (max threshold keeping the pixel a corner).
    """
    strength = strength_map(img)
    score = jnp.where(strength > threshold, strength, 0.0)
    # The 3-px border cannot host a valid circle.
    h, w = img.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    valid = (row >= 3) & (row < h - 3) & (col >= 3) & (col < w - 3)
    return jnp.where(valid, score, 0.0)


def subpixel_refine(strength, yx):
    """Quadratic sub-pixel refinement of corner positions.

    Fits independent 1-D parabolas through the corner-strength values at
    (p-1, p, p+1) in x and y and returns fractional offsets in [-0.5, 0.5].
    Integer FAST corners snap coherently as the image shifts sub-pixel — a
    systematic whole-frame bias the reference inherits from OpenCV; this
    removes most of it at negligible cost.

    Args:
      strength: [H, W] ungated strength map of the level.
      yx: [N, 2] int32 corner coords.
    Returns: [N, 2] float32 (dy, dx) offsets.
    """
    h, w = strength.shape
    y = jnp.clip(yx[:, 0], 1, h - 2)
    x = jnp.clip(yx[:, 1], 1, w - 2)
    c = strength[y, x]
    lx = strength[y, x - 1]
    rx = strength[y, x + 1]
    uy = strength[y - 1, x]
    dy_ = strength[y + 1, x]

    def parab(lo, mid, hi):
        denom = lo - 2.0 * mid + hi
        off = jnp.where(jnp.abs(denom) > 1e-6,
                        0.5 * (lo - hi) / jnp.where(jnp.abs(denom) > 1e-6,
                                                    denom, 1.0),
                        0.0)
        return jnp.clip(off, -0.5, 0.5)

    return jnp.stack([parab(uy, c, dy_), parab(lx, c, rx)], axis=-1)


def nms_3x3(score):
    """3x3 non-maximum suppression: keep pixels that are the strict maximum
    of their 8-neighborhood (OpenCV FAST nonmaxSuppression semantics)."""
    padded = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    h, w = score.shape
    neighborhood = jnp.stack(
        [padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)
         if not (dy == 0 and dx == 0)], axis=0)
    keep = score > jnp.max(neighborhood, axis=0)
    return jnp.where(keep, score, 0.0)
