"""COEB dynamic-scene front-end: motion check + blur gate + box classifier.

The jittable re-design of the fork's signature pipeline:

  1. `ProcessMovingObject` (Frame.cc:311-393): Harris corners on the previous
     frame -> pyramidal LK into the current frame -> neighborhood-difference
     and border filters -> fundamental-matrix RANSAC -> epipolar outliers
     form the dynamic point set T_M.
  2. `detect_laplacian` blur gate per detector box (Frame.cc:171-202,
     threshold 4.2).
  3. Two-tier box classification (ORBextractor.cc:1116-1207):
     Tier 1 — T_M density: count(T_M in box) * 10000 > box area  => dynamic.
     Tier 2 — blurred box with >= 1 T_M outlier                  => dynamic.
     Masked area > limit => area_flag (raised FAST thresholds, 0.7x budget,
     pre-selection culling — handled by ops/extractor.py).

Output: the dynamic mask image + area flag consumed by the extractor, all
fixed-shape (boxes padded to cfg.dynamic.max_boxes).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import blur as blur_ops
from ..ops import fundamental, lk_flow


class DynamicResult(NamedTuple):
    mask: jnp.ndarray          # [H, W] bool — True where keypoints forbidden
    area_flag: jnp.ndarray     # scalar bool — masked area over limit
    box_dynamic: jnp.ndarray   # [B] bool — per-box classification
    box_blurred: jnp.ndarray   # [B] bool — blur gate result
    outliers: jnp.ndarray      # [N, 2] epipolar-outlier points (T_M)
    outlier_valid: jnp.ndarray # [N] bool
    n_outliers: jnp.ndarray    # int32


def moving_object_check(prev_gray, gray, key, cfg: SystemConfig):
    """Steps of ProcessMovingObject: corners -> LK -> filters -> F-RANSAC.

    Returns (T_M points [N, 2], valid [N]) in current-frame pixel coords.
    """
    dyn = cfg.dynamic
    h, w = gray.shape

    pts, pts_valid = lk_flow.good_features(
        prev_gray, dyn.n_flow_points, quality=0.01, min_distance=8,
        use_harris=True)

    prev_pyr = lk_flow.build_flow_pyramid(prev_gray)
    next_pyr = lk_flow.build_flow_pyramid(gray)
    flow = lk_flow.lk_flow(prev_pyr, next_pyr, pts)

    # Border margin (Frame.cc:341-347, limit_edge_corner = 5) and the 3x3
    # neighborhood absolute-difference filter (Frame.cc:349-353, sum > 2120
    # rejects the correspondence).
    m = float(dyn.flow_edge_margin)
    in_border = (
        (pts[:, 0] >= m) & (pts[:, 0] < w - m)
        & (pts[:, 1] >= m) & (pts[:, 1] < h - m)
        & (flow.points[:, 0] >= m) & (flow.points[:, 0] < w - m)
        & (flow.points[:, 1] >= m) & (flow.points[:, 1] < h - m))
    patch_prev = lk_flow.bilinear_gather(prev_gray, pts, 3)
    patch_next = lk_flow.bilinear_gather(gray, flow.points, 3)
    diff_sum = jnp.sum(jnp.abs(patch_prev - patch_next), axis=(1, 2))
    good = pts_valid & flow.valid & in_border \
        & (diff_sum <= dyn.flow_diff_threshold)

    fres = fundamental.find_fundamental_ransac(
        pts, flow.points, good, key,
        n_hypotheses=dyn.f_ransac_iters, threshold=dyn.f_ransac_threshold)

    # Dynamic outliers: good correspondences whose epipolar distance exceeds
    # the threshold (Frame.cc:372-385 builds T_M from dist > 1 px).
    d = fundamental.epipolar_distance(fres.F, pts, flow.points)
    t_m_valid = good & (d > dyn.epipolar_threshold)
    return flow.points, t_m_valid


def classify_boxes(outliers, outlier_valid, boxes, box_blurred,
                   cfg: SystemConfig):
    """Two-tier dynamic classification (ORBextractor.cc:1137-1184).

    Args:
      boxes: [B, 4] (xmin, ymin, xmax, ymax); xmin < 0 = absent.
    Returns [B] bool dynamic flags.
    """
    dyn = cfg.dynamic
    x, y = outliers[:, 0], outliers[:, 1]
    in_box = ((x[None, :] >= boxes[:, 0:1]) & (x[None, :] <= boxes[:, 2:3])
              & (y[None, :] >= boxes[:, 1:2]) & (y[None, :] <= boxes[:, 3:4]))
    counts = (in_box & outlier_valid[None, :]).sum(-1)     # [B]
    area = jnp.maximum((boxes[:, 2] - boxes[:, 0])
                       * (boxes[:, 3] - boxes[:, 1]), 1.0)
    present = boxes[:, 0] >= 0.0
    tier1 = counts.astype(jnp.float32) * dyn.box_density_scale > area
    tier2 = box_blurred & (counts >= 1)
    return present & (tier1 | tier2)


def dynamic_frontend(prev_gray, gray, boxes, key,
                     cfg: SystemConfig) -> DynamicResult:
    """Full per-frame dynamic pipeline.  Jittable; boxes padded [B, 4]."""
    outliers, outlier_valid = moving_object_check(prev_gray, gray, key, cfg)

    scores = blur_ops.box_blur_scores(gray, boxes, metric="laplacian")
    box_blurred = scores < cfg.dynamic.blur_threshold

    box_dynamic = classify_boxes(outliers, outlier_valid, boxes, box_blurred,
                                 cfg)

    h, w = gray.shape
    masks = blur_ops._box_mask(h, w, boxes)
    mask = jnp.any(masks & box_dynamic[:, None, None], axis=0)
    area_flag = mask.sum() > cfg.dynamic.masked_area_limit \
        * (h * w) / (480.0 * 640.0)    # limit scales with resolution
    return DynamicResult(mask=mask, area_flag=area_flag,
                         box_dynamic=box_dynamic, box_blurred=box_blurred,
                         outliers=outliers, outlier_valid=outlier_valid,
                         n_outliers=outlier_valid.sum().astype(jnp.int32))
