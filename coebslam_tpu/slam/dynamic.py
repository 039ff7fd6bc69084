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


# --------------------------------------------------------------------- #
# In-graph dynamic front-end (production path).
#
# TPU-first redesign of the same pipeline: instead of LK flow on Harris
# corners (a separate device program + host mask round-trip), the motion
# check rides the ORB descriptors the frame pipeline computes anyway —
# match the previous frame's keypoints against the current ones (one MXU
# Hamming matmul), fit F by vmapped RANSAC, and epipolar outliers form
# T_M.  Classification, blur gating, sticky masking and keypoint culling
# all happen inside the SAME fused per-frame program, so the dynamic
# path adds zero dispatches and zero host syncs.  The reference-parity
# LK path (`dynamic_frontend` above) remains for cfg.dynamic.motion_check
# == "flow" and for the yolo_v5_blur BlurGate.
# --------------------------------------------------------------------- #


class DynState(NamedTuple):
    """Device-resident dynamic-front-end state chained across frames."""
    prev_uv: jnp.ndarray       # [N, 2] previous frame keypoints
    prev_desc: jnp.ndarray     # [N, 32] packed BRIEF
    prev_valid: jnp.ndarray    # [N] bool
    sticky: jnp.ndarray        # [H, W] int32 — frames a pixel stays masked
    area_flag: jnp.ndarray     # scalar bool — fed to NEXT frame's extractor


class DynInfo(NamedTuple):
    """Per-frame diagnostics (device; fetch only when needed)."""
    box_dynamic: jnp.ndarray   # [B] bool
    box_blurred: jnp.ndarray   # [B] bool
    n_outliers: jnp.ndarray    # int32
    n_culled: jnp.ndarray      # int32 — keypoints removed this frame


def init_dyn_state(cfg: SystemConfig) -> DynState:
    N = cfg.orb.max_keypoints
    H, W = cfg.camera.height, cfg.camera.width
    return DynState(
        prev_uv=jnp.full((N, 2), -1.0, jnp.float32),
        prev_desc=jnp.zeros((N, 32), jnp.uint8),
        prev_valid=jnp.zeros(N, bool),
        sticky=jnp.zeros((H, W), jnp.int32),
        area_flag=jnp.bool_(False))


def dynamic_step(fd, gray, state: DynState, boxes, key,
                 cfg: SystemConfig):
    """In-graph dynamic check + keypoint culling.  Jittable.

    Args:
      fd: FrameData (extraction already done, pre-cull).
      gray: [H, W] float32 current frame.
      state: previous frame's DynState.
      boxes: [B, 4] padded detector boxes (xmin<0 = absent), device.
    Returns (fd_culled, spawn_ok [N] bool, new_state, DynInfo).
    """
    from ..ops import brief, matching

    dyn = cfg.dynamic
    h, w = gray.shape
    feats = fd.feats

    # 1. Correspondences: previous keypoints -> current keypoints.
    cur_sd = feats.signed_desc()
    prev_sd = brief.to_signed(brief.unpack_bits(state.prev_desc))
    d = matching.hamming_matrix(prev_sd, cur_sd)
    du = jnp.abs(state.prev_uv[:, None, 0] - feats.uv[None, :, 0])
    dv = jnp.abs(state.prev_uv[:, None, 1] - feats.uv[None, :, 1])
    r = dyn.match_radius
    d = d + jnp.where((du <= r) & (dv <= r), 0.0, matching.BIG)
    res = matching.match(d, max_distance=cfg.matcher.th_high,
                         ratio=cfg.matcher.nn_ratio_tracking, mutual=True,
                         row_valid=state.prev_valid, col_valid=feats.valid)
    p_prev = state.prev_uv
    p_cur = feats.uv[jnp.clip(res.idx, 0)]
    good = res.valid

    # 2. F-RANSAC -> epipolar outliers (T_M); same gates as the LK path.
    fres = fundamental.find_fundamental_ransac(
        p_prev, p_cur, good, key,
        n_hypotheses=dyn.f_ransac_iters, threshold=dyn.f_ransac_threshold)
    dist = fundamental.epipolar_distance(fres.F, p_prev, p_cur)
    # Guard: with very few matches (startup, heavy blur) F is meaningless —
    # require a minimally constrained fit before declaring outliers.
    enough = good.sum() >= 24
    t_m = good & (dist > dyn.epipolar_threshold) & enough

    # 3. Blur gate + two-tier classification.
    scores = blur_ops.box_blur_scores(gray, boxes, metric="laplacian")
    box_blurred = scores < dyn.blur_threshold
    box_dynamic = classify_boxes(p_cur, t_m, boxes, box_blurred, cfg)

    # 4. Sticky mask update: dynamic boxes mask for sticky_frames frames.
    masks = blur_ops._box_mask(h, w, boxes)
    dyn_mask = jnp.any(masks & box_dynamic[:, None, None], axis=0)
    sticky = jnp.where(dyn_mask, jnp.int32(max(dyn.sticky_frames, 1)),
                       jnp.maximum(state.sticky - 1, 0))
    active = sticky > 0
    area_flag = active.sum() > dyn.masked_area_limit * (h * w) / (480.0 * 640.0)

    # 5. Cull keypoints inside the active mask (post-distribution culling,
    # the reference's default mode — CheckMovingKeyPoints_finall,
    # ORBextractor.cc:1371-1408).  Pre-selection culling and the raised
    # thresholds of area mode are applied by the NEXT frame's extractor via
    # state.area_flag / sticky (one-frame lag, the same staleness the
    # reference tolerates from ApproximateTime box sync).
    u = jnp.clip(jnp.round(feats.uv[:, 0]).astype(jnp.int32), 0, w - 1)
    v = jnp.clip(jnp.round(feats.uv[:, 1]).astype(jnp.int32), 0, h - 1)
    hit = active[v, u] & feats.valid
    new_valid = feats.valid & ~hit
    fd_culled = fd._replace(feats=feats._replace(
        valid=new_valid,
        uv=jnp.where(new_valid[:, None], feats.uv, -1.0)))

    # 6. Spawn gating: never CREATE landmarks inside ANY detector box
    # (config extension dyn.spawn_in_boxes=False).
    present = boxes[:, 0] >= 0
    in_box = ((feats.uv[:, None, 0] >= boxes[None, :, 0])
              & (feats.uv[:, None, 0] <= boxes[None, :, 2])
              & (feats.uv[:, None, 1] >= boxes[None, :, 1])
              & (feats.uv[:, None, 1] <= boxes[None, :, 3])
              & present[None, :])
    spawn_ok = ~jnp.any(in_box, axis=1) if not dyn.spawn_in_boxes \
        else jnp.ones(feats.uv.shape[0], bool)

    # 7. Next-frame state: the PRE-cull feature set (movers must stay
    # matchable or the epipolar evidence disappears after one masked frame).
    new_state = DynState(prev_uv=feats.uv, prev_desc=feats.desc,
                         prev_valid=feats.valid, sticky=sticky,
                         area_flag=area_flag)
    info = DynInfo(box_dynamic=box_dynamic, box_blurred=box_blurred,
                   n_outliers=t_m.sum().astype(jnp.int32),
                   n_culled=hit.sum().astype(jnp.int32))
    return fd_culled, spawn_ok, new_state, info


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
