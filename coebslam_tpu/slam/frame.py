"""Per-frame front-end: extraction + RGB-D depth association.

The TPU-native Frame (reference `Frame.cc` RGB-D constructor semantics,
Frame.cc:133-249, minus the dynamic pipeline which lives in
slam/dynamic.py): one jittable function turns (gray, depth) images into a
fixed-shape FrameData pytree — features, per-keypoint depth, virtual right
coordinate (ComputeStereoFromRGBD, Frame.cc:820-842) and per-level
information weights.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..config import CameraConfig, OrbConfig
from ..ops import extractor
from ..ops.extractor import Features


class FrameData(NamedTuple):
    feats: Features
    depth: jnp.ndarray        # [N] float32 metres; 0 where unknown
    ur: jnp.ndarray           # [N] float32 virtual right u; -1 where no depth
    inv_sigma2: jnp.ndarray   # [N] float32 per-observation information
    obs: jnp.ndarray          # [N, 3] (u, v, ur) observation vector

    @property
    def n(self):
        return self.depth.shape[0]


def level_inv_sigma2(levels, scale_factor: float):
    """Reference mvInvLevelSigma2: sigma^2 = (scale^level)^2, weight is its
    inverse (Frame.h / ORBextractor scale tables)."""
    sigma2 = (scale_factor ** levels.astype(jnp.float32)) ** 2
    return 1.0 / sigma2


def match_stereo(feats_l: Features, feats_r: Features, cam: CameraConfig,
                 orb: OrbConfig, row_tolerance: float = 2.0):
    """Rectified stereo matching: left keypoints against right keypoints in
    the same image row (reference Frame::ComputeStereoMatches,
    Frame.cc:644-818 — row bands, level compatibility, Hamming best,
    disparity in (0, fx*baseline_max)).

    Returns (depth [N], ur [N]) for the left features; -1/0 where unmatched.
    """
    from ..ops import matching as matching_ops

    d = matching_ops.hamming_matrix(feats_l.signed_desc(),
                                    feats_r.signed_desc())
    # Row band scaled by the left keypoint's level (reference uses r = 2
    # scaled levels around the row).
    scale_l = orb.scale_factor ** feats_l.level.astype(jnp.float32)
    dv = jnp.abs(feats_l.uv[:, None, 1] - feats_r.uv[None, :, 1])
    d = d + jnp.where(dv <= row_tolerance * scale_l[:, None], 0.0, 1e9)
    # Disparity window: minD=0 (at infinity), maxD = fx (disparity of a
    # point at one baseline distance).
    disp = feats_l.uv[:, None, 0] - feats_r.uv[None, :, 0]
    d = d + jnp.where((disp > 0.1) & (disp < cam.fx), 0.0, 1e9)
    # Level compatibility +-1.
    dl = jnp.abs(feats_l.level[:, None] - feats_r.level[None, :])
    d = d + jnp.where(dl <= 1, 0.0, 1e9)

    res = matching_ops.match(d, max_distance=100.0, ratio=0.9, mutual=True,
                             row_valid=feats_l.valid, col_valid=feats_r.valid)
    matched_disp = disp[jnp.arange(disp.shape[0]), jnp.clip(res.idx, 0)]
    ok = res.valid & (matched_disp > 0.1)
    depth = jnp.where(ok, cam.bf / jnp.maximum(matched_disp, 0.1), 0.0)
    ur = jnp.where(ok, feats_l.uv[:, 0] - matched_disp, -1.0)
    return depth, ur


def process_stereo(gray_left, gray_right, cam: CameraConfig, orb: OrbConfig,
                   *, n_features=None, dynamic_mask=None,
                   area_mode=None) -> FrameData:
    """Stereo frame constructor: extract on both images, match along rows,
    synthesize depth — restores the stereo path the fork disabled
    (SURVEY §2.5: extraction threads commented out at Frame.cc:92-95).

    ``dynamic_mask``/``area_mode`` apply to the LEFT extraction (the COEB
    gate operates on the reference camera; right keypoints only serve the
    row-band disparity search)."""
    feats_l = extractor.extract(gray_left, orb, n_features=n_features,
                                dynamic_mask=dynamic_mask,
                                area_mode=area_mode)
    feats_r = extractor.extract(gray_right, orb, n_features=n_features)
    depth, ur = match_stereo(feats_l, feats_r, cam, orb)
    inv_s2 = level_inv_sigma2(feats_l.level, orb.scale_factor)
    obs = jnp.concatenate([feats_l.uv, ur[:, None]], axis=-1)
    return FrameData(feats=feats_l, depth=depth, ur=ur, inv_sigma2=inv_s2,
                     obs=obs)


def process_rgbd(
    gray,
    depth_img,
    cam: CameraConfig,
    orb: OrbConfig,
    *,
    n_features=None,
    dynamic_mask=None,
    area_mode=None,
) -> FrameData:
    """Extract features and associate depth (the RGB-D Frame constructor).

    Args:
      gray: [H, W] float32 in [0, 255].
      depth_img: [H, W] float32 metres (already divided by DepthMapFactor).
    """
    from ..geometry import camera as cam_ops

    feats = extractor.extract(gray, orb, n_features=n_features,
                              dynamic_mask=dynamic_mask, area_mode=area_mode)
    # Depth lookup at the RAW pixel position (the depth map is registered to
    # the distorted image), geometry with UNDISTORTED coordinates — the
    # reference keeps mvKeys for image indexing and mvKeysUn for everything
    # geometric (Frame::UndistortKeyPoints, Frame.cc:579; lookup at :820).
    u = jnp.clip(jnp.round(feats.uv[:, 0]).astype(jnp.int32), 0, cam.width - 1)
    v = jnp.clip(jnp.round(feats.uv[:, 1]).astype(jnp.int32), 0, cam.height - 1)
    d = depth_img[v, u]
    uv_un = cam_ops.undistort_points(cam, feats.uv)   # identity when k=p=0
    feats = feats._replace(uv=jnp.where(feats.valid[:, None], uv_un, -1.0))
    has_depth = feats.valid & (d > 0.0)
    d = jnp.where(has_depth, d, 0.0)
    ur = jnp.where(has_depth, feats.uv[:, 0] - cam.bf / jnp.where(d > 0, d, 1.0),
                   -1.0)
    inv_s2 = level_inv_sigma2(feats.level, orb.scale_factor)
    obs = jnp.concatenate([feats.uv, ur[:, None]], axis=-1)
    return FrameData(feats=feats, depth=d, ur=ur, inv_sigma2=inv_s2, obs=obs)
