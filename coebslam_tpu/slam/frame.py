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
    feats = extractor.extract(gray, orb, n_features=n_features,
                              dynamic_mask=dynamic_mask, area_mode=area_mode)
    u = jnp.clip(jnp.round(feats.uv[:, 0]).astype(jnp.int32), 0, cam.width - 1)
    v = jnp.clip(jnp.round(feats.uv[:, 1]).astype(jnp.int32), 0, cam.height - 1)
    d = depth_img[v, u]
    has_depth = feats.valid & (d > 0.0)
    d = jnp.where(has_depth, d, 0.0)
    ur = jnp.where(has_depth, feats.uv[:, 0] - cam.bf / jnp.where(d > 0, d, 1.0),
                   -1.0)
    inv_s2 = level_inv_sigma2(feats.level, orb.scale_factor)
    obs = jnp.concatenate([feats.uv, ur[:, None]], axis=-1)
    return FrameData(feats=feats, depth=d, ur=ur, inv_sigma2=inv_s2, obs=obs)
