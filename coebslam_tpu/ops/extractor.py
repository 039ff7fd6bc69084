"""ORB feature extraction: the full jittable front-end pipeline.

TPU-native re-design of `ORBextractor::operator()` (ORBextractor.cc:1088-1342)
including the COEB dynamic-masking behaviors:

* 8-level pyramid -> dense FAST score maps -> per-cell top-k selection
  (replaces per-cell OpenCV FAST + quad-tree distribution),
* geometric per-level budgets, runtime-scalable for the adaptive feature
  budget (Tracking.cc:423-466) — the budget is a traced scalar masking
  selection quotas, NOT an extractor reallocation,
* dynamic-region masking with the reference's two modes
  (ORBextractor.cc:854-870, 1203-1207): post-selection culling by default;
  when the masked area exceeds the limit ("area mode"), pre-selection
  culling + raised FAST thresholds + 0.7x budget,
* Gaussian blur + intensity-centroid orientation + steered BRIEF.

Everything is fixed-shape: the output holds ``cfg.orb.max_keypoints`` slots
with a validity mask.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import OrbConfig, DynamicConfig
from . import brief, fast, fast_pallas, grid_select, patches, pyramid


class Features(NamedTuple):
    """Fixed-capacity keypoint set for one frame (the FrameState feature
    block of SURVEY §7.1)."""

    uv: jnp.ndarray           # [N, 2] float32 — (u=x, v=y) at level-0 scale
    level: jnp.ndarray        # [N] int32 pyramid level
    score: jnp.ndarray        # [N] float32 FAST corner score
    angle: jnp.ndarray        # [N] float32 orientation (radians)
    desc: jnp.ndarray         # [N, 32] uint8 packed BRIEF-256
    valid: jnp.ndarray        # [N] bool

    @property
    def n(self) -> int:
        return self.uv.shape[0]

    def signed_desc(self):
        return brief.to_signed(brief.unpack_bits(self.desc))


def level_budgets(cfg: OrbConfig) -> List[int]:
    """Static per-level slot capacities summing to max_keypoints.

    Geometric split with ratio 1/scale_factor — the same distribution the
    reference computes in its constructor (ORBextractor.cc:442-453).
    """
    f = 1.0 / cfg.scale_factor
    total = cfg.max_keypoints
    share = (1.0 - f) / (1.0 - f ** cfg.n_levels)
    caps = [int(total * share * (f ** l)) for l in range(cfg.n_levels)]
    caps[0] += total - sum(caps)
    return caps


def _runtime_quotas(cfg: OrbConfig, n_features):
    """Traced per-level quotas for a runtime budget scalar (same geometric
    split, computed on-device so the adaptive budget needs no recompile)."""
    f = 1.0 / cfg.scale_factor
    share = (1.0 - f) / (1.0 - f ** cfg.n_levels)
    fl = jnp.asarray([share * (f ** l) for l in range(cfg.n_levels)],
                     dtype=jnp.float32)
    return jnp.ceil(fl * n_features).astype(jnp.int32)


def extract(
    img,
    cfg: OrbConfig,
    *,
    n_features=None,
    dynamic_mask=None,
    area_mode=None,
) -> Features:
    """Run the full extraction pipeline on one grayscale frame.

    Args:
      img: [H, W] float32 grayscale in [0, 255].
      cfg: static extraction config.
      n_features: traced scalar runtime budget (defaults to cfg.n_features);
        the COEB adaptive controller feeds values in [1000, 2000].
      dynamic_mask: optional [H, W] bool, True where keypoints are forbidden
        (dynamic-object boxes + epipolar outlier regions — Frame/extractor
        masking, ORBextractor.cc:1137-1184).
      area_mode: optional traced bool scalar — the COEB ``area_flag``
        (masked area > limit): pre-selection culling, raised thresholds,
        0.7x budget (ORBextractor.cc:771-784, 854-870).

    Returns: Features with cfg.max_keypoints fixed slots.
    """
    if n_features is None:
        n_features = jnp.int32(cfg.n_features)
    if area_mode is None:
        area_mode = jnp.bool_(False)

    budget = jnp.where(
        area_mode,
        (n_features * cfg.masked_budget_scale).astype(jnp.int32),
        n_features)
    quotas = _runtime_quotas(cfg, budget)

    levels = pyramid.build_pyramid(img, cfg)
    caps = level_budgets(cfg)

    all_uv, all_level, all_score, all_angle, all_valid = [], [], [], [], []
    all_patches = []
    # Traced FAST threshold: the strength map is threshold-independent, so
    # the COEB 20/7 -> 30/10 raise (ORBextractor.cc:775-784) is just a
    # different gate on the same map — no recompile, no double work.  We gate
    # at the *min* threshold (the reference's per-cell fallback); scoring +
    # round-robin ranking then prefers strong corners exactly as "try high
    # first, fall back to low" does per cell.
    thr = jnp.where(area_mode,
                    jnp.float32(cfg.fast_threshold_min_masked),
                    jnp.float32(cfg.fast_threshold_min))

    use_pallas = cfg.use_pallas_fast
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # Forcing the Pallas path on a non-TPU backend runs the interpreter
    # (slow; for tests only).
    pallas_interpret = use_pallas and jax.default_backend() != "tpu"

    for lvl, lvl_img in enumerate(levels):
        h, w = lvl_img.shape
        if use_pallas:
            # Fused single-pass kernel: circle diffs + arc reduction +
            # border/threshold gate + 3x3 NMS, one HBM round-trip.
            strength, score = fast_pallas.strength_and_score(
                lvl_img, thr, interpret=pallas_interpret)
        else:
            strength = fast.strength_map(lvl_img)
            row = jnp.arange(h)[:, None]
            col = jnp.arange(w)[None, :]
            border = (row >= 3) & (row < h - 3) & (col >= 3) & (col < w - 3)
            score = jnp.where(border & (strength > thr), strength, 0.0)
            score = fast.nms_3x3(score)

        # Edge margin (reference EDGE_THRESHOLD=19 border).
        m = cfg.edge_threshold
        row = jnp.arange(h)[:, None]
        col = jnp.arange(w)[None, :]
        inside = (row >= m) & (row < h - m) & (col >= m) & (col < w - m)
        score = jnp.where(inside, score, 0.0)

        lvl_mask = None
        if dynamic_mask is not None:
            lvl_mask = dynamic_mask if lvl == 0 else jax.image.resize(
                dynamic_mask.astype(jnp.float32), (h, w), "nearest") > 0.5
            # Area mode culls BEFORE selection so the budget refills from
            # static regions (ORBextractor.cc:854-858).
            score_pre = jnp.where(lvl_mask, 0.0, score)
            score = jnp.where(area_mode, score_pre, score)

        yx, sc, valid = grid_select.select_grid_topk(
            score, cfg.cell_size, k_per_cell=8, n_out=caps[lvl])

        # Runtime quota: selections are rank-ordered, so masking the tail
        # implements the adaptive budget without reshaping.
        slot = jnp.arange(caps[lvl])
        valid = valid & (slot < quotas[lvl])

        if lvl_mask is not None:
            # Default mode culls AFTER selection (budget lost —
            # CheckMovingKeyPoints_finall, ORBextractor.cc:1371-1408).
            hit = lvl_mask[yx[:, 0], yx[:, 1]]
            valid_post = valid & ~hit
            valid = jnp.where(area_mode, valid, valid_post)

        blurred = pyramid.gaussian_blur(lvl_img)
        pt = patches.gather_patches(blurred, yx)
        ang = patches.orientations(pt)

        # Sub-pixel corner positions (removes the coherent integer-snap bias
        # the reference inherits from OpenCV FAST), then map to level-0
        # coordinates under the half-pixel-center resize convention:
        # x0 = (x_l + 0.5) * scale - 0.5.  (Plain x_l * scale introduces a
        # systematic +0.5*(scale-1) px bias at upper levels.)
        off = fast.subpixel_refine(strength, yx)
        scale = cfg.scale_factor ** lvl
        uv = jnp.stack(
            [(yx[:, 1].astype(jnp.float32) + off[:, 1] + 0.5) * scale - 0.5,
             (yx[:, 0].astype(jnp.float32) + off[:, 0] + 0.5) * scale - 0.5],
            axis=-1)

        all_uv.append(uv)
        all_level.append(jnp.full((caps[lvl],), lvl, jnp.int32))
        all_score.append(sc)
        all_angle.append(ang)
        all_valid.append(valid)
        all_patches.append(pt)

    uv = jnp.concatenate(all_uv)
    lvls = jnp.concatenate(all_level)
    scores = jnp.concatenate(all_score)
    angles = jnp.concatenate(all_angle)
    valids = jnp.concatenate(all_valid)
    patch_tensor = jnp.concatenate(all_patches)

    bits = brief.describe(patch_tensor, angles)
    desc = brief.pack_bits(bits)

    uv = jnp.where(valids[:, None], uv, -1.0)
    return Features(uv=uv, level=lvls,
                    score=jnp.where(valids, scores, 0.0),
                    angle=jnp.where(valids, angles, 0.0),
                    desc=desc, valid=valids)
