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
    n_levels = cfg.n_levels
    H, W = img.shape
    cap_max = max(caps)

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

    # ---- one lax.scan over pyramid levels on a shared [H, W] canvas ----
    # A Python loop over levels compiles a separate copy of every kernel
    # per level shape (~28 MB of TPU code for 8 levels); executable size
    # is a first-order cost on this backend (oversized programs are
    # re-shipped to the device each dispatch).  Each level is placed in a
    # zero-padded level-0-sized canvas and all per-level work runs as ONE
    # compiled instance with the true extent as traced scalars.  Numerics
    # are preserved exactly: the FAST kernel zero-pads + gates by true
    # extent anyway; selection ranks the same nonzero-score candidates;
    # blur/patch sampling reads a reflect-filled canvas that matches the
    # standalone reflect-101 boundary handling, and the BRIEF pattern
    # radius (18.4 px) never crosses the edge_threshold (19 px) gate.
    canv = jnp.zeros((n_levels, H, W), jnp.float32)
    for l, li in enumerate(levels):
        canv = canv.at[l, :li.shape[0], :li.shape[1]].set(li)
    hs = jnp.asarray([l.shape[0] for l in levels], jnp.int32)
    ws = jnp.asarray([l.shape[1] for l in levels], jnp.int32)
    scales = jnp.asarray([cfg.scale_factor ** l for l in range(n_levels)],
                         jnp.float32)
    caps_arr = jnp.asarray(caps, jnp.int32)

    m = cfg.edge_threshold
    row0 = jnp.arange(H)[:, None]
    col0 = jnp.arange(W)[None, :]

    def per_level(_, xs):
        canvas, h, w, scale, cap_l, quota = xs
        if use_pallas:
            strength, score = fast_pallas.strength_and_score(
                canvas, thr, true_h=h, true_w=w,
                interpret=pallas_interpret)
        else:
            strength = fast.strength_map(canvas)
            border = ((row0 >= 3) & (row0 < h - 3)
                      & (col0 >= 3) & (col0 < w - 3))
            score = jnp.where(border & (strength > thr), strength, 0.0)
            score = fast.nms_3x3(score)

        # Edge margin (reference EDGE_THRESHOLD=19 border), traced extent.
        inside = (row0 >= m) & (row0 < h - m) & (col0 >= m) & (col0 < w - m)
        score = jnp.where(inside, score, 0.0)

        lvl_mask = None
        if dynamic_mask is not None:
            # Nearest-sample the level-0 mask at this level's scale.
            sy = jnp.clip(((row0[:, 0] + 0.5) * H
                           / jnp.maximum(h, 1)).astype(jnp.int32), 0, H - 1)
            sx = jnp.clip(((col0[0] + 0.5) * W
                           / jnp.maximum(w, 1)).astype(jnp.int32), 0, W - 1)
            lvl_mask = dynamic_mask[sy[:, None], sx[None, :]]
            # Area mode culls BEFORE selection so the budget refills from
            # static regions (ORBextractor.cc:854-858).
            score = jnp.where(area_mode & lvl_mask, 0.0, score)

        yx, sc, valid = grid_select.select_grid_topk(
            score, cfg.cell_size, k_per_cell=8, n_out=cap_max)

        # Per-level capacity + runtime quota: selections are rank-ordered,
        # so masking the tail implements both without reshaping.
        slot = jnp.arange(cap_max)
        valid = valid & (slot < cap_l) & (slot < quota)

        if lvl_mask is not None:
            # Default mode culls AFTER selection (budget lost —
            # CheckMovingKeyPoints_finall, ORBextractor.cc:1371-1408).
            hit = lvl_mask[yx[:, 0], yx[:, 1]]
            valid = jnp.where(area_mode, valid, valid & ~hit)

        # Reflect-101-fill the canvas beyond the true extent so blur and
        # patch sampling see the standalone per-level boundary handling.
        ry = jnp.where(row0[:, 0] < h, row0[:, 0],
                       jnp.maximum(2 * h - 2 - row0[:, 0], 0))
        rx = jnp.where(col0[0] < w, col0[0],
                       jnp.maximum(2 * w - 2 - col0[0], 0))
        refl = canvas[jnp.clip(ry, 0, H - 1)[:, None],
                      jnp.clip(rx, 0, W - 1)[None, :]]
        blurred = pyramid.gaussian_blur(refl)
        pt = patches.gather_patches(blurred, yx)
        ang = patches.orientations(pt)

        # Sub-pixel corner positions (removes the coherent integer-snap bias
        # the reference inherits from OpenCV FAST), then map to level-0
        # coordinates under the half-pixel-center resize convention:
        # x0 = (x_l + 0.5) * scale - 0.5.  (Plain x_l * scale introduces a
        # systematic +0.5*(scale-1) px bias at upper levels.)
        off = fast.subpixel_refine(strength, yx)
        uv = jnp.stack(
            [(yx[:, 1].astype(jnp.float32) + off[:, 1] + 0.5) * scale - 0.5,
             (yx[:, 0].astype(jnp.float32) + off[:, 0] + 0.5) * scale - 0.5],
            axis=-1)
        return 0, (uv, sc, ang, valid, pt)

    _, (uv_l, sc_l, ang_l, val_l, pt_l) = jax.lax.scan(
        per_level, 0, (canv, hs, ws, scales, caps_arr, quotas))

    # Static compaction [n_levels, cap_max] -> [max_keypoints]: output slot
    # j holds level level_of[j], slot slot_of[j] — the same contiguous
    # per-level layout the per-level concatenate produced.
    level_of = jnp.asarray(
        [l for l in range(n_levels) for _ in range(caps[l])], jnp.int32)
    slot_of = jnp.asarray(
        [s for l in range(n_levels) for s in range(caps[l])], jnp.int32)

    uv = uv_l[level_of, slot_of]
    scores = sc_l[level_of, slot_of]
    angles = ang_l[level_of, slot_of]
    valids = val_l[level_of, slot_of]
    patch_tensor = pt_l[level_of, slot_of]

    bits = brief.describe(patch_tensor, angles)
    desc = brief.pack_bits(bits)

    uv = jnp.where(valids[:, None], uv, -1.0)
    return Features(uv=uv, level=level_of,
                    score=jnp.where(valids, scores, 0.0),
                    angle=jnp.where(valids, angles, 0.0),
                    desc=desc, valid=valids)
