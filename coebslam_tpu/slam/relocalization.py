"""Relocalization: BoW retrieval + alignment RANSAC + pose refinement.

Replaces `Tracking::Relocalization` (Tracking.cc:1417-1580): candidate
keyframes from the inverted file, descriptor matching against each
candidate's map points (nn-ratio 0.75, >= 15 matches to attempt), then a
batched RANSAC pose solve, refined by the standard robust pose GN,
accepted at >= 50 inliers (Tracking.cc:1556).

Two RANSAC kernels, chosen by the frame's depth coverage:

* RGB-D: 3-point Horn alignment on back-projections scored by
  reprojection — better conditioned than EPnP when depth exists.
* depth-free (monocular, or sparse-depth RGB-D): batched EPnP
  (ops/pnp.py), the reference's actual solver (PnPsolver.cc:67-341).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import camera as cam_ops
from ..geometry.se3 import SE3
from ..optim import pose_gn
from ..ops import brief, matching, pnp, procrustes
from .frame import FrameData
from .keyframe_db import KeyFrameDatabase
from .map import MapArena


class RelocResult(NamedTuple):
    ok: bool
    R: Optional[np.ndarray]
    t: Optional[np.ndarray]
    point_ids: Optional[np.ndarray]    # per-slot map point ids (-1 none)
    n_inliers: int


class Relocalizer:
    def __init__(self, cfg: SystemConfig, arena: MapArena,
                 kf_db: KeyFrameDatabase):
        self.cfg = cfg
        self.map = arena
        self.db = kf_db
        self._rng = jax.random.PRNGKey(7)

        def attempt(frame_signed, frame_valid, frame_uv, frame_pts_cam,
                    frame_has_depth, pt_signed, pt_valid, pt_pos, key):
            d = matching.hamming_matrix(frame_signed, pt_signed)
            res = matching.match(d, max_distance=cfg.matcher.th_low,
                                 ratio=cfg.matcher.nn_ratio_bow, mutual=True,
                                 row_valid=frame_valid & frame_has_depth,
                                 col_valid=pt_valid)
            src = pt_pos[jnp.clip(res.idx, 0)]          # world points
            dst = frame_pts_cam                          # camera-frame points
            align = procrustes.ransac_alignment(
                src, dst, res.valid, key,
                n_hypotheses=cfg.ransac.pnp_iterations,
                cam=cfg.camera, obs_uv=frame_uv, px_threshold=5.0)
            return res, align

        self._jit_attempt = jax.jit(attempt)

        def attempt_pnp(frame_signed, frame_valid, frame_uv,
                        pt_signed, pt_valid, pt_pos, key):
            """Depth-free attempt: 2D-3D EPnP RANSAC (PnPsolver parity)."""
            d = matching.hamming_matrix(frame_signed, pt_signed)
            res = matching.match(d, max_distance=cfg.matcher.th_low,
                                 ratio=cfg.matcher.nn_ratio_bow, mutual=True,
                                 row_valid=frame_valid, col_valid=pt_valid)
            X = pt_pos[jnp.clip(res.idx, 0)]            # world points
            sol = pnp.ransac_epnp(
                X, frame_uv, res.valid, key, cfg.camera,
                n_hypotheses=cfg.ransac.pnp_iterations)
            align = procrustes.AlignmentResult(
                scale=jnp.float32(1.0), R=sol.R, t=sol.t,
                inliers=sol.inliers, n_inliers=sol.n_inliers)
            return res, align

        self._jit_attempt_pnp = jax.jit(attempt_pnp)
        self._jit_refine = jax.jit(
            lambda pose, X, obs, w, v: pose_gn.optimize_pose(
                pose, X, obs, w, v, cfg.camera, cfg.optimizer))

    def relocalize(self, fd: FrameData, words: np.ndarray,
                   bow: Optional[np.ndarray] = None) -> RelocResult:
        cands = self.db.detect_relocalization_candidates(words)
        if len(cands) == 0:
            return RelocResult(False, None, None, None, 0)

        frame_signed = fd.feats.signed_desc()
        has_depth = fd.depth > 0
        pts_cam = cam_ops.unproject(self.cfg.camera, fd.feats.uv, fd.depth)
        # Depth coverage decides the kernel: Horn alignment needs 3D on the
        # frame side; EPnP (the reference's PnPsolver) does not.
        n_valid = max(int(np.asarray(fd.feats.valid).sum()), 1)
        depth_frac = float(np.asarray(has_depth & fd.feats.valid).sum()) \
            / n_valid
        use_pnp = depth_frac < 0.5

        for c in cands:
            c = int(c)
            obs = self.map.kf_obs_pt[c]
            slots = np.nonzero(obs >= 0)[0]
            if len(slots) < 15:
                continue
            pids = obs[slots]
            live = self.map.pt_valid[pids]
            pids = pids[live]
            if len(pids) < 15:
                continue
            pad = np.zeros(self.map.kf_uv.shape[1], np.int64)
            n = min(len(pids), len(pad))
            pad[:n] = pids[:n]
            pt_valid = np.zeros(len(pad), bool)
            pt_valid[:n] = True

            pt_signed = brief.to_signed(brief.unpack_bits(
                jnp.asarray(self.map.pt_desc[pad])))
            self._rng, key = jax.random.split(self._rng)
            if use_pnp:
                res, align = self._jit_attempt_pnp(
                    frame_signed, fd.feats.valid, fd.feats.uv,
                    pt_signed, jnp.asarray(pt_valid),
                    jnp.asarray(self.map.pt_pos[pad]), key)
            else:
                res, align = self._jit_attempt(
                    frame_signed, fd.feats.valid, fd.feats.uv, pts_cam,
                    has_depth, pt_signed, jnp.asarray(pt_valid),
                    jnp.asarray(self.map.pt_pos[pad]), key)
            if int(res.valid.sum()) < 15:
                continue
            if int(align.n_inliers) < 10:
                continue

            pose0 = SE3(align.R, align.t)
            X = jnp.asarray(self.map.pt_pos[pad])[jnp.clip(res.idx, 0)]
            refined = self._jit_refine(pose0, X, fd.obs, fd.inv_sigma2,
                                       res.valid & align.inliers)
            n_inl = int(refined.n_inliers)
            if n_inl >= self.cfg.tracking.reloc_min_inliers:
                point_ids = np.full(fd.n, -1, np.int32)
                sel = np.asarray(refined.inliers)
                point_ids[sel] = pad[np.asarray(res.idx)[sel]]
                return RelocResult(True, np.asarray(refined.pose.R),
                                   np.asarray(refined.pose.t), point_ids,
                                   n_inl)
        return RelocResult(False, None, None, None, 0)
