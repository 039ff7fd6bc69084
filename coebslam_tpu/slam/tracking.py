"""Tracking: the per-frame state machine + jitted device tracking steps.

TPU-native re-design of `Tracking.cc` (SURVEY §2.1 Tracking row, call stack
§3.1).  The lost/init/OK state machine and keyframe policy live on the host
(SURVEY §7.3 hard part 4: control flow fights jit), but each state's body is
a single fused device program:

  frontend  : extract + depth associate               (slam/frame.py)
  track step: project -> MXU Hamming match -> robust pose GN
              (replaces SearchByProjection + PoseOptimization)

The reference runs three separate searches (motion model vs last frame,
BoW vs reference KF, projection vs local map).  Here both tracking stages
are the same jitted function against different point sets and radii:
stage 1 vs the last frame's map points with a wide window (TrackWithMotion
Model, Tracking.cc:933), stage 2 vs the covisibility local map with a tight
window (TrackLocalMap/SearchLocalPoints, Tracking.cc:996/1222).

The COEB adaptive feature budget (Tracking.cc:417-466) is a traced scalar:
growing it masks in more extraction quota — no extractor rebuild, no
recompile.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import camera as cam_ops
from ..geometry import se3
from ..geometry.se3 import SE3
from ..optim import pose_gn
from ..ops import brief, matching
from . import frame as frame_mod
from .frame import FrameData
from .map import MapArena

LOCAL_MAP_CAP = 4096

# Tracking states (Tracking.h:81-87).
NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


class TrackStepResult(NamedTuple):
    pose: SE3
    point_idx: jnp.ndarray     # [N] index into the point set (-1 no match)
    inliers: jnp.ndarray       # [N] bool
    n_inliers: jnp.ndarray     # int32
    n_matches: jnp.ndarray     # int32


def track_step(frame: FrameData, pose_pred: SE3, pts_w, pt_signed_desc,
               pt_valid, pt_angle, pt_normal, pt_min_dist, pt_max_dist,
               radius, cfg: SystemConfig) -> TrackStepResult:
    """Project-match-optimize against an arbitrary point set.  Jittable.

    Args:
      pts_w: [M, 3] candidate map points (world).
      pt_signed_desc: [M, 256] +-1 bf16 descriptors.
      pt_valid: [M] bool.
      pt_normal / pt_min_dist / pt_max_dist: viewing-direction and
        scale-invariance band per point (MapPoint::UpdateNormalAndDepth /
        PredictScale semantics, MapPoint.cc:367-411).
      radius: scalar search radius in px (level-0 scale).
    """
    cam = cfg.camera
    pc = se3.transform_points(pose_pred, pts_w)
    uvr = cam_ops.project_stereo(cam, pc)
    vis = pt_valid & cam_ops.in_frustum(cam, pc, margin=radius)

    # Frame::isInFrustum gates (Frame.cc:445): distance inside the scale-
    # invariance band and viewing angle within 60 deg of the point normal.
    center = -jnp.einsum("ji,j->i", pose_pred.R, pose_pred.t)
    vec = pts_w - center
    dist = jnp.linalg.norm(vec, axis=-1)
    dist_ok = (dist > 0.8 * pt_min_dist) & (dist < 1.2 * pt_max_dist)
    view_cos = jnp.einsum("mi,mi->m", vec / jnp.maximum(dist, 1e-9)[:, None],
                          pt_normal)
    vis = vis & dist_ok & (view_cos > 0.5)

    d = matching.hamming_matrix(frame.feats.signed_desc(), pt_signed_desc)
    # Window: frame keypoint within `radius * level_scale` of the projection.
    scale = cfg.orb.scale_factor ** frame.feats.level.astype(jnp.float32)
    dx = jnp.abs(frame.feats.uv[:, None, 0] - uvr[None, :, 0])
    dy = jnp.abs(frame.feats.uv[:, None, 1] - uvr[None, :, 1])
    r = radius * scale[:, None]
    d = d + jnp.where((dx <= r) & (dy <= r), 0.0, matching.BIG)

    # PredictScale octave compatibility (MapPoint.cc:385-411 +
    # SearchByProjection octave windows, ORBmatcher.cc:1386-1412): the
    # keypoint's pyramid level must be within +-1 of the level predicted
    # from the current viewing distance.
    log_sf = jnp.log(jnp.float32(cfg.orb.scale_factor))
    pred_level = jnp.ceil(
        jnp.log(jnp.maximum(pt_max_dist, 1e-6)
                / jnp.maximum(dist, 1e-6)) / log_sf)
    pred_level = jnp.clip(pred_level, 0, cfg.orb.n_levels - 1)
    level_diff = frame.feats.level[:, None].astype(jnp.float32) - pred_level[None, :]
    d = d + jnp.where(jnp.abs(level_diff) <= 1.0, 0.0, matching.BIG)

    # mutual=True keeps assignments one-to-one: the reference's point-centric
    # SearchByProjection writes each point into at most one keypoint slot;
    # slot-wise argmin alone lets several slots claim the same point, and the
    # losers are guaranteed-false matches that bias the solve.
    res = matching.match(d, max_distance=cfg.matcher.th_high,
                         ratio=cfg.matcher.nn_ratio_tracking, mutual=True,
                         row_valid=frame.feats.valid, col_valid=vis)
    if cfg.matcher.check_orientation:
        res = matching.rotation_consistency(frame.feats.angle, pt_angle, res,
                                            cfg.matcher.histo_length)

    X = pts_w[jnp.clip(res.idx, 0)]
    opt = pose_gn.optimize_pose(pose_pred, X, frame.obs, frame.inv_sigma2,
                                res.valid, cam, cfg.optimizer)
    idx = jnp.where(opt.inliers, res.idx, -1)
    return TrackStepResult(pose=opt.pose, point_idx=idx,
                           inliers=opt.inliers, n_inliers=opt.n_inliers,
                           n_matches=res.valid.sum().astype(jnp.int32))


class FusedOut(NamedTuple):
    """Single-fetch bundle of everything the host needs from one frame.

    The per-frame pipeline (frontend + both tracking stages + retry + motion
    gate + keyframe-policy statistics) runs as ONE device program: through a
    remote-TPU relay every dispatch costs ~40 ms, so the naive
    dispatch-per-stage layout (frontend, stage 1, wide retry, stage 2 x2,
    plus stray jnp host math) pays ~10x the device compute in latency.
    """
    fd: FrameData              # device-resident; fetched only on KF creation
    pose_R: jnp.ndarray        # [3, 3] final pose
    pose_t: jnp.ndarray        # [3]
    point_idx: jnp.ndarray     # [N] final match into the stage-2 id set
    n_inl1: jnp.ndarray        # stage-1 inliers (post retry)
    n_match1: jnp.ndarray
    n_inl2a: jnp.ndarray       # wide local-map pass inliers
    n_inl: jnp.ndarray         # final inliers
    n_feat: jnp.ndarray        # extracted keypoint count
    dt: jnp.ndarray            # |translation| vs last pose (motion gate)
    ang: jnp.ndarray           # rotation angle vs last pose
    tracked_close: jnp.ndarray     # close-depth kps with a map point
    untracked_close: jnp.ndarray   # close-depth kps without one


def _select(pred, a, b):
    """Tree-select between two identically-shaped result pytrees."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def fused_frame_step(gray, depth_img, budget, R_pred, t_pred, R_last, t_last,
                     s1_ids, s1_valid, s2_ids, s2_valid, arena,
                     cfg: SystemConfig, dynamic_mask=None, area_mode=None,
                     depth_scale: float = 1.0) -> FusedOut:
    """The whole per-frame pipeline as one jittable program.

    Args:
      gray: [H, W] any dtype (uint8 preferred — 4x cheaper host->device).
      depth_img: [H, W] float32 metres or uint16 raw (scaled by depth_scale).
      s1_ids/s1_valid: stage-1 candidate map-point ids (last frame's points,
        TrackWithMotionModel semantics).
      s2_ids/s2_valid: stage-2 candidates (covisibility local map,
        TrackLocalMap semantics).
      arena: tuple of device-resident point arrays (pos, signed_desc, valid,
        angle, normal, min_dist, max_dist) — see Tracker._device_map.
    """
    pos, sd, pv, pa, pn, pmin, pmax = arena
    gray = gray.astype(jnp.float32)
    depth_img = depth_img.astype(jnp.float32) * jnp.float32(depth_scale)
    fd = frame_mod.process_rgbd(gray, depth_img, cfg.camera, cfg.orb,
                                n_features=budget,
                                dynamic_mask=dynamic_mask,
                                area_mode=area_mode)
    pose_pred = SE3(R_pred, t_pred)
    pose_last = SE3(R_last, t_last)

    def run(pose, ids, idv, radius):
        return track_step(fd, pose, pos[ids], sd[ids], idv & pv[ids],
                          pa[ids], pn[ids], pmin[ids], pmax[ids],
                          jnp.float32(radius), cfg)

    # Stage 1 + in-graph widened retry (Tracking.cc:956-966 semantics).
    res1 = run(pose_pred, s1_ids, s1_valid, cfg.matcher.radius_motion_model)

    def retry(_):
        wide = run(pose_last, s1_ids, s1_valid,
                   2.0 * cfg.matcher.radius_motion_model)
        return _select(wide.n_inliers > res1.n_inliers, wide, res1)

    res1 = jax.lax.cond(res1.n_inliers < 30, retry, lambda _: res1, None)

    # Stage 2: wide pass absorbs stage-1 error, tight re-match refines.
    res2a = run(res1.pose, s2_ids, s2_valid, 16.0)
    ok2a = res2a.n_inliers >= cfg.tracking.min_inliers_track
    pose_mid = _select(ok2a, res2a.pose, res1.pose)
    res2 = run(pose_mid, s2_ids, s2_valid, 6.0)
    final = _select(res2.n_inliers >= res2a.n_inliers, res2, res2a)

    # Motion gate quantities (host compares against thresholds).
    d = final.pose.compose(pose_last.inverse())
    dt = jnp.linalg.norm(d.t)
    ang = jnp.arccos(jnp.clip((jnp.trace(d.R) - 1.0) / 2.0, -1.0, 1.0))

    # Keyframe-policy close-point statistics (NeedNewKeyFrame, RGB-D branch).
    close = fd.feats.valid & (fd.depth > 0) \
        & (fd.depth < cfg.camera.depth_threshold)
    has_pt = final.point_idx >= 0
    return FusedOut(
        fd=fd, pose_R=final.pose.R, pose_t=final.pose.t,
        point_idx=final.point_idx,
        n_inl1=res1.n_inliers, n_match1=res1.n_matches,
        n_inl2a=res2a.n_inliers, n_inl=final.n_inliers,
        n_feat=fd.feats.valid.sum().astype(jnp.int32),
        dt=dt, ang=ang,
        tracked_close=(close & has_pt).sum().astype(jnp.int32),
        untracked_close=(close & ~has_pt).sum().astype(jnp.int32))


def _np_inv(R: np.ndarray, t: np.ndarray):
    return R.T, -R.T @ t


def _np_unproject_world(cam, uv: np.ndarray, depth: np.ndarray,
                        R_cw: np.ndarray, t_cw: np.ndarray) -> np.ndarray:
    """Unproject pixels to world coordinates, all numpy (UnprojectStereo,
    Frame.cc:844 semantics): X_w = R_cw^T (X_c - t_cw)."""
    z = depth.astype(np.float32)
    x = (uv[:, 0] - cam.cx) / cam.fx * z
    y = (uv[:, 1] - cam.cy) / cam.fy * z
    pts_c = np.stack([x, y, z], axis=-1).astype(np.float32)
    return (pts_c - t_cw) @ R_cw


def _np_compose(Ra, ta, Rb, tb):
    return Ra @ Rb, Ra @ tb + ta


@dataclass
class TrackerState:
    mode: str = NOT_INITIALIZED
    pose_R: np.ndarray = field(default_factory=lambda: np.eye(3, dtype=np.float32))
    pose_t: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    vel_R: np.ndarray = field(default_factory=lambda: np.eye(3, dtype=np.float32))
    vel_t: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    has_velocity: bool = False
    last_kf: int = -1
    frames_since_kf: int = 0
    frame_idx: int = 0
    # COEB adaptive budget counters (Tracking.h:89-98).
    budget: int = 1000
    consec_ok: int = 0
    strong_frames: int = 0
    n_lost_frames: int = 0
    peak_inliers_since_kf: int = 0


class FrameRecord(NamedTuple):
    """Host copy of per-frame data needed across frames."""
    uv: np.ndarray
    level: np.ndarray
    angle: np.ndarray
    desc: np.ndarray
    depth: np.ndarray
    ur: np.ndarray
    valid: np.ndarray
    point_ids: np.ndarray      # map point id per slot (-1 none)


class Tracker:
    """Host orchestration for RGB-D tracking (System + Tracking facade of the
    MVP slice; local mapping / loop closing attach on top)."""

    def __init__(self, cfg: SystemConfig, map_arena: Optional[MapArena] = None):
        self.cfg = cfg
        self.map = map_arena if map_arena is not None else MapArena(cfg)
        self.state = TrackerState(budget=cfg.orb.n_features)
        self.last_frame: Optional[FrameRecord] = None
        self.trajectory = []        # list of (stamp, R_cw, t_cw)
        self.ref_kf: int = -1
        self.on_keyframe = None     # callback(kf_id) — local mapping hook
        self.reloc_fn = None        # callback(fd) -> RelocResult (BoW rel.)
        # Monocular initialization state (Tracking::MonocularInitialization).
        self._mono_ref: Optional[FrameData] = None
        self._mono_ref_stamp: float = 0.0

        # Static config is closed over (frozen dataclasses are not pytrees).
        def _cast(g, d):
            g = g.astype(jnp.float32)
            if jnp.issubdtype(d.dtype, jnp.integer):
                # Raw sensor depth (e.g. TUM uint16): scale in-graph so the
                # host->device transfer ships 2 bytes/px instead of 4.
                d = d.astype(jnp.float32) / cfg.camera.depth_map_factor
            else:
                d = d.astype(jnp.float32)
            return g, d

        self._jit_frontend = jax.jit(
            lambda g, d, n: frame_mod.process_rgbd(
                *_cast(g, d), cfg.camera, cfg.orb, n_features=n))
        self._jit_frontend_masked = jax.jit(
            lambda g, d, n, m, a: frame_mod.process_rgbd(
                *_cast(g, d), cfg.camera, cfg.orb, n_features=n,
                dynamic_mask=m, area_mode=a))

        def fused(g, d, n, Rp, tp, Rl, tl, s1i, s1v, s2i, s2v, arena):
            g, d = _cast(g, d)
            return fused_frame_step(g, d, n, Rp, tp, Rl, tl, s1i, s1v,
                                    s2i, s2v, arena, cfg)

        def fused_masked(g, d, n, Rp, tp, Rl, tl, s1i, s1v, s2i, s2v,
                         arena, m, a):
            g, d = _cast(g, d)
            return fused_frame_step(g, d, n, Rp, tp, Rl, tl, s1i, s1v,
                                    s2i, s2v, arena, cfg,
                                    dynamic_mask=m, area_mode=a)

        self._jit_fused = jax.jit(fused)
        self._jit_fused_masked = jax.jit(fused_masked)
        # The map's point arrays live device-resident (uploaded only when
        # arena.version changes); per-call traffic is just the candidate id
        # list — gathering happens on-device.  Through the remote-TPU relay
        # this is the difference between ~10 MB and ~20 KB per frame.
        self._jit_track = jax.jit(
            lambda fd, pp, pos, sd, pv, pa, pn, pmin, pmax, ids, idv, r:
            track_step(fd, pp, pos[ids], sd[ids], idv & pv[ids], pa[ids],
                       pn[ids], pmin[ids], pmax[ids], r, cfg))
        self._dev_version = -1
        self._dev_map = None

    # ------------------------------------------------------------------ #

    def process_frame(self, gray, depth, stamp: float,
                      dynamic_mask=None, area_mode: bool = False,
                      spawn_mask=None):
        """Track one frame.  Returns (state_str, n_inliers).

        ``depth``: [H, W] metres for RGB-D; pass None for monocular (the
        front-end then produces depthless observations and map points come
        from two-view initialization + triangulation).
        ``spawn_mask``: optional [H, W] bool — regions where map points must
        not be CREATED (keypoints there may still match existing points)."""
        self._spawn_mask = None if spawn_mask is None else np.asarray(spawn_mask)
        if depth is None:
            depth = np.zeros(np.asarray(gray).shape, np.float32)
        budget = jnp.int32(self.state.budget)

        if self.state.mode == NOT_INITIALIZED:
            if dynamic_mask is not None:
                fd: FrameData = self._jit_frontend_masked(
                    gray, depth, budget, dynamic_mask, jnp.bool_(area_mode))
            else:
                fd = self._jit_frontend(gray, depth, budget)
            if self.cfg.sensor == "monocular":
                n = self._initialize_monocular(fd, stamp)
            else:
                n = self._initialize(fd, stamp)
            self._record_pose(stamp)
            return self.state.mode, n

        out = self._dispatch_fused(gray, depth, budget, dynamic_mask,
                                   area_mode)
        n_inliers = self._track_fused(out, stamp)
        self._apply_adaptive_budget(n_inliers)
        self._record_pose(stamp)
        self.state.frame_idx += 1
        return self.state.mode, n_inliers

    def _dispatch_fused(self, gray, depth, budget, dynamic_mask, area_mode
                        ) -> FusedOut:
        """One device dispatch for the whole frame; no host jnp math."""
        st = self.state
        if st.has_velocity:
            Rp, tp = _np_compose(st.vel_R, st.vel_t, st.pose_R, st.pose_t)
        else:
            Rp, tp = st.pose_R, st.pose_t
        lp = self.last_frame.point_ids
        s1 = self._pad_ids(lp[lp >= 0], lp.shape[0])
        local_kfs = self._local_keyframes()
        local_ids = self.map.local_map_points(local_kfs, LOCAL_MAP_CAP)
        self._last_local_ids = local_ids
        arena = self._device_map()
        args = (gray, depth, budget,
                jnp.asarray(Rp), jnp.asarray(tp),
                jnp.asarray(st.pose_R), jnp.asarray(st.pose_t),
                jnp.asarray(np.clip(s1, 0, None).astype(np.int32)),
                jnp.asarray(s1 >= 0),
                jnp.asarray(np.clip(local_ids, 0, None).astype(np.int32)),
                jnp.asarray(local_ids >= 0), arena)
        if dynamic_mask is not None:
            return self._jit_fused_masked(*args, jnp.asarray(dynamic_mask),
                                          jnp.bool_(area_mode))
        return self._jit_fused(*args)

    def _track_fused(self, out: FusedOut, stamp: float) -> int:
        """Host tail of the fused step: one bundled fetch, numpy decisions."""
        cfg = self.cfg
        st = self.state
        local_ids = self._last_local_ids
        fetched: FusedOut = jax.device_get(out)
        relocalized = False

        if int(fetched.n_inl1) < cfg.tracking.min_inliers_track:
            # Rare recovery path (reloc / wide reference search) — allowed to
            # pay extra dispatches.  Uses the device-resident fd from `out`.
            vals = self._recover(out, fetched, local_ids)
            if vals is None:
                st.mode = LOST
                st.n_lost_frames += 1
                st.consec_ok = 0
                st.has_velocity = False
                return 0
            pose_R, pose_t, point_idx, n_inliers, relocalized = vals
            d_R, d_t = _np_compose(pose_R, pose_t,
                                   *_np_inv(st.pose_R, st.pose_t))
            dt = float(np.linalg.norm(d_t))
            ang = float(np.arccos(np.clip((np.trace(d_R) - 1) / 2, -1, 1)))
        else:
            pose_R, pose_t = fetched.pose_R, fetched.pose_t
            point_idx = fetched.point_idx
            n_inliers = int(fetched.n_inl)
            dt, ang = float(fetched.dt), float(fetched.ang)
            self.debug_info = {
                "s1_inl": int(fetched.n_inl1),
                "s1_match": int(fetched.n_match1),
                "s2a_inl": int(fetched.n_inl2a), "s2_inl": int(fetched.n_inl),
                "n_local": int((local_ids >= 0).sum()),
            }

        # Motion sanity gate (relocalization is an absolute fix — exempt).
        self.debug_motion = (dt, ang)
        t = cfg.tracking
        scale = 1.0 + (st.n_lost_frames if st.mode == LOST else 0)
        if not relocalized and (dt > t.max_translation_per_frame * scale
                                or ang > t.max_rotation_per_frame * scale):
            st.mode = LOST
            st.n_lost_frames += 1
            st.consec_ok = 0
            st.has_velocity = False
            return 0

        if n_inliers < cfg.tracking.min_inliers_track:
            st.mode = LOST
            st.n_lost_frames += 1
            st.consec_ok = 0
            st.has_velocity = False
            return n_inliers

        was_ok = st.mode == OK
        st.mode = OK
        st.consec_ok += 1
        pose_R = np.asarray(pose_R, np.float32)
        pose_t = np.asarray(pose_t, np.float32)
        if was_ok:
            st.vel_R, st.vel_t = _np_compose(pose_R, pose_t,
                                             *_np_inv(st.pose_R, st.pose_t))
            st.has_velocity = True
        else:
            st.has_velocity = False
        st.pose_R, st.pose_t = pose_R, pose_t

        # Found/visible bookkeeping for culling.
        matched = np.asarray(point_idx)
        sel = matched >= 0
        pids = local_ids[matched[sel]]
        self.map.pt_found[pids[pids >= 0]] += 1
        self.map.pt_visible[local_ids[local_ids >= 0]] += 1

        rec = self._fetched_record(fetched.fd)
        point_ids = np.full(rec.uv.shape[0], -1, np.int32)
        point_ids[sel] = local_ids[matched[sel]]
        rec = rec._replace(point_ids=point_ids)
        self.last_frame = rec

        st.frames_since_kf += 1
        st.peak_inliers_since_kf = max(st.peak_inliers_since_kf, n_inliers)
        if self._need_keyframe(rec, n_inliers):
            self._create_keyframe(rec, stamp)
            st.peak_inliers_since_kf = n_inliers
        return n_inliers

    def _recover(self, out: FusedOut, fetched: FusedOut, local_ids):
        """Stage-1 failure: BoW relocalization, else wide search against the
        reference KF (Tracking.cc:1417 / 823), then local-map re-tracking."""
        cfg = self.cfg
        pose_cand = None
        relocalized = False
        if self.reloc_fn is not None:
            rr = self.reloc_fn(out.fd)
            if rr.ok:
                pose_cand = SE3(jnp.asarray(rr.R), jnp.asarray(rr.t))
                relocalized = True
        if pose_cand is None:
            ref_ids = self.map.kf_obs_pt[self.ref_kf]
            ref_ids = self._pad_ids(ref_ids[ref_ids >= 0],
                                    self.last_frame.point_ids.shape[0])
            pose_last = SE3(jnp.asarray(self.state.pose_R),
                            jnp.asarray(self.state.pose_t))
            res = self._run_track(out.fd, pose_last, ref_ids, 50.0)
            if int(res.n_inliers) < cfg.tracking.min_inliers_track:
                return None
            pose_cand = res.pose
        res2a = self._run_track(out.fd, pose_cand, local_ids, 16.0)
        pose = res2a.pose if int(res2a.n_inliers) \
            >= cfg.tracking.min_inliers_track else pose_cand
        res2 = self._run_track(out.fd, pose, local_ids, 6.0)
        if int(res2.n_inliers) < int(res2a.n_inliers):
            res2 = res2a
        if int(res2.n_inliers) < cfg.tracking.min_inliers_track \
                and not relocalized:
            return None
        return (np.asarray(res2.pose.R), np.asarray(res2.pose.t),
                np.asarray(res2.point_idx), int(res2.n_inliers), relocalized)

    def _fetched_record(self, fd_np) -> FrameRecord:
        """FrameRecord from an already-fetched (numpy) FrameData."""
        return FrameRecord(
            uv=np.asarray(fd_np.feats.uv), level=np.asarray(fd_np.feats.level),
            angle=np.asarray(fd_np.feats.angle),
            desc=np.asarray(fd_np.feats.desc), depth=np.asarray(fd_np.depth),
            ur=np.asarray(fd_np.ur), valid=np.asarray(fd_np.feats.valid),
            point_ids=np.full(fd_np.depth.shape[0], -1, np.int32))

    # ------------------------------------------------------------------ #

    def _initialize(self, fd: FrameData, stamp: float) -> int:
        """StereoInitialization (Tracking.cc:577-629): need enough features,
        spawn map points for every keypoint with depth."""
        n_feat = int(fd.feats.valid.sum())
        if n_feat < 500:
            return n_feat
        rec = self._to_record(fd)
        has_depth = rec.valid & (rec.depth > 0) & ~self._in_spawn_mask(rec)
        pts_w = _np_unproject_world(self.cfg.camera, rec.uv[has_depth],
                                    rec.depth[has_depth],
                                    self.state.pose_R, self.state.pose_t)
        ids = self.map.add_points(pts_w, rec.desc[has_depth], first_kf=0,
                                  angles=rec.angle[has_depth])
        point_ids = np.full(rec.uv.shape[0], -1, np.int32)
        point_ids[np.nonzero(has_depth)[0][ids >= 0]] = ids[ids >= 0]
        kf = self.map.add_keyframe(
            self.state.pose_R, self.state.pose_t, stamp, rec.uv, rec.level,
            rec.angle, rec.desc, rec.depth, rec.ur, rec.valid, point_ids)
        self.map.update_point_stats(ids[ids >= 0])
        self.last_frame = rec._replace(point_ids=point_ids)
        self.ref_kf = kf
        self.state.last_kf = kf
        self.state.frames_since_kf = 0
        self.state.mode = OK
        if self.on_keyframe:
            self.on_keyframe(kf)
        return n_feat

    def process_frame_data(self, fd: FrameData, stamp: float):
        """Track a pre-built FrameData (used by the stereo front-end, whose
        frame constructor differs but whose tracking path is identical)."""
        self._spawn_mask = None
        if self.state.mode == NOT_INITIALIZED:
            n = self._initialize(fd, stamp)
            self._record_pose(stamp)
            return self.state.mode, n
        n_inliers = self._track(fd, stamp)
        self._apply_adaptive_budget(n_inliers)
        self._record_pose(stamp)
        self.state.frame_idx += 1
        return self.state.mode, n_inliers

    # ------------------------------------------------------------------ #

    def _initialize_monocular(self, fd: FrameData, stamp: float) -> int:
        """Two-view monocular initialization (Tracking.cc:631-821):
        hold a reference frame with > 100 keypoints, match the next frames
        in a wide window, run the batched H/F initializer, build the initial
        map from the triangulated points, normalize scale by median depth.
        """
        from ..ops import initializer_ops, matching as matching_ops

        n_feat = int(fd.feats.valid.sum())
        if self._mono_ref is None:
            if n_feat > 100:
                self._mono_ref = fd
                self._mono_ref_stamp = stamp
            return n_feat
        if n_feat <= 100:
            self._mono_ref = None
            return n_feat

        ref = self._mono_ref
        d = matching_ops.hamming_matrix(ref.feats.signed_desc(),
                                        fd.feats.signed_desc())
        d = d + matching_ops.window_penalty(
            ref.feats.uv, fd.feats.uv, self.cfg.matcher.radius_init)
        res = matching_ops.match(d, max_distance=self.cfg.matcher.th_low,
                                 ratio=self.cfg.matcher.nn_ratio_init,
                                 mutual=True, row_valid=ref.feats.valid,
                                 col_valid=fd.feats.valid)
        if int(res.valid.sum()) < 100:
            self._mono_ref = None   # reference too stale — restart
            return n_feat

        uv2 = fd.feats.uv[jnp.clip(res.idx, 0)]
        key = jax.random.PRNGKey(int(stamp * 1e4) & 0x7fffffff)
        rec_res = initializer_ops.reconstruct(
            ref.feats.uv, uv2, res.valid, self.cfg.camera, key,
            n_hypotheses=self.cfg.ransac.init_iterations,
            sigma=self.cfg.ransac.init_sigma)
        if not bool(rec_res.ok):
            return n_feat

        # Scale normalization: median depth of triangulated points -> 1
        # (Tracking.cc:756-780).
        good = np.asarray(rec_res.good)
        X = np.asarray(rec_res.points)
        med = float(np.median(X[good][:, 2]))
        if med <= 0:
            return n_feat
        X = X / med
        t2 = np.asarray(rec_res.t) / med
        R2 = np.asarray(rec_res.R)

        ref_rec = self._to_record(ref)
        cur_rec = self._to_record(fd)

        # KF1 at identity.
        ids = self.map.add_points(X[good], ref_rec.desc[good], first_kf=0,
                                  angles=ref_rec.angle[good])
        pids1 = np.full(ref_rec.uv.shape[0], -1, np.int32)
        pids1[np.nonzero(good)[0][ids >= 0]] = ids[ids >= 0]
        kf1 = self.map.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            self._mono_ref_stamp, ref_rec.uv, ref_rec.level, ref_rec.angle,
            ref_rec.desc, ref_rec.depth, ref_rec.ur, ref_rec.valid, pids1)
        # KF2 at the recovered pose.
        idx2 = np.asarray(res.idx)
        pids2 = np.full(cur_rec.uv.shape[0], -1, np.int32)
        sel = np.nonzero(good)[0][ids >= 0]
        pids2[idx2[sel]] = ids[ids >= 0]
        kf2 = self.map.add_keyframe(
            R2, t2.astype(np.float32), stamp, cur_rec.uv, cur_rec.level,
            cur_rec.angle, cur_rec.desc, cur_rec.depth, cur_rec.ur,
            cur_rec.valid, pids2)
        self.map.update_point_stats(ids[ids >= 0])

        self.state.pose_R, self.state.pose_t = R2, t2.astype(np.float32)
        self.last_frame = cur_rec._replace(point_ids=pids2)
        self.ref_kf = kf2
        self.state.last_kf = kf2
        self.state.frames_since_kf = 0
        self.state.mode = OK
        self._mono_ref = None
        if self.on_keyframe:
            self.on_keyframe(kf1)
            self.on_keyframe(kf2)
            self.state.pose_R = self.map.kf_R[kf2].copy()
            self.state.pose_t = self.map.kf_t[kf2].copy()
        return int(res.valid.sum())

    def _track(self, fd: FrameData, stamp: float) -> int:
        cfg = self.cfg
        st = self.state
        pose_last = SE3(jnp.asarray(st.pose_R), jnp.asarray(st.pose_t))
        if st.has_velocity:
            vel = SE3(jnp.asarray(st.vel_R), jnp.asarray(st.vel_t))
            pose_pred = vel.compose(pose_last)
        else:
            pose_pred = pose_last

        # ---- stage 1: vs last frame's map points (TrackWithMotionModel) ----
        lp = self.last_frame.point_ids
        stage1_ids = self._pad_ids(lp[lp >= 0], lp.shape[0])
        res1 = self._run_track(fd, pose_pred, stage1_ids,
                               cfg.matcher.radius_motion_model)
        if int(res1.n_inliers) < 30:
            # Widened retry from the unextrapolated pose — the reference's
            # 2x-window retry when the motion model finds <20 matches
            # (Tracking.cc:956-966).
            wide = self._run_track(fd, pose_last, stage1_ids,
                                   2.0 * cfg.matcher.radius_motion_model)
            if int(wide.n_inliers) > int(res1.n_inliers):
                res1 = wide
        pose = res1.pose
        relocalized = False
        if int(res1.n_inliers) < cfg.tracking.min_inliers_track:
            # Relocalization (Tracking.cc:1417): BoW retrieval + alignment
            # RANSAC when the database is wired; otherwise a wide projection
            # search against the reference keyframe.
            if self.reloc_fn is not None:
                rr = self.reloc_fn(fd)
                if rr.ok:
                    pose = SE3(jnp.asarray(rr.R), jnp.asarray(rr.t))
                    relocalized = True
            if not relocalized:
                ref_ids = self.map.kf_obs_pt[self.ref_kf]
                ref_ids = self._pad_ids(ref_ids[ref_ids >= 0], lp.shape[0])
                res1 = self._run_track(fd, pose_last, ref_ids, 50.0)
                pose = res1.pose
                if int(res1.n_inliers) < cfg.tracking.min_inliers_track:
                    st.mode = LOST
                    st.n_lost_frames += 1
                    st.consec_ok = 0
                    st.has_velocity = False
                    return int(res1.n_inliers)

        # ---- stage 2: vs covisibility local map (TrackLocalMap) ----
        # Two match-solve iterations: a wide pass absorbs stage-1 error, a
        # tight re-match refines (the reference gets the same effect from its
        # viewing-angle-scaled radii + second PoseOptimization).
        local_kfs = self._local_keyframes()
        local_ids = self.map.local_map_points(local_kfs, LOCAL_MAP_CAP)
        res2a = self._run_track(fd, pose, local_ids, 16.0)
        if int(res2a.n_inliers) >= cfg.tracking.min_inliers_track:
            pose = res2a.pose
        res2 = self._run_track(fd, pose, local_ids, 6.0)
        if int(res2.n_inliers) < int(res2a.n_inliers):
            res2 = res2a
        n_inliers = int(res2.n_inliers)

        # Motion sanity gate (see TrackingConfig.max_translation_per_frame).
        # A BoW relocalization is an absolute fix — exempt from the gate.
        if not relocalized and not self._motion_plausible(res2.pose, pose_last):
            st.mode = LOST
            st.n_lost_frames += 1
            st.consec_ok = 0
            st.has_velocity = False
            return 0
        self.debug_info = {
            "s1_inl": int(res1.n_inliers), "s1_match": int(res1.n_matches),
            "s2a_inl": int(res2a.n_inliers), "s2_inl": int(res2.n_inliers),
            "n_local": int((local_ids >= 0).sum()),
        }

        if n_inliers < cfg.tracking.min_inliers_track:
            st.mode = LOST
            st.n_lost_frames += 1
            st.consec_ok = 0
            st.has_velocity = False
            return n_inliers

        was_ok = st.mode == OK
        st.mode = OK
        st.consec_ok += 1
        # Velocity update: vel = T_cur . T_last^-1 (Tracking.cc:528).  Only
        # valid if the previous frame was tracked — after a LOST outage the
        # stored pose is stale and the quotient is not a per-frame velocity.
        new_R = np.asarray(res2.pose.R)
        new_t = np.asarray(res2.pose.t)
        if was_ok:
            last_T = SE3(jnp.asarray(st.pose_R), jnp.asarray(st.pose_t))
            vel = res2.pose.compose(last_T.inverse())
            st.vel_R, st.vel_t = np.asarray(vel.R), np.asarray(vel.t)
            st.has_velocity = True
        else:
            st.has_velocity = False
        st.pose_R, st.pose_t = new_R, new_t

        # Found/visible bookkeeping for culling.
        matched = np.asarray(res2.point_idx)
        sel = matched >= 0
        pids = local_ids[matched[sel]]
        self.map.pt_found[pids[pids >= 0]] += 1
        self.map.pt_visible[local_ids[local_ids >= 0]] += 1

        # Frame record with final local-map associations.
        rec = self._to_record(fd)
        point_ids = np.full(rec.uv.shape[0], -1, np.int32)
        point_ids[sel] = local_ids[matched[sel]]
        rec = rec._replace(point_ids=point_ids)
        self.last_frame = rec

        st.frames_since_kf += 1
        st.peak_inliers_since_kf = max(st.peak_inliers_since_kf, n_inliers)
        if self._need_keyframe(rec, n_inliers):
            self._create_keyframe(rec, stamp)
            st.peak_inliers_since_kf = n_inliers
        return n_inliers

    # ------------------------------------------------------------------ #

    def _motion_plausible(self, pose_new: SE3, pose_last: SE3) -> bool:
        """Reject solves that jump implausibly far in one frame.  While LOST
        the allowance grows with the outage length so relocalization can
        re-attach after the camera moved on."""
        t = self.cfg.tracking
        scale = 1.0 + (self.state.n_lost_frames if self.state.mode == LOST else 0)
        d = pose_new.compose(pose_last.inverse())
        dt = float(jnp.linalg.norm(d.t))
        tr = float(jnp.trace(d.R))
        ang = float(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
        self.debug_motion = (dt, ang)
        return (dt <= t.max_translation_per_frame * scale
                and ang <= t.max_rotation_per_frame * scale)

    def _device_map(self):
        """Device-resident point arrays, refreshed on arena mutation."""
        m = self.map
        if self._dev_map is None or self._dev_version != m.version:
            self._dev_map = (
                jnp.asarray(m.pt_pos),
                brief.to_signed(brief.unpack_bits(jnp.asarray(m.pt_desc))),
                jnp.asarray(m.pt_valid),
                jnp.asarray(m.pt_angle),
                jnp.asarray(m.pt_normal),
                jnp.asarray(m.pt_min_dist),
                jnp.asarray(m.pt_max_dist),
            )
            self._dev_version = m.version
        return self._dev_map

    def _run_track(self, fd, pose_pred, point_ids, radius) -> TrackStepResult:
        pos, sd, pv, pa, pn, pmin, pmax = self._device_map()
        ids = jnp.asarray(np.clip(point_ids, 0, None).astype(np.int32))
        idv = jnp.asarray(point_ids >= 0)
        return self._jit_track(fd, pose_pred, pos, sd, pv, pa, pn, pmin,
                               pmax, ids, idv, jnp.float32(radius))

    def _pad_ids(self, ids: np.ndarray, size: int) -> np.ndarray:
        out = np.full(size, -1, np.int32)
        out[:min(len(ids), size)] = ids[:size]
        return out

    def _local_keyframes(self) -> np.ndarray:
        """Covisibility neighborhood of the reference KF, capped at 80
        (Tracking::UpdateLocalKeyFrames, Tracking.cc:1309/1362)."""
        if self.ref_kf < 0:
            return np.zeros(0, np.int64)
        nbrs = self.map.covisible_keyframes(self.ref_kf, min_weight=1,
                                            top=self.cfg.tracking.max_local_keyframes - 1)
        return np.unique(np.concatenate([[self.ref_kf], nbrs]))

    def _need_keyframe(self, rec: FrameRecord, n_inliers: int) -> bool:
        """NeedNewKeyFrame (Tracking.cc:1049-1140), RGB-D branch."""
        t = self.cfg.tracking
        if self.map.n_kf >= self.cfg.map.max_keyframes - 1:
            return False
        ref_obs = self.map.kf_obs_pt[self.ref_kf]
        ref_pts = ref_obs[ref_obs >= 0]
        # nMinObs = 3 unless the map is young (Tracking.cc:1070-1073).
        min_obs = 3 if self.map.n_kf > 2 else self.map.n_kf
        n_ref = int((self.map.point_observation_count(ref_pts)
                     >= min_obs).sum()) if len(ref_pts) else 0
        # close points tracked / untracked (bNeedToInsertClose).
        close = (rec.depth > 0) & (rec.depth < self.cfg.camera.depth_threshold)
        tracked_close = int((close & (rec.point_ids >= 0)).sum())
        untracked_close = int((close & (rec.point_ids < 0)).sum())
        need_close = tracked_close < 100 and untracked_close > 70

        c1a = self.state.frames_since_kf >= t.max_frames_between_kf
        c1b = self.state.frames_since_kf >= t.min_frames_between_kf
        # Relative-decay trigger: with a young map few points reach 3
        # observations, so the nRefMatches ratio alone under-inserts; decay
        # against the best inlier count seen since the last insertion catches
        # the same "tracking is wearing out" signal the reference's ratio
        # aims at.
        ratio = t.kf_ref_ratio_mono if self.cfg.sensor == "monocular" \
            else t.kf_ref_ratio_stereo
        decayed = n_inliers < ratio * self.state.peak_inliers_since_kf
        c2 = (n_inliers < n_ref * ratio or decayed
              or need_close) and n_inliers > t.min_inliers_kf
        return bool((c1a or (c1b and c2)) and n_inliers > t.min_inliers_kf)

    def _create_keyframe(self, rec: FrameRecord, stamp: float) -> None:
        """CreateNewKeyFrame (Tracking.cc:1142-1212): insert KF; spawn map
        points for close-depth keypoints without an association."""
        cam = self.cfg.camera
        spawn = rec.valid & (rec.point_ids < 0) & (rec.depth > 0) \
            & ~self._in_spawn_mask(rec)
        # Reference: create all closer than thDepth, else closest 100.
        close = spawn & (rec.depth < cam.depth_threshold)
        if close.sum() < 100:
            cand = np.nonzero(spawn)[0]
            order = cand[np.argsort(rec.depth[cand])][:100]
            sel = np.zeros_like(spawn)
            sel[order] = True
        else:
            sel = close
        point_ids = rec.point_ids.copy()
        if sel.any():
            # Pure numpy: eager jnp here has data-dependent shapes, which
            # forces a fresh XLA compile per keyframe (~0.5 s each through
            # the remote-compile relay).
            pts_w = _np_unproject_world(self.cfg.camera, rec.uv[sel],
                                        rec.depth[sel],
                                        self.state.pose_R, self.state.pose_t)
            ids = self.map.add_points(pts_w, rec.desc[sel],
                                      first_kf=self.map.n_kf,
                                      angles=rec.angle[sel])
            point_ids[np.nonzero(sel)[0][ids >= 0]] = ids[ids >= 0]

        kf = self.map.add_keyframe(
            self.state.pose_R, self.state.pose_t, stamp, rec.uv, rec.level,
            rec.angle, rec.desc, rec.depth, rec.ur, rec.valid, point_ids)
        new_ids = point_ids[point_ids >= 0]
        self.map.update_point_stats(new_ids)
        self.ref_kf = kf
        self.state.last_kf = kf
        self.state.frames_since_kf = 0
        self.last_frame = rec._replace(point_ids=point_ids)
        if self.on_keyframe:
            self.on_keyframe(kf)
            # Local BA may have refined this keyframe's pose; the tracker
            # must follow it or the next prediction fights the updated map
            # (the reference gets this for free by keeping frame poses
            # relative to the reference KF, Tracking.cc:558-574).
            self.state.pose_R = self.map.kf_R[kf].copy()
            self.state.pose_t = self.map.kf_t[kf].copy()
            self.state.has_velocity = False

    def _apply_adaptive_budget(self, n_inliers: int) -> None:
        """COEB adaptive feature budget (Tracking.cc:417-466): grow by 500 on
        loss or weak tracking (<=100 inliers), cap 2000; decay after 30
        consecutive OK frames or 10 strong (>200 inliers) frames."""
        t = self.cfg.tracking
        if not t.adaptive_budget:
            return
        st = self.state
        if st.mode == LOST or n_inliers <= t.weak_inlier_threshold:
            st.budget = min(st.budget + t.budget_step, t.budget_cap)
            st.strong_frames = 0
            return
        if n_inliers > t.strong_inlier_threshold:
            st.strong_frames += 1
        if st.consec_ok >= t.decay_success_window \
                or st.strong_frames >= t.decay_strong_window:
            floor = min(t.budget_floor, self.cfg.orb.n_features)
            st.budget = max(st.budget - t.budget_step, floor)
            st.consec_ok = 0
            st.strong_frames = 0

    # ------------------------------------------------------------------ #

    def _in_spawn_mask(self, rec: FrameRecord) -> np.ndarray:
        mask = getattr(self, "_spawn_mask", None)
        if mask is None:
            return np.zeros(rec.uv.shape[0], bool)
        u = np.clip(rec.uv[:, 0].round().astype(int), 0, mask.shape[1] - 1)
        v = np.clip(rec.uv[:, 1].round().astype(int), 0, mask.shape[0] - 1)
        return mask[v, u]

    def _to_record(self, fd: FrameData) -> FrameRecord:
        return FrameRecord(
            uv=np.asarray(fd.feats.uv), level=np.asarray(fd.feats.level),
            angle=np.asarray(fd.feats.angle), desc=np.asarray(fd.feats.desc),
            depth=np.asarray(fd.depth), ur=np.asarray(fd.ur),
            valid=np.asarray(fd.feats.valid),
            point_ids=np.full(fd.n, -1, np.int32))

    def _record_pose(self, stamp: float) -> None:
        self.trajectory.append((stamp, self.state.pose_R.copy(),
                                self.state.pose_t.copy()))
