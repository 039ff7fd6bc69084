"""Tracking: the per-frame state machine + jitted device tracking steps.

TPU-native re-design of `Tracking.cc` (SURVEY §2.1 Tracking row, call stack
§3.1).  The rare-path control flow (init, lost/relocalization, keyframe
creation) lives on the host (SURVEY §7.3 hard part 4), but the per-frame hot
path is ONE device program that carries its own state across frames:

  DevTrackState (pose, velocity, last-frame match ids) lives on the TPU;
  each `fused_step` consumes the previous state and emits the next, applying
  the inlier/motion gates in-graph (a failed frame keeps the previous pose).
  The host never has to read a frame's results before dispatching the next
  one — `Tracker.pipelined = True` overlaps the host round trip of frame
  i-1's decision scalars with frame i's device execution, hiding the
  tunnel/PCIe latency entirely (the reference hides the same latency by
  running mapping on a second thread, System.cc:100).

The reference runs three separate searches (motion model vs last frame, BoW
vs reference KF, projection vs local map).  Here both tracking stages are
the same jitted function against different point sets and radii: stage 1 vs
the last frame's map points with a wide window (TrackWithMotionModel,
Tracking.cc:933), stage 2 vs the covisibility local map with a tight window
(TrackLocalMap/SearchLocalPoints, Tracking.cc:996/1222).

The COEB adaptive feature budget (Tracking.cc:417-466) is a traced scalar:
growing it masks in more extraction quota — no extractor rebuild, no
recompile.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import camera as cam_ops
from ..geometry import se3
from ..geometry.se3 import SE3
from ..optim import pose_gn
from ..ops import brief, matching
from . import dynamic as dynamic_mod
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

    with jax.named_scope("hamming"):
        d = matching.hamming_matrix(frame.feats.signed_desc(),
                                    pt_signed_desc)
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
    with jax.named_scope("pose_gn"):
        opt = pose_gn.optimize_pose(pose_pred, X, frame.obs,
                                    frame.inv_sigma2, res.valid, cam,
                                    cfg.optimizer)
    idx = jnp.where(opt.inliers, res.idx, -1)
    return TrackStepResult(pose=opt.pose, point_idx=idx,
                           inliers=opt.inliers, n_inliers=opt.n_inliers,
                           n_matches=res.valid.sum().astype(jnp.int32))


# --------------------------------------------------------------------- #
# The fused per-frame device program with in-graph state transition.
# --------------------------------------------------------------------- #


class DevTrackState(NamedTuple):
    """Device-resident tracking state chained across frames.

    The host never needs to read this to dispatch the next frame — the
    pose prediction, velocity update, and last-frame candidate set are all
    computed in-graph (Tracking.cc:528's velocity model + the OK/LOST pose
    freeze, expressed as selects).
    """
    R: jnp.ndarray             # [3, 3] pose Tcw
    t: jnp.ndarray             # [3]
    vR: jnp.ndarray            # [3, 3] velocity (Tcur . Tlast^-1)
    vt: jnp.ndarray            # [3]
    has_vel: jnp.ndarray       # bool scalar
    ok: jnp.ndarray            # bool scalar — last frame tracked
    pids: jnp.ndarray          # [N] int32 global map-point id per kp (-1)


class StepScalars(NamedTuple):
    """Decision bundle fetched by the host.

    Packed into TWO arrays on purpose: through the remote-TPU relay every
    fetched leaf pays its own round trip, so a 13-leaf bundle costs ~13 RTTs;
    one f32 vector + the pids array costs two.
    """
    vec: jnp.ndarray           # [22] f32 — see _VEC_* layout below
    pids: jnp.ndarray          # [N] int32 matched point id per kp (-1 none)


# Layout of StepScalars.vec (counts are exact in f32 below 2^24).
_V_R = slice(0, 9)
_V_T = slice(9, 12)
_V_OK = 12
_V_INL1 = 13
_V_MATCH1 = 14
_V_INL2A = 15
_V_INL = 16
_V_NFEAT = 17
_V_DT = 18
_V_ANG = 19
_V_TRACKED_CLOSE = 20
_V_UNTRACKED_CLOSE = 21


class HostScalars(NamedTuple):
    """Unpacked host-side view of StepScalars."""
    R: np.ndarray
    t: np.ndarray
    ok: bool
    n_inl1: int
    n_match1: int
    n_inl2a: int
    n_inl: int
    n_feat: int
    dt: float
    ang: float
    tracked_close: int
    untracked_close: int
    pids: np.ndarray

    @staticmethod
    def unpack(vec: np.ndarray, pids: np.ndarray) -> "HostScalars":
        v = np.asarray(vec, np.float32)
        return HostScalars(
            R=v[_V_R].reshape(3, 3), t=v[_V_T],
            ok=bool(v[_V_OK] > 0.5),
            n_inl1=int(v[_V_INL1]), n_match1=int(v[_V_MATCH1]),
            n_inl2a=int(v[_V_INL2A]), n_inl=int(v[_V_INL]),
            n_feat=int(v[_V_NFEAT]), dt=float(v[_V_DT]),
            ang=float(v[_V_ANG]),
            tracked_close=int(v[_V_TRACKED_CLOSE]),
            untracked_close=int(v[_V_UNTRACKED_CLOSE]),
            pids=np.asarray(pids, np.int32))


class StepOut(NamedTuple):
    state: DevTrackState
    fd: FrameData              # device-resident; fetched only on KF creation
    scalars: StepScalars


def _select(pred, a, b):
    """Tree-select between two identically-shaped result pytrees."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def fused_step(fd: FrameData, state: DevTrackState, local_ids, local_valid,
               arena, gate_scale, cfg: SystemConfig) -> StepOut:
    """The whole per-frame pipeline as one jittable program.

    Args:
      fd: frame front-end output (RGB-D, stereo, or mono — built by the
        caller so all three sensors share this tail).
      state: previous frame's DevTrackState.
      local_ids/local_valid: covisibility local-map candidate ids
        (TrackLocalMap semantics; refreshed by the host on KF insertion).
      arena: device-resident point arrays (map_device.DeviceMap.points).
      gate_scale: traced float — motion-gate widening while LOST.
    """
    pos, sd, pv, pa, pn, pmin, pmax = arena
    t_cfg = cfg.tracking
    pose_last = SE3(state.R, state.t)
    pose_pred = _select(state.has_vel,
                        SE3(state.vR, state.vt).compose(pose_last), pose_last)

    # The four matching/solve stages run as ONE lax.scan over per-stage
    # parameters, not four inlined track_step calls: each inlined copy is
    # ~3 MB of compiled TPU text, and executable size is a first-order
    # cost on this backend (programs past the runtime's retention budget
    # are re-shipped to the device on every dispatch).  Stage semantics
    # (identical to the unrolled form):
    #   0: motion-model predict vs last frame's points, tight window
    #      (SearchByProjection(F, LastF), Tracking.cc:933-994);
    #   1: widened retry from the unpredicted pose, adopted only when
    #      stage 0 was weak and it found more inliers (Tracking.cc:
    #      956-966) — unconditional compute, conditional ADOPTION;
    #   2: wide pass over the covisibility local map from the stage-1
    #      pose (TrackLocalMap, Tracking.cc:996-1048);
    #   3: tight re-match from the refined pose; best of 2/3 wins.
    L = local_ids.shape[0]
    N = state.pids.shape[0]
    # The previous frame's candidate set is padded to the local-map length
    # below with [:L]; a local map SHORTER than the keypoint budget would
    # silently truncate stage-0/1 candidates.  Static shapes, so this is a
    # trace-time check (free at runtime).
    assert L >= N, (
        f"local map capacity ({L}) must be >= max keypoints ({N}): "
        "stage-0 tracking candidates would be truncated")
    s1_ids = jnp.concatenate(
        [jnp.clip(state.pids, 0), jnp.zeros(max(L - N, 0), jnp.int32)])[:L]
    s1_valid = jnp.concatenate(
        [state.pids >= 0, jnp.zeros(max(L - N, 0), bool)])[:L]

    r_mm = cfg.matcher.radius_motion_model
    stage_ids = jnp.stack([s1_ids, s1_ids, local_ids, local_ids])
    stage_idv = jnp.stack([s1_valid, s1_valid, local_valid, local_valid])
    # Stage-1 retry matches the HOST recovery search width (50 px,
    # Tracker._recover) and widens with the outage gate: a fast yaw can
    # shift features ~35 px in ONE frame with no velocity model yet, and
    # a search that only grows as fast as the offset never re-attaches.
    # The 50 px floor applies ONLY during an outage (gate widened) or
    # when no velocity model exists yet — with healthy tracking the
    # retry stays at 2*r_mm so repetitive texture can't alias into it.
    # Radii are mask parameters (traced floats), so widening is free.
    widen = jnp.minimum(gate_scale, 3.0)
    outage = (widen > 1.0) | ~state.has_vel
    r1 = jnp.where(outage, jnp.maximum(2.0 * r_mm, 50.0) * widen,
                   2.0 * r_mm)
    stage_r = jnp.stack([jnp.float32(r_mm), r1, 16.0 * widen,
                         jnp.float32(6.0)])
    # Pose source per stage: 0 = motion prediction, 1 = last pose
    # (retry), 2 = carry (previous stage's adopted pose).
    stage_src = jnp.asarray([0, 1, 2, 2], jnp.int32)
    stage_is_retry = jnp.asarray([False, True, False, False])
    stage_is_2a = jnp.asarray([False, False, True, False])

    def stage(carry, xs):
        pose_cur, n_cur = carry
        ids, idv, radius, src, is_retry, is_2a = xs
        pose_in = _select(src == 0, pose_pred,
                          _select(src == 1, pose_last, pose_cur))

        def compute(_):
            with jax.named_scope("track_stage"):
                return track_step(fd, pose_in, pos[ids], sd[ids],
                                  idv & pv[ids], pa[ids], pn[ids],
                                  pmin[ids], pmax[ids], radius, cfg)

        def skip(_):
            n_kp = state.pids.shape[0]
            return TrackStepResult(
                pose=pose_in, point_idx=jnp.full(n_kp, -1, jnp.int32),
                inliers=jnp.zeros(n_kp, bool), n_inliers=jnp.int32(0),
                n_matches=jnp.int32(0))

        # The retry stage can never be ADOPTED when stage 0 was healthy
        # (adopt needs n_cur < 30) — skip its Hamming matmul + GN solve
        # entirely then (~1/4 of the per-frame matching cost on the
        # common path; lax.cond executes one branch at runtime).
        res = jax.lax.cond(is_retry & (n_cur >= 30), skip, compute, None)
        adopt = jnp.where(
            is_retry, (n_cur < 30) & (res.n_inliers > n_cur),
            jnp.where(is_2a, res.n_inliers >= t_cfg.min_inliers_track,
                      True))
        pose_cur = _select(adopt, res.pose, pose_cur)
        n_cur = jnp.where(is_retry & adopt | ~is_retry & (src != 2),
                          res.n_inliers, n_cur)
        return (pose_cur, n_cur), res

    (_, _), ys = jax.lax.scan(
        stage, (pose_pred, jnp.int32(0)),
        (stage_ids, stage_idv, stage_r, stage_src, stage_is_retry,
         stage_is_2a))

    take = lambda i: jax.tree.map(lambda a: a[i], ys)
    y0, y1, y2a, y2 = take(0), take(1), take(2), take(3)
    res1 = _select((y0.n_inliers < 30) & (y1.n_inliers > y0.n_inliers),
                   y1, y0)
    res2a = y2a
    final = _select(y2.n_inliers >= y2a.n_inliers, y2, y2a)

    # In-graph gates: enough stage-1 and final inliers, and a plausible
    # motion (the host's old LOST branch, Tracking.cc:264-575; gate_scale
    # widens the allowance with the outage length so relocalization can
    # re-attach after the camera moved on).
    d = final.pose.compose(pose_last.inverse())
    dt = jnp.linalg.norm(d.t)
    ang = jnp.arccos(jnp.clip((jnp.trace(d.R) - 1.0) / 2.0, -1.0, 1.0))
    ok = ((res1.n_inliers >= t_cfg.min_inliers_track)
          & (final.n_inliers >= t_cfg.min_inliers_track)
          & (dt <= t_cfg.max_translation_per_frame * gate_scale)
          & (ang <= t_cfg.max_rotation_per_frame * gate_scale))

    new_pose = _select(ok, final.pose, pose_last)
    # Re-project onto SO(3): the state chains hundreds of f32 rotation
    # products across frames; without this the live pose's determinant
    # drifts (~1e-3/frame compounds) and gets baked into keyframes.
    from ..geometry import so3 as so3_mod
    new_pose = SE3(so3_mod.orthonormalize(new_pose.R), new_pose.t)
    # Velocity only valid when both this and the previous frame tracked
    # (after an outage the quotient is not a per-frame velocity).
    vel_ok = ok & state.ok
    new_vR = jnp.where(vel_ok, so3_mod.orthonormalize(d.R),
                       jnp.eye(3, dtype=d.R.dtype))
    new_vt = jnp.where(vel_ok, d.t, jnp.zeros_like(d.t))

    pids_frame = jnp.where(final.point_idx >= 0,
                           local_ids[jnp.clip(final.point_idx, 0)], -1)
    pids_frame = jnp.where(ok, pids_frame, -1)
    new_pids = jnp.where(ok, pids_frame, state.pids)

    # Keyframe-policy close-point statistics (NeedNewKeyFrame, RGB-D branch).
    close = fd.feats.valid & (fd.depth > 0) \
        & (fd.depth < cfg.camera.depth_threshold)
    has_pt = pids_frame >= 0
    new_state = DevTrackState(R=new_pose.R, t=new_pose.t, vR=new_vR,
                              vt=new_vt, has_vel=vel_ok, ok=ok,
                              pids=new_pids)
    f32 = jnp.float32
    vec = jnp.concatenate([
        new_pose.R.reshape(9), new_pose.t,
        jnp.stack([ok.astype(f32),
                   res1.n_inliers.astype(f32), res1.n_matches.astype(f32),
                   res2a.n_inliers.astype(f32), final.n_inliers.astype(f32),
                   fd.feats.valid.sum().astype(f32), dt, ang,
                   (close & has_pt).sum().astype(f32),
                   (close & ~has_pt).sum().astype(f32)])])
    scalars = StepScalars(vec=vec, pids=pids_frame)
    return StepOut(state=new_state, fd=fd, scalars=scalars)


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


@dataclass
class _FrameCtx:
    """One in-flight frame: device handles + host metadata.

    ``corr_R/corr_t`` accumulate world-side pose corrections (BA refinements
    applied between this frame's dispatch and its finalize) so the fetched
    pose can be re-based: pose' = pose ∘ corr."""
    out: StepOut
    stamp: float
    local_ids: np.ndarray      # host copy of the local-map candidate ids
    spawn_mask: Optional[np.ndarray]
    spawn_ok: Optional[jnp.ndarray] = None   # [N] device bool (dyn path)
    corr_R: Optional[np.ndarray] = None
    corr_t: Optional[np.ndarray] = None

    def apply_correction(self, dR: np.ndarray, dt: np.ndarray) -> None:
        if self.corr_R is None:
            self.corr_R, self.corr_t = dR.copy(), dt.copy()
        else:
            self.corr_R, self.corr_t = _np_compose(self.corr_R, self.corr_t,
                                                   dR, dt)


class Tracker:
    """Host orchestration for tracking (System + Tracking facade; local
    mapping / loop closing attach on top).

    Set ``pipelined = True`` to overlap the host decision tail of frame i-1
    with frame i's device execution (production/bench mode); the default
    finalizes each frame synchronously (deterministic for tests).
    """

    def __init__(self, cfg: SystemConfig, map_arena: Optional[MapArena] = None):
        self.cfg = cfg
        self.map = map_arena if map_arena is not None else MapArena(cfg)
        self.map.on_keyframe_removed.append(self._on_kf_removed)
        self.state = TrackerState(budget=cfg.orb.n_features)
        self.trajectory = []        # list of (stamp, R_cw, t_cw) at track time
        self.traj_relative = []     # (stamp, ref_kf, R_rel, t_rel, lost)
        self.ref_kf: int = -1
        self.on_keyframe = None     # callback(kf_id) — local mapping hook
        self.on_frame = None        # callback() each frame — mapper poll hook
        self.mapper_idle_fn = None  # callback() -> bool — mapper idleness
        self.reloc_fn = None        # callback(fd) -> RelocResult (BoW rel.)
        self.pipelined = False
        #: Pipelined mode: frames whose decision scalars are fetched in ONE
        #: bundled transfer.  The degraded-transfer mode of this backend
        #: costs ~70 ms LATENCY per device_get regardless of size
        #: (docs/TPU_BACKEND_NOTES.md §1), so per-frame scalar fetches cap
        #: the host pipeline at ~7 fps; batching B frames amortizes the
        #: latency to ~70/B ms/frame.  Decisions (keyframe policy, LOST)
        #: lag up to B frames — the same order of staleness the reference's
        #: mapper thread imposes on its map updates.
        self.finalize_batch = 1
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

        def step_rgbd(g, d, n, st, lids, lval, arena, gate):
            g, d = _cast(g, d)
            fd = frame_mod.process_rgbd(g, d, cfg.camera, cfg.orb,
                                        n_features=n)
            return fused_step(fd, st, lids, lval, arena, gate, cfg)

        def step_rgbd_masked(g, d, n, st, lids, lval, arena, gate, m, a):
            g, d = _cast(g, d)
            fd = frame_mod.process_rgbd(g, d, cfg.camera, cfg.orb,
                                        n_features=n, dynamic_mask=m,
                                        area_mode=a)
            return fused_step(fd, st, lids, lval, arena, gate, cfg)

        def step_stereo(gl, gr, n, st, lids, lval, arena, gate):
            fd = frame_mod.process_stereo(gl.astype(jnp.float32),
                                          gr.astype(jnp.float32),
                                          cfg.camera, cfg.orb, n_features=n)
            return fused_step(fd, st, lids, lval, arena, gate, cfg)

        def step_rgbd_dyn(g, d, n, st, dynst, boxes, seed, lids, lval,
                          arena, gate):
            """Fully fused dynamic-path frame: extraction (masked by the
            previous frame's sticky mask / area flag), in-graph motion
            check + box classification + keypoint culling, then the
            standard tracking tail — one device program, zero host syncs
            (the COEB per-frame workload of SURVEY §3.1)."""
            g, dimg = _cast(g, d)
            fd = frame_mod.process_rgbd(
                g, dimg, cfg.camera, cfg.orb, n_features=n,
                dynamic_mask=dynst.sticky > 0, area_mode=dynst.area_flag)
            key = jax.random.PRNGKey(seed)
            fd2, spawn_ok, dynst2, info = dynamic_mod.dynamic_step(
                fd, g, dynst, boxes, key, cfg)
            out = fused_step(fd2, st, lids, lval, arena, gate, cfg)
            return out, spawn_ok, dynst2, info

        self._jit_step = jax.jit(step_rgbd)
        self._jit_step_masked = jax.jit(step_rgbd_masked)
        self._jit_step_stereo = jax.jit(step_stereo)
        self._jit_step_dyn = jax.jit(step_rgbd_dyn)
        # The map's point arrays live device-resident with incremental row
        # sync (map_device.py); per-call traffic is the candidate id list
        # plus changed rows only.
        self._jit_track = jax.jit(
            lambda fd, pp, pos, sd, pv, pa, pn, pmin, pmax, ids, idv, r:
            track_step(fd, pp, pos[ids], sd[ids], idv & pv[ids], pa[ids],
                       pn[ids], pmin[ids], pmax[ids], r, cfg))

        self._dev_state: Optional[DevTrackState] = None
        self._dyn_state: Optional[dynamic_mod.DynState] = None
        self.last_dyn_info = None     # device DynInfo of the newest frame
        self._dyn_seed = 0
        self._local_np = np.full(LOCAL_MAP_CAP, -1, np.int32)
        self._local_dev = None
        self._local_version = (-1, -1)     # (ref_kf, map.version)
        self._pending: List[_FrameCtx] = []
        self._last_ctx: Optional[_FrameCtx] = None
        self._last_frame: Optional[FrameRecord] = None
        self._last_pids: Optional[np.ndarray] = None
        # Localization-only mode (System::ActivateLocalizationMode,
        # System.cc:184-216): no keyframe insertion, no point spawning —
        # pure VO against the frozen map.
        self.localization_only = False

    def _on_kf_removed(self, k: int) -> None:
        """Re-anchor every reference to a culled keyframe BEFORE its id is
        recycled (MapArena.remove_keyframe listener): trajectory records
        referencing k fold the cull-relative pose (mTcp) into their own
        relative pose and re-anchor to the cull parent; the live reference
        keyframe falls back to the parent too."""
        rel = self.map.kf_cull_rel.get(k)
        if rel is None:                       # defensive: nothing to fold
            parent, Rcp, tcp = 0, np.eye(3, dtype=np.float32), \
                np.zeros(3, np.float32)
        else:
            parent, Rcp, tcp = rel
        pseq = int(self.map.kf_seq[parent])
        for i, (stamp, ref, _seq, R_rel, t_rel, lost) in \
                enumerate(self.traj_relative):
            if ref == k:
                self.traj_relative[i] = (
                    stamp, parent, pseq, R_rel @ Rcp, R_rel @ tcp + t_rel,
                    lost)
        if self.ref_kf == k:
            self.ref_kf = int(parent)

    def freeze_trajectory(self) -> None:
        """Bake current map poses into the relative records (called before
        a map reset invalidates the reference keyframes)."""
        self.traj_relative = [(s, -1, -1, R, t, lost)
                              for (s, R, t), (_, _, _, _, _, lost)
                              in zip(self.export_trajectory(),
                                     self.traj_relative)]

    def reset_runtime(self) -> None:
        """Drop all in-flight device state (system reset / map swap)."""
        self._pending.clear()
        self._last_ctx = None
        self._last_frame = None
        self._last_pids = None
        self._dev_state = None
        self._dyn_state = None
        self._local_dev = None
        self._local_version = (-1, -1)
        self._mono_ref = None

    # ------------------------------------------------------------------ #
    # last_frame compatibility: a lazily-materialized FrameRecord.
    # ------------------------------------------------------------------ #

    @property
    def last_frame(self) -> Optional[FrameRecord]:
        if self._last_frame is None and self._last_ctx is not None:
            rec = self._fetch_record(self._last_ctx.out.fd)
            pids = self._last_pids if self._last_pids is not None \
                else rec.point_ids
            self._last_frame = rec._replace(point_ids=pids)
        return self._last_frame

    @last_frame.setter
    def last_frame(self, rec: Optional[FrameRecord]) -> None:
        self._last_frame = rec
        if rec is not None:
            self._last_pids = np.asarray(rec.point_ids, np.int32)
            self._dev_state = None      # reseed device state from host
        else:
            self._last_pids = None
            self._dev_state = None

    # ------------------------------------------------------------------ #

    def process_frame(self, gray, depth, stamp: float,
                      dynamic_mask=None, area_mode: bool = False,
                      spawn_mask=None, boxes_dev=None):
        """Track one frame.  Returns (state_str, n_inliers).

        ``depth``: [H, W] metres (or raw uint16, scaled in-graph) for RGB-D;
        pass None for monocular.
        ``spawn_mask``: optional [H, W] bool — regions where map points must
        not be CREATED (keypoints there may still match existing points).
        ``boxes_dev``: optional [B, 4] device array of detector boxes —
        selects the fully fused dynamic path (in-graph motion check +
        classification + culling; cfg.dynamic.motion_check == "feature").

        In pipelined mode the returned tuple describes frame i-1 (the
        newest finalized frame); call ``flush()`` after the last frame.
        """
        spawn = None if spawn_mask is None else np.asarray(spawn_mask)
        budget = jnp.int32(self.state.budget)

        if self.state.mode == NOT_INITIALIZED:
            self.flush()
            dep = depth if depth is not None \
                else np.zeros(np.asarray(gray).shape, np.float32)
            if dynamic_mask is not None:
                fd: FrameData = self._jit_frontend_masked(
                    gray, dep, budget, dynamic_mask, jnp.bool_(area_mode))
            else:
                fd = self._jit_frontend(gray, dep, budget)
            self._spawn_mask = spawn
            if self.cfg.sensor == "monocular":
                n = self._initialize_monocular(fd, stamp)
            else:
                n = self._initialize(fd, stamp)
            self._record_pose(stamp)
            return self.state.mode, n

        ctx = self._dispatch(gray, depth, budget, stamp, spawn,
                             dynamic_mask, area_mode, boxes_dev)
        return self._advance(ctx)

    def process_frame_stereo(self, gray_left, gray_right, stamp: float):
        """Stereo entry: same fused tail as RGB-D (restores the stereo path
        the fork disabled, SURVEY §2.5; Frame.cc:92-95)."""
        budget = jnp.int32(self.state.budget)
        if self.state.mode == NOT_INITIALIZED:
            self.flush()
            fd = jax.jit(lambda a, b, n: frame_mod.process_stereo(
                a.astype(jnp.float32), b.astype(jnp.float32),
                self.cfg.camera, self.cfg.orb, n_features=n))(
                    gray_left, gray_right, budget)
            self._spawn_mask = None
            n = self._initialize(fd, stamp)
            self._record_pose(stamp)
            return self.state.mode, n

        self._ensure_state()
        lids, lval = self._refresh_local_map()
        arena = self._device_map()
        gate = self._gate_scale()
        out = self._jit_step_stereo(gray_left, gray_right, budget,
                                    self._dev_state, lids, lval, arena, gate)
        ctx = self._post_dispatch(out, stamp, None)
        return self._advance(ctx)

    # ------------------------------------------------------------------ #

    def _gate_scale(self):
        s = 1.0 + (self.state.n_lost_frames if self.state.mode == LOST else 0)
        return jnp.float32(s)

    def _dispatch(self, gray, depth, budget, stamp, spawn_mask,
                  dynamic_mask, area_mode, boxes_dev=None) -> _FrameCtx:
        self._ensure_state()
        lids, lval = self._refresh_local_map()
        arena = self._device_map()
        gate = self._gate_scale()
        dep = depth if depth is not None \
            else np.zeros(np.asarray(gray).shape, np.float32)
        if boxes_dev is not None:
            if self._dyn_state is None:
                self._dyn_state = dynamic_mod.init_dyn_state(self.cfg)
            self._dyn_seed += 1
            out, spawn_ok, self._dyn_state, self.last_dyn_info = \
                self._jit_step_dyn(gray, dep, budget, self._dev_state,
                                   self._dyn_state, boxes_dev,
                                   jnp.uint32(self._dyn_seed),
                                   lids, lval, arena, gate)
            return self._post_dispatch(out, stamp, spawn_mask,
                                       spawn_ok=spawn_ok)
        if dynamic_mask is not None:
            out = self._jit_step_masked(gray, dep, budget, self._dev_state,
                                        lids, lval, arena, gate,
                                        jnp.asarray(dynamic_mask),
                                        jnp.bool_(area_mode))
        else:
            out = self._jit_step(gray, dep, budget, self._dev_state,
                                 lids, lval, arena, gate)
        return self._post_dispatch(out, stamp, spawn_mask)

    def _post_dispatch(self, out: StepOut, stamp, spawn_mask,
                       spawn_ok=None) -> _FrameCtx:
        self._dev_state = out.state
        # Start moving the decision scalars to the host while the device
        # (or the next frame) runs.
        for leaf in jax.tree.leaves(out.scalars):
            try:
                leaf.copy_to_host_async()
            except AttributeError:      # older jax Array types
                break
        return _FrameCtx(out=out, stamp=stamp, local_ids=self._local_np,
                         spawn_mask=spawn_mask, spawn_ok=spawn_ok)

    def _advance(self, ctx: _FrameCtx):
        """Finalize either this frame (sync) or the previous one(s)
        (pipelined; with ``finalize_batch`` > 1 the oldest B frames are
        finalized together from one bundled scalar transfer)."""
        if not self.pipelined:
            res = self._finalize(ctx)
            if self.on_frame:
                self.on_frame()
            return res
        self._pending.append(ctx)
        res = (self.state.mode, -1)
        B = max(1, self.finalize_batch)
        if len(self._pending) > B:
            raws = self._prefetch(self._pending[:B]) if B > 1 else [None]
            for raw in raws:
                if not self._pending:
                    break          # recovery drained the in-flight frames
                res = self._finalize(self._pending.pop(0), raw=raw)
        if self.on_frame:
            self.on_frame()
        return res

    def _prefetch(self, batch):
        """ONE bundled device->host transfer for a batch of frames'
        decision scalars (2 leaves total instead of 2 per frame)."""
        vec = jnp.stack([c.out.scalars.vec for c in batch])
        pid = jnp.stack([c.out.scalars.pids for c in batch])
        v, p = jax.device_get((vec, pid))
        return [StepScalars(vec=v[i], pids=p[i]) for i in range(len(batch))]

    def flush(self):
        """Finalize all in-flight frames (pipelined mode)."""
        res = None
        while self._pending:
            res = self._finalize(self._pending.pop(0))
        return res

    # ------------------------------------------------------------------ #

    def _ensure_state(self) -> None:
        """(Re)build the device state from host values (after init, reset,
        recovery, or checkpoint restore)."""
        if self._dev_state is not None:
            return
        st = self.state
        N = self.cfg.orb.max_keypoints
        pids = self._last_pids if self._last_pids is not None \
            else np.full(N, -1, np.int32)
        self._dev_state = DevTrackState(
            R=jnp.asarray(st.pose_R), t=jnp.asarray(st.pose_t),
            vR=jnp.eye(3, dtype=jnp.float32), vt=jnp.zeros(3, jnp.float32),
            has_vel=jnp.bool_(False), ok=jnp.bool_(st.mode == OK),
            pids=jnp.asarray(pids[:N]))

    def apply_world_correction(self, dR: np.ndarray, dt: np.ndarray) -> None:
        """Right-compose a world-side pose correction (asynchronous BA /
        loop closure moved the map) into the live tracking state.  The
        velocity Tcur∘Tlast^-1 is invariant under right-composition, so it
        is kept."""
        st = self.state
        st.pose_R, st.pose_t = _np_compose(st.pose_R, st.pose_t, dR, dt)
        if self._dev_state is not None:
            cur_R = np.asarray(self._dev_state.R)
            cur_t = np.asarray(self._dev_state.t)
            cR, ct = _np_compose(cur_R, cur_t, dR, dt)
            self._dev_state = self._dev_state._replace(
                R=jnp.asarray(cR), t=jnp.asarray(ct))
        for ctx in self._pending:
            ctx.apply_correction(dR, dt)

    def _set_state_pose(self, R, t, ok: bool = True, pids=None) -> None:
        """Overwrite the device state's pose (KF-BA adoption / recovery)."""
        st = self._dev_state
        kw = dict(R=jnp.asarray(R, jnp.float32).reshape(3, 3),
                  t=jnp.asarray(t, jnp.float32).reshape(3),
                  vR=jnp.eye(3, dtype=jnp.float32),
                  vt=jnp.zeros(3, jnp.float32),
                  has_vel=jnp.bool_(False), ok=jnp.bool_(ok))
        if pids is not None:
            kw["pids"] = jnp.asarray(pids, jnp.int32)
        self._dev_state = st._replace(**kw)

    def _refresh_local_map(self):
        """Covisibility local map, recomputed only when the reference KF or
        the arena changed (it is invariant between keyframes)."""
        key = (self.ref_kf, self.map.version)
        if self._local_dev is None or self._local_version != key:
            local_kfs = self._local_keyframes()
            ids = self.map.local_map_points(local_kfs, LOCAL_MAP_CAP)
            self._local_np = ids
            self._local_dev = (
                jnp.asarray(np.clip(ids, 0, None).astype(np.int32)),
                jnp.asarray(ids >= 0))
            self._local_version = key
        return self._local_dev

    # ------------------------------------------------------------------ #

    def _finalize(self, ctx: _FrameCtx, raw=None) -> tuple:
        """Host decision tail for one frame: LOST handling, bookkeeping,
        keyframe policy.  Reads only the small scalar bundle (prefetched
        in batched-pipelined mode) unless the frame becomes a keyframe or
        needs recovery."""
        st = self.state
        cfg = self.cfg
        if raw is None:
            raw = jax.device_get(ctx.out.scalars)
        sc = HostScalars.unpack(raw.vec, raw.pids)
        if ctx.corr_R is not None:
            # Re-base onto corrections applied while this frame was in
            # flight (pipelined mode; see _FrameCtx).
            Rn, tn = _np_compose(sc.R, sc.t, ctx.corr_R, ctx.corr_t)
            sc = sc._replace(R=Rn.astype(np.float32),
                             t=tn.astype(np.float32))
        self._last_ctx = ctx
        self._last_frame = None         # lazy refetch if someone asks
        n_inliers = sc.n_inl
        ok = sc.ok
        self.debug_info = {
            "s1_inl": sc.n_inl1, "s1_match": sc.n_match1,
            "s2a_inl": sc.n_inl2a, "s2_inl": sc.n_inl,
            "n_local": int((ctx.local_ids >= 0).sum()),
        }
        self.debug_motion = (sc.dt, sc.ang)

        if not ok:
            recovered = self._recover(ctx)
            if recovered is None:
                st.mode = LOST
                st.n_lost_frames += 1
                st.consec_ok = 0
                self._record_pose(ctx.stamp)
                self._bump_frame(0)
                return LOST, 0
            sc, n_inliers = recovered

        st.mode = OK
        st.consec_ok += 1
        st.n_lost_frames = 0
        st.pose_R = np.asarray(sc.R, np.float32).reshape(3, 3)
        st.pose_t = np.asarray(sc.t, np.float32).reshape(3)

        # Found/visible bookkeeping for culling.  The match list may be one
        # mapping-stage stale (pipelined mode) — follow fuse redirects and
        # drop culled points before using it.
        pids = self.map.resolve_ids(sc.pids)
        sc = sc._replace(pids=pids)
        self._last_pids = pids
        matched = pids[pids >= 0]
        self.map.pt_found[matched] += 1
        lids = ctx.local_ids
        self.map.pt_visible[lids[lids >= 0]] += 1

        st.frames_since_kf += 1
        st.peak_inliers_since_kf = max(st.peak_inliers_since_kf, n_inliers)
        if not self.localization_only and self._need_keyframe(
                sc.tracked_close, sc.untracked_close, n_inliers):
            rec = self._fetch_record(ctx.out.fd)
            rec = rec._replace(point_ids=pids)
            self._spawn_mask = ctx.spawn_mask
            self._spawn_vec = None if ctx.spawn_ok is None \
                else np.asarray(jax.device_get(ctx.spawn_ok))
            self._create_keyframe(rec, ctx.stamp, fd_dev=ctx.out.fd)
            st.peak_inliers_since_kf = n_inliers
        self._record_pose(ctx.stamp)
        self._bump_frame(n_inliers)
        return OK, n_inliers

    def _bump_frame(self, n_inliers: int) -> None:
        self._apply_adaptive_budget(n_inliers)
        self.state.frame_idx += 1

    def _recover(self, ctx: _FrameCtx):
        """In-graph gates failed: BoW relocalization, else wide search
        against the reference KF (Tracking.cc:1417 / 823), then local-map
        re-tracking.  Runs against the newest frame's device-resident fd;
        repairs the device state on success."""
        cfg = self.cfg
        # In pipelined mode later frames are already in flight from the
        # frozen pose; recover on the NEWEST frame and drop the rest (they
        # were dispatched before the failure was visible — the reference
        # similarly skips frames while relocalization runs).
        while self._pending:
            newer = self._pending.pop(0)
            self._record_pose(ctx.stamp)
            ctx = newer
        fd = ctx.out.fd
        pose_cand = None
        relocalized = False
        if self.reloc_fn is not None:
            rr = self.reloc_fn(fd)
            if rr.ok:
                pose_cand = SE3(jnp.asarray(rr.R), jnp.asarray(rr.t))
                relocalized = True
        if pose_cand is None and self.ref_kf >= 0:
            ref_ids = self.map.kf_obs_pt[self.ref_kf]
            ref_ids = self._pad_ids(ref_ids[ref_ids >= 0],
                                    self.cfg.orb.max_keypoints)
            pose_last = SE3(jnp.asarray(self.state.pose_R),
                            jnp.asarray(self.state.pose_t))
            res = self._run_track(fd, pose_last, ref_ids, 50.0)
            if int(res.n_inliers) < cfg.tracking.min_inliers_track:
                return None
            pose_cand = res.pose
        if pose_cand is None:
            return None
        local_ids = ctx.local_ids
        res2a = self._run_track(fd, pose_cand, local_ids, 16.0)
        pose = res2a.pose if int(res2a.n_inliers) \
            >= cfg.tracking.min_inliers_track else pose_cand
        res2 = self._run_track(fd, pose, local_ids, 6.0)
        if int(res2.n_inliers) < int(res2a.n_inliers):
            res2 = res2a
        n = int(res2.n_inliers)
        if n < cfg.tracking.min_inliers_track and not relocalized:
            return None
        # Repair the device state so the next dispatch predicts from the
        # recovered pose and candidate set.
        idx = np.asarray(res2.point_idx)
        pids = np.where(idx >= 0, local_ids[np.clip(idx, 0, None)], -1)
        pids = pids.astype(np.int32)
        R = np.asarray(res2.pose.R)
        t = np.asarray(res2.pose.t)
        self._set_state_pose(R, t, ok=True, pids=pids)
        sc = HostScalars(
            R=R, t=t, ok=True, n_inl1=n, n_match1=n,
            n_inl2a=int(res2a.n_inliers), n_inl=n, n_feat=0,
            dt=0.0, ang=0.0, tracked_close=0, untracked_close=0, pids=pids)
        self._last_ctx = ctx
        return sc, n

    def _fetched_record(self, fd_np) -> FrameRecord:
        """FrameRecord from an already-fetched (numpy) FrameData."""
        return FrameRecord(
            uv=np.asarray(fd_np.feats.uv), level=np.asarray(fd_np.feats.level),
            angle=np.asarray(fd_np.feats.angle),
            desc=np.asarray(fd_np.feats.desc), depth=np.asarray(fd_np.depth),
            ur=np.asarray(fd_np.ur), valid=np.asarray(fd_np.feats.valid),
            point_ids=np.full(fd_np.depth.shape[0], -1, np.int32))

    def _fetch_record(self, fd_dev: FrameData) -> FrameRecord:
        """Fetch a device FrameData as TWO transfers, not ten.

        Device->host transfers on the degraded client cost ~70-140 ms of
        LATENCY each regardless of size (docs/TPU_BACKEND_NOTES.md §1);
        a FrameData pytree has ~10 leaves, so a naive device_get per
        keyframe cost ~1 s.  Pack the float fields into one [N, 7] array
        in-graph and ship (floats, packed descriptors) together."""
        if not hasattr(self, "_jit_pack_fd"):
            def pack(fd):
                f = fd.feats
                cols = jnp.stack([f.level.astype(jnp.float32),
                                  f.angle, fd.depth, fd.ur,
                                  f.valid.astype(jnp.float32)], axis=-1)
                return jnp.concatenate([f.uv, cols], axis=-1), f.desc
            self._jit_pack_fd = jax.jit(pack)
        flo, desc = jax.device_get(self._jit_pack_fd(fd_dev))
        n = flo.shape[0]
        return FrameRecord(
            uv=flo[:, 0:2], level=flo[:, 2].astype(np.int32),
            angle=flo[:, 3], desc=np.asarray(desc), depth=flo[:, 4],
            ur=flo[:, 5], valid=flo[:, 6] > 0.5,
            point_ids=np.full(n, -1, np.int32))

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
        self._last_frame = rec._replace(point_ids=point_ids)
        self._last_pids = point_ids
        self.ref_kf = kf
        self.state.last_kf = kf
        self.state.frames_since_kf = 0
        self.state.mode = OK
        self._dev_state = None
        if self.on_keyframe:
            self.on_keyframe(kf)
        return n_feat

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
        self._last_frame = cur_rec._replace(point_ids=pids2)
        self._last_pids = pids2
        self.ref_kf = kf2
        self.state.last_kf = kf2
        self.state.frames_since_kf = 0
        self.state.mode = OK
        self._mono_ref = None
        self._dev_state = None
        if self.on_keyframe:
            self.on_keyframe(kf1)
            self.on_keyframe(kf2)
            self.state.pose_R = self.map.kf_R[kf2].copy()
            self.state.pose_t = self.map.kf_t[kf2].copy()
        return int(res.valid.sum())

    # ------------------------------------------------------------------ #

    def _device_map(self):
        """Device-resident point arrays, incrementally synced (map_device)."""
        from . import map_device
        return map_device.sync(self.map, self.cfg).points

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

    def _need_keyframe(self, tracked_close: int, untracked_close: int,
                       n_inliers: int) -> bool:
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
        need_close = tracked_close < 100 and untracked_close > 70

        c1a = self.state.frames_since_kf >= t.max_frames_between_kf
        # The reference throttles insertion on mapper idleness
        # (bLocalMappingIdle, Tracking.cc:1075): without it the tracker
        # floods a busy mapper with a keyframe per frame.  c1a (max-interval)
        # overrides — the mapper aborts its pending BA for it
        # (LocalMapping.cc:119 / process_keyframe's skip_ba).
        mapper_idle = self.mapper_idle_fn() if self.mapper_idle_fn else True
        c1b = (self.state.frames_since_kf >= t.min_frames_between_kf
               and mapper_idle)
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

    def _create_keyframe(self, rec: FrameRecord, stamp: float,
                         fd_dev: Optional[FrameData] = None) -> None:
        """CreateNewKeyFrame (Tracking.cc:1142-1212): insert KF; spawn map
        points for close-depth keypoints without an association."""
        cam = self.cfg.camera
        spawn = rec.valid & (rec.point_ids < 0) & (rec.depth > 0) \
            & ~self._in_spawn_mask(rec)
        vec = getattr(self, "_spawn_vec", None)
        if vec is not None:
            spawn &= vec
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
        if fd_dev is not None:
            dm = self.map.__dict__.get("_devmap")
            if dm is not None:
                dm.adopt_keyframe_row(self.map, kf, fd_dev)
        new_ids = point_ids[point_ids >= 0]
        self.map.update_point_stats(new_ids)
        self.ref_kf = kf
        self.state.last_kf = kf
        self.state.frames_since_kf = 0
        self._last_frame = rec._replace(point_ids=point_ids)
        self._last_pids = point_ids
        # The device state's candidate set should include the newly spawned
        # points so the next frame can match them.
        if self._dev_state is not None:
            self._dev_state = self._dev_state._replace(
                pids=jnp.asarray(point_ids))
        if self.on_keyframe:
            old_R, old_t = self.map.kf_R[kf].copy(), self.map.kf_t[kf].copy()
            self.on_keyframe(kf)
            # Synchronous mapping may have refined this keyframe's pose; the
            # tracker must follow it or the next prediction fights the
            # updated map (the reference gets this for free by keeping
            # frame poses relative to the reference KF, Tracking.cc:558-574).
            # Pipelined mode deliberately applies NO correction to the
            # in-flight state or pending frames: the wide stage-2 re-match +
            # pose GN re-bases the live pose onto the refined map within one
            # frame anyway, while out-of-band pose surgery measurably
            # triggers a BA/tracker feedback loop (each BA delta compounds
            # the previous one).  Large corrections (loop closure) go
            # through apply_world_correction explicitly.
            new_R, new_t = self.map.kf_R[kf], self.map.kf_t[kf]
            if not self.pipelined:
                self.state.pose_R = new_R.copy()
                self.state.pose_t = new_t.copy()
                self._set_state_pose(new_R, new_t, ok=True,
                                     pids=self._last_pids)

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
        # Loop-consistent record: pose RELATIVE to the reference keyframe
        # (Tcr, Tracking.cc:558-574) so pose-graph / global-BA corrections
        # retroactively fix the exported trajectory (System.cc:331-401).
        if self.ref_kf >= 0:
            Rr, tr = self.map.kf_R[self.ref_kf], self.map.kf_t[self.ref_kf]
            R_rel = self.state.pose_R @ Rr.T
            t_rel = self.state.pose_t - R_rel @ tr
            self.traj_relative.append(
                (stamp, self.ref_kf, int(self.map.kf_seq[self.ref_kf]),
                 R_rel, t_rel, self.state.mode == LOST))
        else:
            self.traj_relative.append(
                (stamp, -1, -1, self.state.pose_R.copy(),
                 self.state.pose_t.copy(), self.state.mode == LOST))

    def export_trajectory(self):
        """Compose the relative records against the CURRENT keyframe poses
        (System::SaveTrajectoryTUM semantics): loop corrections applied
        after tracking are reflected in every earlier frame."""
        out = []
        for stamp, ref, ref_seq, R_rel, t_rel, lost in self.traj_relative:
            if ref < 0:
                out.append((stamp, R_rel, t_rel))
                continue
            if int(self.map.kf_seq[ref]) != ref_seq:
                # The slot was recycled AND the cull listener never
                # re-anchored this record — composing against the new
                # tenant's pose would silently corrupt the trajectory.
                raise RuntimeError(
                    f"trajectory record at t={stamp} references keyframe id "
                    f"{ref} whose slot was recycled (seq {ref_seq} -> "
                    f"{int(self.map.kf_seq[ref])})")
            Rr, tr, found = self.map.anchored_pose(int(ref))
            if not found:
                raise RuntimeError(
                    f"trajectory record at t={stamp}: anchor chain for "
                    f"culled keyframe {ref} could not be resolved")
            out.append((stamp, R_rel @ Rr, R_rel @ tr + t_rel))
        return out
