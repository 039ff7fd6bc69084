"""Zero-sync realtime SLAM: the entire per-frame pipeline — COEB dynamic
front-end, tracking, keyframe policy, keyframe creation, map-point
spawning and windowed local bundle adjustment — as ONE device program
with ZERO device-to-host transfers in the steady state.

Why zero-sync is the design point (not just "few syncs"): on this
backend the FIRST device->host readback permanently switches the client
into a synchronized transfer mode where every dispatch costs ~24 ms and
host<->device bandwidth drops ~150x (measured: trivial-op round trip
0.05 ms -> 24 ms after one np.asarray of any device array; 4 GB/s ->
27 MB/s).  A SLAM loop that reads back per-frame scalars therefore pays
~50-80 ms/frame in pure transfer stalls.  This module never reads back:
the host loop only uploads sensor frames and dispatches; trajectory,
keyframes and the map accumulate in device arenas and are fetched ONCE
at `finish()`.  On hardware without the relay the same design still
wins — host round trips are the one latency XLA cannot fuse away.

Reference mapping (this is the reference's tracking thread + local
mapping thread, SURVEY §3.1/§3.2, fused into a single per-frame device
program):
  * Tracking::Track + NeedNewKeyFrame (Tracking.cc:264-575, 1049) —
    reused from `tracking.fused_step` + an in-graph keyframe policy.
  * Tracking::CreateNewKeyFrame + stereo/RGB-D point spawning
    (Tracking.cc:1142-1212) — `_create_keyframe` below: chunked point
    arenas, one-hot matmuls instead of scatters (data-dependent
    scatters serialize on TPU).
  * LocalMapping::Run's CreateNewMapPoints/LocalBundleAdjustment
    (LocalMapping.cc:208, Optimizer.cc:453) — a temporal-window
    `optim.local_ba.optimize_local_ba` fed entirely from device arenas;
    the observation table is built by pid-compare matmuls, not host
    bookkeeping.  RGB-D depth makes spawn-from-depth the dominant point
    source (Tracking.cc:1142-1212); epipolar triangulation, fuse and
    cull remain available in the host-orchestrated mode
    (`slam.local_mapping`), which also serves loop closing and
    relocalization.
  * COEB dynamic front-end (Frame.cc:311-393, ORBextractor.cc:
    1116-1207) — `dynamic.dynamic_step`, already in-graph.

Capacity model: keyframes and points are bump-allocated (no recycling);
`RTLimits` bounds one realtime session, sized for minutes of capture.
The host-orchestrated mode remains the long-horizon / loop-closing
path; `finish()` hands the arenas over for offline refinement.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry.se3 import SE3
from ..ops import brief
from ..optim import local_ba
from . import dynamic as dynamic_mod
from . import frame as frame_mod
from .tracking import (DevTrackState, StepScalars, fused_step,
                       _V_INL, _V_INL1, _V_TRACKED_CLOSE,
                       _V_UNTRACKED_CLOSE, _V_OK)


class RTLimits(NamedTuple):
    """Static capacities of one realtime session (compile-time shapes)."""
    max_kf: int = 64          # keyframe arena rows
    spawn_per_kf: int = 256   # point-chunk size S; point id = kf*S + slot
    ba_window: int = 8        # keyframes jointly adjusted per insertion
    local_window: int = 12    # keyframe chunks visible to tracking
    max_frames: int = 4096    # trajectory ring capacity


class RTState(NamedTuple):
    """Everything the pipeline needs, resident on device."""
    track: DevTrackState            # pose/velocity/ok/pids chain
    dyn: dynamic_mod.DynState       # COEB sticky mask state
    # keyframe arena (row per KF)
    kf_R: jnp.ndarray               # [K, 3, 3]
    kf_t: jnp.ndarray               # [K, 3]
    kf_valid: jnp.ndarray           # [K] bool
    kf_obs: jnp.ndarray             # [K, N, 3] (u, v, ur) per keypoint
    kf_w: jnp.ndarray               # [K, N] inv_sigma2
    kf_kp_valid: jnp.ndarray        # [K, N] bool
    kf_pid: jnp.ndarray             # [K, N] int32 flat point id (-1)
    kf_frame: jnp.ndarray           # [K] int32 frame index of insertion
    n_kf: jnp.ndarray               # int32
    # point arena, chunked: point (k, s) lives at flat row k*S + s
    pt_pos: jnp.ndarray             # [K*S, 3]
    pt_desc: jnp.ndarray            # [K*S, 32] uint8 packed BRIEF
    pt_valid: jnp.ndarray           # [K*S] bool
    pt_angle: jnp.ndarray           # [K*S]
    pt_normal: jnp.ndarray          # [K*S, 3]
    pt_mind: jnp.ndarray            # [K*S]
    pt_maxd: jnp.ndarray            # [K*S]
    # trajectory ring (pose written every frame; fetched once at finish)
    traj: jnp.ndarray               # [F, 13] (ok, R.flat, t)
    frame_idx: jnp.ndarray          # int32
    # keyframe-policy counters (Tracking.h:89-98 equivalents)
    frames_since_kf: jnp.ndarray    # int32
    peak_inliers: jnp.ndarray       # int32 since last KF
    budget: jnp.ndarray             # int32 adaptive feature budget
    consec_ok: jnp.ndarray          # int32
    strong_frames: jnp.ndarray      # int32
    n_lost: jnp.ndarray             # int32 consecutive lost frames


def init_state(cfg: SystemConfig, lim: RTLimits) -> RTState:
    N = cfg.orb.max_keypoints
    K, S, F = lim.max_kf, lim.spawn_per_kf, lim.max_frames
    P = K * S
    f32, i32 = jnp.float32, jnp.int32
    track = DevTrackState(
        R=jnp.eye(3, dtype=f32), t=jnp.zeros(3, f32),
        vR=jnp.eye(3, dtype=f32), vt=jnp.zeros(3, f32),
        has_vel=jnp.bool_(False), ok=jnp.bool_(False),
        pids=jnp.full(N, -1, i32))
    return RTState(
        track=track, dyn=dynamic_mod.init_dyn_state(cfg),
        kf_R=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
        kf_t=jnp.zeros((K, 3), f32), kf_valid=jnp.zeros(K, bool),
        kf_obs=jnp.zeros((K, N, 3), f32), kf_w=jnp.ones((K, N), f32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_pid=jnp.full((K, N), -1, i32),
        kf_frame=jnp.full(K, -1, i32), n_kf=i32(0),
        pt_pos=jnp.zeros((P, 3), f32),
        pt_desc=jnp.zeros((P, 32), jnp.uint8),
        pt_valid=jnp.zeros(P, bool), pt_angle=jnp.zeros(P, f32),
        pt_normal=jnp.zeros((P, 3), f32),
        pt_mind=jnp.full(P, 1e-2, f32), pt_maxd=jnp.full(P, 1e3, f32),
        traj=jnp.zeros((F, 13), f32), frame_idx=i32(0),
        frames_since_kf=i32(0), peak_inliers=i32(0),
        budget=i32(cfg.orb.n_features), consec_ok=i32(0),
        strong_frames=i32(0), n_lost=i32(0))


# --------------------------------------------------------------------- #
# keyframe creation + windowed BA (one lax.cond branch)
# --------------------------------------------------------------------- #


def _unproject_world(cam, uv, depth, R_cw, t_cw):
    z = depth
    x = (uv[:, 0] - cam.cx) / cam.fx * z
    y = (uv[:, 1] - cam.cy) / cam.fy * z
    pc = jnp.stack([x, y, z], axis=-1)
    return (pc - t_cw) @ R_cw        # R_cw^T (pc - t) rowwise


def _create_keyframe(st: RTState, fd, spawn_ok, pose: SE3,
                     cfg: SystemConfig, lim: RTLimits) -> RTState:
    """Insert the current frame as keyframe row n_kf and spawn map points
    for close-depth unassociated keypoints (Tracking.cc:1142-1212) —
    all writes are dynamic_update_slice row/chunk updates; the N->S
    compaction is a one-hot matmul (a gather-free scatter substitute:
    TPU serializes data-dependent scatters but eats a [S, N] matmul).
    """
    cam = cfg.camera
    S = lim.spawn_per_kf
    feats = fd.feats
    k = jnp.minimum(st.n_kf, lim.max_kf - 1)

    # ---- spawn selection (close depth, unmatched, outside moving boxes)
    spawn = (feats.valid & (st.track.pids < 0) & (fd.depth > 0)
             & (fd.depth < cam.depth_threshold) & spawn_ok)
    rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
    take = spawn & (rank < S)
    # Exact N->S compaction by gather: slot s's source keypoint is the one
    # whose rank is s (argmax over the one-hot; gathers are fast on TPU
    # and, unlike a one-hot MATMUL, don't round values through bf16).
    oh = (rank[None, :] == jnp.arange(S)[:, None]) & take[None, :]
    src = jnp.argmax(oh, axis=1)                       # [S] kp index
    valid_c = oh.any(axis=1)

    pts_w = _unproject_world(cam, feats.uv, fd.depth, pose.R, pose.t)
    pos_c = jnp.where(valid_c[:, None], pts_w[src], 0.0)
    desc_c = jnp.where(valid_c[:, None], feats.desc[src], 0)
    angle_c = jnp.where(valid_c, feats.angle[src], 0.0)
    level_c = jnp.where(valid_c, feats.level[src].astype(jnp.float32), 0.0)

    # Normal + scale-invariance band (MapPoint::UpdateNormalAndDepth /
    # PredictScale, MapPoint.cc:367-411): single-view initialization.
    center = -jnp.einsum("ji,j->i", pose.R, pose.t)
    vec = pos_c - center
    dist = jnp.maximum(jnp.linalg.norm(vec, axis=-1), 1e-6)
    normal_c = vec / dist[:, None]
    sf = cfg.orb.scale_factor
    maxd = dist * sf ** level_c
    mind = maxd / sf ** (cfg.orb.n_levels - 1)
    # Guard empty slots so the frustum gates reject them cheaply.
    maxd = jnp.where(valid_c, maxd, 0.0)
    mind = jnp.where(valid_c, mind, 1e3)

    base = k * S
    upd = lambda arr, chunk: jax.lax.dynamic_update_slice(
        arr, chunk.astype(arr.dtype), (base,) + (0,) * (arr.ndim - 1))
    pt_pos = upd(st.pt_pos, pos_c)
    pt_desc = upd(st.pt_desc, desc_c)
    pt_valid = jax.lax.dynamic_update_slice(st.pt_valid, valid_c, (base,))
    pt_angle = upd(st.pt_angle, angle_c)
    pt_normal = upd(st.pt_normal, normal_c)
    pt_mind = upd(st.pt_mind, mind)
    pt_maxd = upd(st.pt_maxd, maxd)

    pid_frame = jnp.where(take, base + rank, st.track.pids)

    # ---- keyframe row
    row = lambda arr, v: jax.lax.dynamic_update_slice(
        arr, v[None].astype(arr.dtype), (k,) + (0,) * (arr.ndim - 1))
    kf_R = row(st.kf_R, pose.R)
    kf_t = row(st.kf_t, pose.t)
    kf_valid = st.kf_valid.at[k].set(True)  # static-width row flag
    kf_obs = row(st.kf_obs, fd.obs)
    kf_w = row(st.kf_w, fd.inv_sigma2)
    kf_kp_valid = row(st.kf_kp_valid, feats.valid)
    kf_pid = row(st.kf_pid, pid_frame)
    kf_frame = st.kf_frame.at[k].set(st.frame_idx)

    st = st._replace(
        kf_R=kf_R, kf_t=kf_t, kf_valid=kf_valid, kf_obs=kf_obs,
        kf_w=kf_w, kf_kp_valid=kf_kp_valid, kf_pid=kf_pid,
        kf_frame=kf_frame, n_kf=jnp.minimum(st.n_kf + 1, lim.max_kf),
        pt_pos=pt_pos, pt_desc=pt_desc, pt_valid=pt_valid,
        pt_angle=pt_angle, pt_normal=pt_normal, pt_mind=pt_mind,
        pt_maxd=pt_maxd,
        track=st.track._replace(pids=pid_frame),
        frames_since_kf=jnp.int32(0), peak_inliers=jnp.int32(0))
    return _windowed_ba(st, cfg, lim)


def _windowed_ba(st: RTState, cfg: SystemConfig, lim: RTLimits) -> RTState:
    """Local BA over the last `ba_window` keyframes and their point
    chunks (Optimizer::LocalBundleAdjustment, Optimizer.cc:453-779; the
    covisibility window becomes a temporal window — for a continuous
    camera they coincide, and the device never needs the host's graph).

    The [P, M] observation table is built by comparing each window
    keyframe's pid row against the window's point-id range — a dense
    [N, P] equality matmul per window slot, no scatter, no host.
    """
    W, S = lim.ba_window, lim.spawn_per_kf
    P = W * S
    N = st.kf_pid.shape[1]
    k_new = st.n_kf - 1                       # newest KF row
    start_kf = jnp.maximum(k_new - W + 1, 0)
    base = start_kf * S

    wks = start_kf + jnp.arange(W)            # window rows (may exceed new)
    wvalid = wks <= k_new
    wks_c = jnp.minimum(wks, k_new)

    kf_R_w = st.kf_R[wks_c]
    kf_t_w = st.kf_t[wks_c]
    # Anchor: the oldest window KF is fixed (plus KF 0 always — gauge).
    kf_fixed = (jnp.arange(W) == 0) | ~wvalid | (wks_c == 0)

    pslice = lambda arr: jax.lax.dynamic_slice(
        arr, (base,) + (0,) * (arr.ndim - 1), (P,) + arr.shape[1:])
    pt_pos_w = pslice(st.pt_pos)
    pt_valid_w = pslice(st.pt_valid)

    pid_rows = st.kf_pid[wks_c]               # [W, N]
    kpv_rows = st.kf_kp_valid[wks_c] & wvalid[:, None]
    obs_rows = st.kf_obs[wks_c]               # [W, N, 3]
    w_rows = st.kf_w[wks_c]

    win_ids = base + jnp.arange(P)            # flat ids of window points

    # For each (window slot w, window point p): the keypoint index in KF w
    # observing p, or -1.  hit[w, n, p] one-hot over n.
    def per_kf(pids, kpv, obs, iw):
        hit = (pids[:, None] == win_ids[None, :]) & kpv[:, None]   # [N, P]
        kp = jnp.argmax(hit, axis=0)                               # [P]
        seen = hit.any(axis=0)
        return (jnp.where(seen, obs[kp][:, 0], 0.0),
                jnp.where(seen, obs[kp][:, 1], 0.0),
                jnp.where(seen, obs[kp][:, 2], -1.0),
                jnp.where(seen, iw[kp], 1.0), seen)

    u, v, ur, ow, seen = jax.vmap(per_kf)(pid_rows, kpv_rows, obs_rows,
                                          w_rows)
    obs_uvr = jnp.stack([u, v, ur], axis=-1).transpose(1, 0, 2)  # [P, W, 3]
    obs_w = ow.T                                                 # [P, W]
    obs_valid = seen.T & pt_valid_w[:, None]
    obs_kf = jnp.where(obs_valid, jnp.arange(W)[None, :], -1)

    prob = local_ba.BAProblem(
        kf_R=kf_R_w, kf_t=kf_t_w, kf_fixed=kf_fixed, kf_valid=wvalid,
        pt_pos=pt_pos_w, pt_valid=pt_valid_w & obs_valid.any(axis=1),
        obs_kf=obs_kf.astype(jnp.int32), obs_uvr=obs_uvr, obs_w=obs_w,
        obs_valid=obs_valid)
    res = local_ba.optimize_local_ba(prob, cfg.camera, cfg.optimizer)

    # Writeback: refined window poses + point chunk.
    kf_R, kf_t = st.kf_R, st.kf_t
    for w in range(W):        # static unroll, W row updates
        keep = kf_fixed[w]
        Rw = jnp.where(keep, kf_R_w[w], res.kf_R[w])
        tw = jnp.where(keep, kf_t_w[w], res.kf_t[w])
        kf_R = jax.lax.dynamic_update_slice(kf_R, Rw[None], (wks_c[w], 0, 0))
        kf_t = jax.lax.dynamic_update_slice(kf_t, tw[None], (wks_c[w], 0))
    new_pos = jnp.where(pt_valid_w[:, None], res.pt_pos, pt_pos_w)
    pt_pos = jax.lax.dynamic_update_slice(st.pt_pos, new_pos, (base, 0))

    # The live pose adopts the newest KF's refinement so the next frame's
    # prediction doesn't fight the adjusted map (Tracking.cc:558-574's
    # relative-pose bookkeeping achieves the same in the reference).
    iw_new = jnp.minimum(k_new - start_kf, W - 1)
    newR = jnp.where(kf_fixed[iw_new], kf_R_w[iw_new], res.kf_R[iw_new])
    newt = jnp.where(kf_fixed[iw_new], kf_t_w[iw_new], res.kf_t[iw_new])
    track = st.track._replace(R=newR, t=newt)
    return st._replace(kf_R=kf_R, kf_t=kf_t, pt_pos=pt_pos, track=track)


# --------------------------------------------------------------------- #
# the per-frame program
# --------------------------------------------------------------------- #


def rt_step(gray, depth, boxes, seed, st: RTState, cfg: SystemConfig,
            lim: RTLimits) -> RTState:
    """One sensor frame end-to-end.  Jittable; zero host transfers."""
    cam = cfg.camera
    t_cfg = cfg.tracking
    S = lim.spawn_per_kf

    g = gray.astype(jnp.float32)
    if jnp.issubdtype(depth.dtype, jnp.integer):
        d = depth.astype(jnp.float32) / cam.depth_map_factor
    else:
        d = depth.astype(jnp.float32)

    fd = frame_mod.process_rgbd(
        g, d, cam, cfg.orb, n_features=st.budget,
        dynamic_mask=st.dyn.sticky > 0, area_mode=st.dyn.area_flag)
    key = jax.random.PRNGKey(seed)
    fd, spawn_ok, dyn2, _info = dynamic_mod.dynamic_step(
        fd, g, st.dyn, boxes, key, cfg)

    # Tracking local map = the last `local_window` keyframe chunks.
    L = lim.local_window * S
    k_new = jnp.maximum(st.n_kf - 1, 0)
    lstart = jnp.maximum((k_new - lim.local_window + 1), 0) * S
    local_ids = lstart + jnp.arange(L)
    local_valid = local_ids < st.n_kf * S

    pt_sd = brief.to_signed(brief.unpack_bits(st.pt_desc))
    arena = (st.pt_pos, pt_sd, st.pt_valid, st.pt_angle, st.pt_normal,
             st.pt_mind, st.pt_maxd)
    gate = 1.0 + st.n_lost.astype(jnp.float32)
    out = fused_step(fd, st.track, local_ids, local_valid, arena, gate, cfg)

    vec = out.scalars.vec
    ok = vec[_V_OK] > 0.5
    n_inl = vec[_V_INL].astype(jnp.int32)
    tracked_close = vec[_V_TRACKED_CLOSE]
    untracked_close = vec[_V_UNTRACKED_CLOSE]

    first = st.n_kf == 0
    enough = fd.feats.valid.sum() >= 500
    pose = SE3(jnp.where(first, jnp.eye(3), out.state.R),
               jnp.where(first, jnp.zeros(3), out.state.t))
    ok = ok | (first & enough)
    track = out.state._replace(R=pose.R, t=pose.t, ok=ok)

    # ---- keyframe policy (NeedNewKeyFrame, Tracking.cc:1049-1140;
    # mapper is inline so bLocalMappingIdle is always true).
    peak = jnp.maximum(st.peak_inliers, n_inl)
    fsk = st.frames_since_kf + 1
    need_close = (tracked_close < 100) & (untracked_close > 70)
    ratio = (t_cfg.kf_ref_ratio_mono if cfg.sensor == "monocular"
             else t_cfg.kf_ref_ratio_stereo)
    c1a = fsk >= t_cfg.max_frames_between_kf
    c1b = fsk >= t_cfg.min_frames_between_kf
    c2 = ((n_inl < (ratio * peak.astype(jnp.float32))) | need_close)
    need_kf = ok & (n_inl > t_cfg.min_inliers_kf) \
        & (c1a | (c1b & c2)) & (st.n_kf < lim.max_kf)
    need_kf = need_kf | (first & enough)

    st = st._replace(track=track, dyn=dyn2, peak_inliers=peak,
                     frames_since_kf=fsk)
    st = jax.lax.cond(
        need_kf,
        lambda s: _create_keyframe(s, fd, spawn_ok, pose, cfg, lim),
        lambda s: s, st)

    # ---- COEB adaptive feature budget (Tracking.cc:417-466), in-graph.
    if t_cfg.adaptive_budget:
        weak = ~ok | (n_inl <= t_cfg.weak_inlier_threshold)
        strong = st.strong_frames + (n_inl > t_cfg.strong_inlier_threshold)
        consec = jnp.where(ok, st.consec_ok + 1, 0)
        decay = (consec >= t_cfg.decay_success_window) \
            | (strong >= t_cfg.decay_strong_window)
        floor = min(t_cfg.budget_floor, cfg.orb.n_features)
        budget = jnp.where(
            weak, jnp.minimum(st.budget + t_cfg.budget_step,
                              t_cfg.budget_cap),
            jnp.where(decay, jnp.maximum(st.budget - t_cfg.budget_step,
                                         floor), st.budget))
        st = st._replace(
            budget=budget,
            consec_ok=jnp.where(decay, 0, consec),
            strong_frames=jnp.where(weak | decay, 0, strong))
    st = st._replace(n_lost=jnp.where(ok, 0, st.n_lost + 1))

    # ---- trajectory ring
    row = jnp.concatenate([ok.astype(jnp.float32)[None],
                           st.track.R.reshape(9), st.track.t])
    fi = jnp.minimum(st.frame_idx, lim.max_frames - 1)
    traj = jax.lax.dynamic_update_slice(st.traj, row[None], (fi, 0))
    return st._replace(traj=traj, frame_idx=st.frame_idx + 1)


# --------------------------------------------------------------------- #
# host driver
# --------------------------------------------------------------------- #


class RealtimeSlam:
    """Dispatch-only host loop around `rt_step`.

    track() uploads one frame and dispatches; nothing synchronizes.
    finish() does the session's only readback and returns trajectory +
    map arrays (after this the client may be slow — by then the run is
    over).
    """

    #: Frames in flight before a device sync (block_until_ready is not a
    #: readback — it doesn't trigger the slow-transfer mode).  Unbounded
    #: async dispatch wedges this backend's remote loop past ~30
    #: outstanding executions; 8 keeps the pipe full at negligible cost.
    pipeline_depth = 8

    def __init__(self, cfg: SystemConfig, lim: Optional[RTLimits] = None,
                 detector=None, detect_every: int = 10):
        """Args:
          detector: optional models.detector.YoloDetector — dispatched
            in-stream every ``detect_every`` frames; its device boxes
            feed the dynamic front-end when the caller provides none.
            Reduced cadence mirrors the reference's ApproximateTime sync
            (ros_rgbd.cc:73-78), which tolerates stale boxes — the
            sticky mask bridges between detections.  (The detector is a
            separate executable by necessity: its conv stack compiles to
            ~87 MB of TPU code, past this backend's executable-retention
            budget, so running it every frame evicts the SLAM program.)
        """
        self.cfg = cfg
        self.lim = lim or RTLimits()
        self.detector = detector
        self.detect_every = max(int(detect_every), 1)
        self.state = init_state(cfg, self.lim)
        self.stamps = []
        self._seed = 0
        self._since_sync = 0
        self._det_boxes = None
        # NO buffer donation: donating the state pytree makes this
        # runtime synchronize every dispatch (measured 96 ms/frame with
        # donate_argnums=(4,) vs 0.4 ms without — the donated-input
        # bookkeeping round-trips the relay).  The un-donated peak holds
        # two states (~tens of MB), well within HBM.
        self._step = jax.jit(
            lambda g, d, b, s, st: rt_step(g, d, b, s, st, cfg, self.lim))
        nb = cfg.dynamic.max_boxes
        self._no_boxes = jnp.full((nb, 4), -1.0, jnp.float32)

    def track(self, gray, depth, stamp: float, boxes=None) -> None:
        if self.detector is not None \
                and len(self.stamps) % self.detect_every == 0:
            self._det_boxes = self.detector.detect_device(gray)
        if boxes is None:
            boxes = self._det_boxes
        b = self._no_boxes if boxes is None else boxes
        if not isinstance(b, jnp.ndarray):
            arr = np.full((self.cfg.dynamic.max_boxes, 4), -1.0, np.float32)
            bb = np.asarray(b, np.float32).reshape(-1, 4)
            arr[:min(len(bb), len(arr))] = bb[:len(arr)]
            b = jnp.asarray(arr)
        self.state = self._step(jnp.asarray(gray), jnp.asarray(depth), b,
                                np.uint32(self._seed), self.state)
        self.stamps.append(stamp)
        self._seed += 1
        self._since_sync += 1
        if self._since_sync >= self.pipeline_depth:
            jax.block_until_ready(self.state.track.ok)
            self._since_sync = 0

    def block(self) -> None:
        """Wait for all dispatched frames (still no readback)."""
        jax.block_until_ready(self.state)

    def finish(self) -> dict:
        """THE readback: trajectory (Twc centers derivable), keyframes and
        the point map, as numpy."""
        st = self.state
        n = min(len(self.stamps), self.lim.max_frames)
        traj = np.asarray(st.traj)[:n]
        n_kf = int(st.n_kf)
        return {
            "stamps": np.asarray(self.stamps[:n]),
            "ok": traj[:, 0] > 0.5,
            "R": traj[:, 1:10].reshape(-1, 3, 3),
            "t": traj[:, 10:13],
            "n_kf": n_kf,
            "kf_R": np.asarray(st.kf_R)[:n_kf],
            "kf_t": np.asarray(st.kf_t)[:n_kf],
            "kf_frame": np.asarray(st.kf_frame)[:n_kf],
            "pt_pos": np.asarray(st.pt_pos),
            "pt_valid": np.asarray(st.pt_valid),
            "budget": int(st.budget),
        }
