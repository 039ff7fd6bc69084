"""Realtime-session -> host-arena handoff: offline refinement bridge.

`RealtimeSlam.finish()` returns the session's device arenas as numpy;
this module rebuilds a host `MapArena` from them so the WHOLE host
toolchain applies to a finished realtime session: global bundle
adjustment (`slam.global_ba`), checkpoint/resume (`io.checkpoint`),
keyframe-trajectory export, visualization, and — with a vocabulary —
re-processing by the host loop closer.  This is the "hand the arenas
over for offline refinement" half of the zero-sync design
(slam/realtime.py module docstring): the realtime front-end never reads
back mid-run; everything long-horizon happens here, after the fact —
the reference's detached-GBA role (LoopClosing::RunGlobalBundleAdjustment,
LoopClosing.cc:646-750) without racing a live map.

Reconstruction notes:
  * Per-keypoint pyramid levels are recovered from the stored
    information weights (w = 1/sf^(2L)  =>  L = -ln w / (2 ln sf)) —
    exact, because the realtime state keeps inv_sigma2 per observation.
  * Depth is recovered from the virtual-right coordinate
    (z = bf / (u - ur), Frame.cc:820-842 inverted); ur == -1 marks "no
    depth" (frame.py contract).
  * Keypoint descriptors/angles come from the observed landmark (the
    realtime arenas store them per POINT; the landmark descriptor is the
    spawning keypoint's, so this is lossless for observed keypoints).
"""
from __future__ import annotations

import numpy as np

from ..config import SystemConfig
from .map import MapArena


def to_arena(res: dict, cfg: SystemConfig, stamps=None):
    """Build a MapArena from a `RealtimeSlam.finish()` result.

    Returns (arena, kf_ids) with ``kf_ids[i]`` the arena id of the i-th
    (lid-ordered) realtime keyframe.
    """
    lim = res["limits"]
    K, S = lim.max_kf, lim.spawn_per_kf
    P = K * S
    cam, orb = cfg.camera, cfg.orb
    m = MapArena(cfg)

    lids = np.asarray(res["kf_lid"])
    live_lids = set(int(x) for x in lids)
    pt_valid = np.asarray(res["pt_valid"])
    pt_pos = np.asarray(res["pt_pos"])
    pt_desc = np.asarray(res["pt_desc"])
    pt_angle = np.asarray(res["pt_angle"])

    # ---- live landmarks: logical pid -> arena id
    phys_of = lambda pid: pid % P
    live_pids = []
    for lid in lids:
        base = int(lid) * S
        ph = (base + np.arange(S)) % P
        ok = pt_valid[ph]
        live_pids.extend((base + np.nonzero(ok)[0]).tolist())
    live_pids = np.asarray(live_pids, np.int64)
    arena_of = {}
    if len(live_pids):
        ph = phys_of(live_pids)
        ids = m.add_points(pt_pos[ph], pt_desc[ph], first_kf=-1,
                           angles=pt_angle[ph])
        for lp, aid in zip(live_pids, ids):
            if aid >= 0:
                arena_of[int(lp)] = int(aid)

    # ---- keyframes (lid order == temporal order)
    if stamps is None:
        stamps = np.asarray(res["stamps"])
    dropped = res.get("frames_dropped", 0)
    frames = np.asarray(res["kf_frame"])
    obs = np.asarray(res["kf_obs"])          # [n, N, 3]
    w = np.asarray(res["kf_w"])
    kpv = np.asarray(res["kf_kp_valid"])
    pids = np.asarray(res["kf_pid"])
    ln_sf2 = 2.0 * np.log(orb.scale_factor)
    kf_ids = []
    for i, lid in enumerate(lids):
        u, v, ur = obs[i, :, 0], obs[i, :, 1], obs[i, :, 2]
        disp = u - ur
        has_d = (np.abs(ur + 1.0) > 1e-4) & (disp > 0.1)
        depth = np.where(has_d, cam.bf / np.maximum(disp, 0.1), 0.0)
        level = np.clip(np.round(-np.log(np.maximum(w[i], 1e-9)) / ln_sf2),
                        0, orb.n_levels - 1).astype(np.int32)
        row = pids[i]
        alive = (row >= 0) & np.isin(row // S, lids) \
            & pt_valid[phys_of(np.clip(row, 0, None))]
        point_ids = np.asarray(
            [arena_of.get(int(p), -1) if a else -1
             for p, a in zip(row, alive)], np.int32)
        if "kf_desc" in res:
            # Exact per-keypoint descriptors (realtime sessions export the
            # full keyframe descriptor set since r5).
            desc = np.asarray(res["kf_desc"][i], np.uint8).copy()
        else:
            desc = np.zeros((len(row), 32), np.uint8)
        angle = np.zeros(len(row), np.float32)
        sel = point_ids >= 0
        if sel.any():
            ph = phys_of(row[sel])
            if "kf_desc" not in res:
                desc[sel] = pt_desc[ph]
            angle[sel] = pt_angle[ph]
        fi = int(frames[i]) - dropped
        if 0 <= fi < len(stamps):
            stamp = float(stamps[fi])
        else:
            # Keyframe older than the surviving trajectory ring:
            # extrapolate in the SAME timebase as the surviving stamps
            # (TUM stamps are epoch seconds — a frame_index/fps fallback
            # would interleave two timebases and break monotonicity).
            stamp = float(stamps[0]) + fi / cam.fps
        k = m.add_keyframe(
            np.asarray(res["kf_R"][i]), np.asarray(res["kf_t"][i]), stamp,
            obs[i, :, :2], level, angle, desc, depth,
            np.where(has_d, ur, -1.0), kpv[i], point_ids)
        kf_ids.append(k)
    if arena_of:
        # One batched call: update_point_stats accepts an id array, and a
        # per-landmark Python loop pays thousands of native round trips.
        m.update_point_stats(np.fromiter(arena_of.values(), np.int64))
    return m, kf_ids


def refine(res: dict, cfg: SystemConfig, stamps=None):
    """Handoff + global bundle adjustment: the offline polish a realtime
    session gets after the fact (GlobalBundleAdjustemnt [sic],
    Optimizer.cc:41-237).  Returns (arena, kf_ids, n_optimized)."""
    from .global_ba import GlobalBA
    m, kf_ids = to_arena(res, cfg, stamps=stamps)
    n = GlobalBA(cfg).run(m)
    return m, kf_ids, n


def refined_trajectory(res: dict, arena, kf_ids):
    """Re-base the full realtime trajectory onto the REFINED keyframe
    poses: each frame keeps its pose relative to the latest keyframe at
    or before it, exactly the reference's trajectory writer
    (System::SaveTrajectoryTUM replays mlRelativeFramePoses against the
    corrected keyframes, System.cc:331-401).

    Returns [F, 3, 4] corrected (R|t) world-to-camera poses aligned with
    ``res["stamps"]``.
    """
    R_f = np.asarray(res["R"])
    t_f = np.asarray(res["t"])
    n = len(R_f)
    dropped = res.get("frames_dropped", 0)
    kf_frames = np.asarray(res["kf_frame"]) - dropped   # trajectory index
    out = np.zeros((n, 3, 4), np.float32)
    # Latest keyframe at-or-before each frame (kf_frames is sorted —
    # lid order IS temporal order).
    j = np.searchsorted(kf_frames, np.arange(n), side="right") - 1
    j = np.clip(j, 0, len(kf_ids) - 1)
    # The OLD anchor is the keyframe's own TRAJECTORY row, not its final
    # arena pose: the windowed BA keeps refining recent keyframes after
    # their frames were written, so frame poses are only consistent with
    # the keyframe pose AS OF THAT TIME — which is exactly what the
    # trajectory row holds (and what the reference's track-time
    # mlRelativeFramePoses capture, System.cc:354-376).  Using the final
    # arena pose as the old anchor bakes the later refinements into the
    # relative and DEGRADES the re-based trajectory (measured on the
    # 240-frame replica: 2.96 cm vs 0.90 cm with track-time anchors;
    # the un-refined realtime trajectory scores 2.14 cm).
    kf_tr = np.clip(kf_frames, 0, n - 1)
    kf_R_old = R_f[kf_tr]
    kf_t_old = t_f[kf_tr]
    kf_R_new = arena.kf_R[np.asarray(kf_ids)]
    kf_t_new = arena.kf_t[np.asarray(kf_ids)]
    for i in range(n):
        k = j[i]
        # T_rel = T_f ∘ (T_k^old)^-1 ;  T_f' = T_rel ∘ T_k^new
        Rr = R_f[i] @ kf_R_old[k].T
        tr = t_f[i] - Rr @ kf_t_old[k]
        out[i, :, :3] = Rr @ kf_R_new[k]
        out[i, :, 3] = Rr @ kf_t_new[k] + tr
    return out
