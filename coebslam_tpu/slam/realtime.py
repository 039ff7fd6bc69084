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
  * ORBmatcher::Fuse's track-extension case (ORBmatcher.cc:826-976) —
    `_create_keyframe` first ASSOCIATES unmatched keypoints to existing
    window landmarks by projection + Hamming before spawning, so a
    missed per-frame match does not duplicate the landmark.
  * LocalMapping::Run's CreateNewMapPoints/LocalBundleAdjustment
    (LocalMapping.cc:208, Optimizer.cc:453) — a temporal-window
    `optim.local_ba.optimize_local_ba` fed entirely from device arenas;
    the observation table is built by pid-compare matmuls, not host
    bookkeeping.  RGB-D depth makes spawn-from-depth the dominant point
    source (Tracking.cc:1142-1212).  Points whose every window
    observation fails the BA chi^2 gate are culled in-graph
    (MapPointCulling semantics, LocalMapping.cc:171-206).
  * COEB dynamic front-end (Frame.cc:311-393, ORBextractor.cc:
    1116-1207) — `dynamic.dynamic_step`, already in-graph.
  * LoopClosing + Relocalization live in `slam.maintenance`: a SECOND
    small device program the host dispatches every few frames (still no
    readback) that detects loops over device-resident BoW rows, solves
    the closure, runs the Sim3 pose graph and remaps the point arenas.

After the run, `slam.handoff.to_arena` rebuilds a host MapArena from
`finish()`'s export, so global BA, checkpointing and the rest of the
host toolchain apply offline (the reference's detached-GBA role).

Capacity model: keyframes and points live in RING arenas — logical
keyframe id `lid` is monotonic, physical row is ``lid % max_kf``, and a
new keyframe evicts the tenant ``max_kf`` keyframes behind it (its point
chunk is recycled with it).  Point ids are LOGICAL (``lid * S + slot``,
never recycled), so a stale id can always be detected by comparing its
chunk's logical owner against ``kf_lid``; physical storage is
``pid % (max_kf * S)``.  The trajectory buffer is a true ring as well.
`finish()` reports saturation honestly (frames dropped from the ring,
keyframes evicted) instead of silently overwriting one row.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import so3 as so3_mod
from ..geometry.se3 import SE3
from ..ops import brief, matching as matching_ops
from ..optim import local_ba
from . import dynamic as dynamic_mod
from . import frame as frame_mod
from .tracking import (DevTrackState, StepScalars, fused_step,
                       _V_INL, _V_INL1, _V_TRACKED_CLOSE,
                       _V_UNTRACKED_CLOSE, _V_OK)


class RTLimits(NamedTuple):
    """Static capacities of one realtime session (compile-time shapes)."""
    max_kf: int = 64          # keyframe RING rows (window, not a wall)
    spawn_per_kf: int = 256   # point-chunk size S; logical pid = lid*S + slot
    # Keyframes jointly adjusted per insertion.  Measured on the 240-frame
    # replica prefix (walker + blur + shake): W=8 -> 4.26 cm ATE,
    # W=12 -> 1.75 cm (the shake segment needs the longer smoothing
    # window); the wider window only costs the occasional KF branch.
    ba_window: int = 12
    local_window: int = 12    # keyframe chunks visible to tracking
    max_frames: int = 4096    # trajectory ring capacity
    reuse_chunks: int = 2     # extra chunks re-exposed after a loop closure
    # Persistent place bank (slam/maintenance.py): every processed
    # keyframe leaves a compact entry — sparse top-k BoW row + pose + a
    # landmark subset — that OUTLIVES its ring slot, so loop closing and
    # relocalization work against places the ring evicted long ago (the
    # reference's KeyFrameDatabase remembers every keyframe,
    # KeyFrameDatabase.cc:33-46; the ring alone forgets after max_kf).
    bank_cap: int = 1024      # bank entries (places remembered)
    bank_words: int = 64      # top-k BoW words kept per entry (sparse row)
    bank_landmarks: int = 128 # landmark subset stored per entry
    seed_slots: int = 256     # arena rows reserved for bank re-seeding


class RTState(NamedTuple):
    """Everything the pipeline needs, resident on device."""
    track: DevTrackState            # pose/velocity/ok/pids chain (LOGICAL pids)
    dyn: dynamic_mod.DynState       # COEB sticky mask state
    # keyframe ring (physical row = lid % K)
    kf_R: jnp.ndarray               # [K, 3, 3]
    kf_t: jnp.ndarray               # [K, 3]
    kf_lid: jnp.ndarray             # [K] int32 logical tenant id (-1 empty)
    kf_obs: jnp.ndarray             # [K, N, 3] (u, v, ur) per keypoint
    kf_desc: jnp.ndarray            # [K, N, 32] uint8 FULL keypoint set —
                                    # the BoW document (Frame::ComputeBoW
                                    # uses all frame descriptors; landmark-
                                    # only rows score revisits ~10x weaker)
    kf_w: jnp.ndarray               # [K, N] inv_sigma2
    kf_kp_valid: jnp.ndarray        # [K, N] bool
    kf_pid: jnp.ndarray             # [K, N] int32 LOGICAL point id (-1)
    kf_frame: jnp.ndarray           # [K] int32 frame index of insertion
    n_kf: jnp.ndarray               # int32 — LOGICAL keyframe count (monotonic)
    # point ring, chunked: logical point lid*S+s lives at row (lid%K)*S + s
    pt_pos: jnp.ndarray             # [K*S, 3]
    pt_desc: jnp.ndarray            # [K*S, 32] uint8 packed BRIEF
    pt_valid: jnp.ndarray           # [K*S] bool
    pt_angle: jnp.ndarray           # [K*S]
    pt_normal: jnp.ndarray          # [K*S, 3]
    pt_mind: jnp.ndarray            # [K*S]
    pt_maxd: jnp.ndarray            # [K*S]
    # trajectory ring (pose written every frame; fetched once at finish).
    # Column 13 is the OWNER keyframe lid (newest at write time): loop
    # closures re-map written rows through their owner's correction, so
    # a closure repairs the PAST trajectory exactly like the reference's
    # keyframe-relative trajectory export (System.cc:331-401).
    traj: jnp.ndarray               # [F, 14] (ok, R.flat, t, owner_lid)
    frame_idx: jnp.ndarray          # int32
    # keyframe-policy counters (Tracking.h:89-98 equivalents)
    frames_since_kf: jnp.ndarray    # int32
    peak_inliers: jnp.ndarray       # int32 since last KF
    budget: jnp.ndarray             # int32 adaptive feature budget
    consec_ok: jnp.ndarray          # int32
    strong_frames: jnp.ndarray      # int32
    n_lost: jnp.ndarray             # int32 consecutive lost frames
    # newest frame stash (for relocalization in slam.maintenance)
    fr_desc: jnp.ndarray            # [N, 32] uint8
    fr_uv: jnp.ndarray              # [N, 2]
    fr_depth: jnp.ndarray           # [N]
    fr_valid: jnp.ndarray           # [N] bool
    # monocular two-view-init reference frame stash (Tracking::
    # MonocularInitialization's held reference, Tracking.cc:631-704,
    # in device arrays so the init runs with zero readbacks)
    mr_desc: jnp.ndarray            # [N, 32] uint8
    mr_uv: jnp.ndarray              # [N, 2]
    mr_angle: jnp.ndarray           # [N]
    mr_w: jnp.ndarray               # [N] inv_sigma2
    mr_valid: jnp.ndarray           # [N] bool
    mr_ok: jnp.ndarray              # bool — reference held
    # loop-closure reuse window: chunks of this logical KF (and the next)
    # are re-exposed to tracking after a closure (temporal-window revisit fix)
    reuse_lid: jnp.ndarray          # int32 (-1 none)
    reuse_ttl: jnp.ndarray          # int32 frames remaining
    # bank re-seed window: after a closure/reloc against a BANK place
    # (evicted from the ring), its stored landmark subset is copied into
    # the seed arena rows [K*S, K*S+seed_slots) and exposed to tracking
    # while this TTL runs (SearchAndFuse's re-observation role for
    # places the ring no longer holds)
    seed_ttl: jnp.ndarray           # int32 frames remaining
    # in-graph health counters (surfaced by finish())
    n_ba_culled: jnp.ndarray        # int32 points culled by the BA chi2 gate
    n_assoc: jnp.ndarray            # int32 spawn-avoided (fused) associations


def init_state(cfg: SystemConfig, lim: RTLimits) -> RTState:
    N = cfg.orb.max_keypoints
    K, S, F = lim.max_kf, lim.spawn_per_kf, lim.max_frames
    # Point arrays carry seed_slots EXTRA rows past the K*S ring chunks:
    # the bank re-seed staging area (see RTLimits.seed_slots).
    P = K * S + lim.seed_slots
    f32, i32 = jnp.float32, jnp.int32
    track = DevTrackState(
        R=jnp.eye(3, dtype=f32), t=jnp.zeros(3, f32),
        vR=jnp.eye(3, dtype=f32), vt=jnp.zeros(3, f32),
        has_vel=jnp.bool_(False), ok=jnp.bool_(False),
        pids=jnp.full(N, -1, i32))
    return RTState(
        track=track, dyn=dynamic_mod.init_dyn_state(cfg),
        kf_R=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
        kf_t=jnp.zeros((K, 3), f32), kf_lid=jnp.full(K, -1, i32),
        kf_obs=jnp.zeros((K, N, 3), f32),
        kf_desc=jnp.zeros((K, N, 32), jnp.uint8),
        kf_w=jnp.ones((K, N), f32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_pid=jnp.full((K, N), -1, i32),
        kf_frame=jnp.full(K, -1, i32), n_kf=i32(0),
        pt_pos=jnp.zeros((P, 3), f32),
        pt_desc=jnp.zeros((P, 32), jnp.uint8),
        pt_valid=jnp.zeros(P, bool), pt_angle=jnp.zeros(P, f32),
        pt_normal=jnp.zeros((P, 3), f32),
        pt_mind=jnp.full(P, 1e-2, f32), pt_maxd=jnp.full(P, 1e3, f32),
        traj=jnp.zeros((F, 14), f32), frame_idx=i32(0),
        frames_since_kf=i32(0), peak_inliers=i32(0),
        budget=i32(cfg.orb.n_features), consec_ok=i32(0),
        strong_frames=i32(0), n_lost=i32(0),
        fr_desc=jnp.zeros((N, 32), jnp.uint8),
        fr_uv=jnp.zeros((N, 2), f32), fr_depth=jnp.zeros(N, f32),
        fr_valid=jnp.zeros(N, bool),
        mr_desc=jnp.zeros((N, 32), jnp.uint8),
        mr_uv=jnp.zeros((N, 2), f32), mr_angle=jnp.zeros(N, f32),
        mr_w=jnp.ones(N, f32), mr_valid=jnp.zeros(N, bool),
        mr_ok=jnp.bool_(False),
        reuse_lid=i32(-1), reuse_ttl=i32(0), seed_ttl=i32(0),
        n_ba_culled=i32(0), n_assoc=i32(0))


# --------------------------------------------------------------------- #
# logical <-> physical id arithmetic
# --------------------------------------------------------------------- #


#: Logical-pid base of the SEED range: pids >= SEED_BASE address the
#: bank re-seed staging rows (row = K*S + pid - SEED_BASE) instead of a
#: ring chunk.  Far above any reachable ring pid (ring pids stay below
#: n_kf * S; a 30 Hz session would need ~2 years to reach 2^28).
SEED_BASE = 1 << 28


def pid_phys(pids, lim: RTLimits):
    """Physical arena row of a logical point id (callers mask validity)."""
    PT = lim.max_kf * lim.spawn_per_kf
    seed_row = PT + jnp.clip(pids - SEED_BASE, 0, lim.seed_slots - 1)
    return jnp.where(pids >= SEED_BASE, seed_row, jnp.clip(pids, 0) % PT)


def pid_alive(pids, kf_lid, lim: RTLimits, seed_ok=False):
    """A logical pid is alive while its owner chunk's ring row still holds
    the owning keyframe (the chunk is recycled together with the row).
    SEED-range pids are alive iff the caller says the seed window is
    (``seed_ok`` — typically ``state.seed_ttl > 0``)."""
    owner = jnp.clip(pids, 0) // lim.spawn_per_kf         # logical KF id
    ring = (pids >= 0) & (kf_lid[owner % lim.max_kf] == owner)
    return jnp.where(pids >= SEED_BASE, seed_ok, ring)


def _rotate(a, k):
    """Circular left-rotation by traced offset k (static shape; two slices
    of a doubled buffer — no data-dependent scatter)."""
    n = a.shape[0]
    return jax.lax.dynamic_slice(
        jnp.concatenate([a, a], axis=0), (k,) + (0,) * (a.ndim - 1),
        (n,) + a.shape[1:])


def _unrotate_update(a, chunk, k):
    """Write ``chunk`` at circular offset ``k`` of ``a`` (wrap-safe
    equivalent of dynamic_update_slice for ring buffers)."""
    n = a.shape[0]
    rolled = _rotate(a, k)
    rolled = jax.lax.dynamic_update_slice(
        rolled, chunk.astype(a.dtype), (0,) + (0,) * (a.ndim - 1))
    return _rotate(rolled, n - k)


def _unproject_world(cam, uv, depth, R_cw, t_cw):
    z = depth
    x = (uv[:, 0] - cam.cx) / cam.fx * z
    y = (uv[:, 1] - cam.cy) / cam.fy * z
    pc = jnp.stack([x, y, z], axis=-1)
    return (pc - t_cw) @ R_cw        # R_cw^T (pc - t) rowwise


# --------------------------------------------------------------------- #
# monocular two-view initialization (in-graph, zero readbacks)
# --------------------------------------------------------------------- #


def _mono_init(st: RTState, fd, key, cfg: SystemConfig, lim: RTLimits
               ) -> RTState:
    """Zero-sync monocular initialization (Tracking.cc:631-821 +
    Initializer.cc:44 in one device branch): hold a reference frame,
    wide-window match the current frame against it, run the in-graph
    batched H/F initializer (`initializer_ops.reconstruct_graph`), and
    on success build keyframes 0 (reference, identity) and 1 (current,
    recovered pose) with the triangulated points as chunk 0, scale
    normalized so the median scene depth is 1 (Tracking.cc:756-780)."""
    from ..ops import initializer_ops
    cam = cfg.camera
    K, S = lim.max_kf, lim.spawn_per_kf
    N = st.mr_valid.shape[0]
    feats = fd.feats
    n_feat = feats.valid.sum()

    def stash(s):
        return s._replace(mr_desc=feats.desc, mr_uv=feats.uv,
                          mr_angle=feats.angle, mr_w=fd.inv_sigma2,
                          mr_valid=feats.valid, mr_ok=n_feat > 100)

    def attempt(s):
        sd_r = brief.to_signed(brief.unpack_bits(s.mr_desc))
        d = matching_ops.hamming_matrix(sd_r, feats.signed_desc())
        d = d + matching_ops.window_penalty(s.mr_uv, feats.uv,
                                            cfg.matcher.radius_init)
        res = matching_ops.match(
            d, max_distance=cfg.matcher.th_low,
            ratio=cfg.matcher.nn_ratio_init, mutual=True,
            row_valid=s.mr_valid, col_valid=feats.valid)
        n_m = res.valid.sum()
        uv2 = feats.uv[jnp.clip(res.idx, 0)]
        rec = initializer_ops.reconstruct_graph(
            s.mr_uv, uv2, res.valid, cam, key,
            n_hypotheses=cfg.ransac.init_iterations,
            sigma=cfg.ransac.init_sigma)
        good = rec.good & res.valid
        ok = rec.ok & (n_m >= 100) \
            & jnp.isfinite(rec.R).all() & jnp.isfinite(rec.t).all()

        def build(s):
            z = jnp.where(good, rec.points[:, 2], jnp.nan)
            med = jnp.nanmedian(z)
            med = jnp.where(jnp.isfinite(med) & (med > 1e-6), med, 1.0)
            X = rec.points / med
            t2 = rec.t / med
            R2 = so3_mod.orthonormalize(rec.R)

            # ---- chunk 0: triangulated landmarks (ref-keypoint indexed)
            rank = jnp.cumsum(good.astype(jnp.int32)) - 1
            take = good & (rank < S)
            oh = (rank[None, :] == jnp.arange(S)[:, None]) & take[None, :]
            src = jnp.argmax(oh, axis=1)
            vc = oh.any(axis=1)
            pos_c = jnp.where(vc[:, None], X[src], 0.0)
            desc_c = jnp.where(vc[:, None], s.mr_desc[src], 0)
            ang_c = jnp.where(vc, s.mr_angle[src], 0.0)
            lvl_c = jnp.where(
                vc, -jnp.log(jnp.maximum(s.mr_w[src], 1e-9))
                / (2.0 * jnp.log(jnp.float32(cfg.orb.scale_factor))), 0.0)
            dist = jnp.maximum(jnp.linalg.norm(pos_c, axis=-1), 1e-6)
            normal_c = pos_c / dist[:, None]
            sf = cfg.orb.scale_factor
            maxd = jnp.where(vc, dist * sf ** lvl_c, 0.0)
            mind = jnp.where(vc, maxd / sf ** (cfg.orb.n_levels - 1), 1e3)
            upd0 = lambda arr, chunk: jax.lax.dynamic_update_slice(
                arr, chunk.astype(arr.dtype), (0,) + (0,) * (arr.ndim - 1))
            s = s._replace(
                pt_pos=upd0(s.pt_pos, pos_c), pt_desc=upd0(s.pt_desc, desc_c),
                pt_valid=jax.lax.dynamic_update_slice(s.pt_valid, vc, (0,)),
                pt_angle=upd0(s.pt_angle, ang_c),
                pt_normal=upd0(s.pt_normal, normal_c),
                pt_mind=upd0(s.pt_mind, mind), pt_maxd=upd0(s.pt_maxd, maxd))

            pid_ref = jnp.where(take, rank, -1)           # lid 0 chunk
            # current-frame keypoint j <- ref keypoint n (res.idx[n] = j)
            ohj = (res.idx[None, :] == jnp.arange(N)[:, None]) \
                & (take & (res.idx >= 0))[None, :]
            n_of = jnp.argmax(ohj, axis=1)
            pid_cur = jnp.where(ohj.any(axis=1), pid_ref[n_of], -1)

            # ---- keyframe rows 0 (reference @ identity) and 1 (current)
            obs0 = jnp.concatenate(
                [s.mr_uv, jnp.full((N, 1), -1.0)], axis=1)
            eye = jnp.eye(3, dtype=jnp.float32)
            s = s._replace(
                kf_R=s.kf_R.at[0].set(eye).at[1].set(R2),
                kf_t=s.kf_t.at[0].set(0.0).at[1].set(t2),
                kf_lid=s.kf_lid.at[0].set(0).at[1].set(1),
                kf_obs=s.kf_obs.at[0].set(obs0).at[1].set(fd.obs),
                kf_desc=s.kf_desc.at[0].set(s.mr_desc)
                               .at[1].set(feats.desc),
                kf_w=s.kf_w.at[0].set(s.mr_w).at[1].set(fd.inv_sigma2),
                kf_kp_valid=s.kf_kp_valid.at[0].set(s.mr_valid)
                                         .at[1].set(feats.valid),
                kf_pid=s.kf_pid.at[0].set(pid_ref).at[1].set(pid_cur),
                kf_frame=s.kf_frame.at[0]
                    .set(jnp.maximum(s.frame_idx - 1, 0))
                    .at[1].set(s.frame_idx),
                n_kf=jnp.int32(2),
                frames_since_kf=jnp.int32(0),
                peak_inliers=(pid_cur >= 0).sum().astype(jnp.int32),
                track=s.track._replace(
                    R=R2, t=t2, vR=eye, vt=jnp.zeros(3, jnp.float32),
                    has_vel=jnp.bool_(False), ok=jnp.bool_(True),
                    pids=pid_cur),
                mr_ok=jnp.bool_(False))
            return s

        # Failed attempt: re-stash the CURRENT frame as the reference
        # (the reference restarts its initializer the same way,
        # Tracking.cc:644-656).
        return jax.lax.cond(ok, build, stash, s)

    return jax.lax.cond(st.mr_ok, attempt, stash, st)


# --------------------------------------------------------------------- #
# keyframe creation + windowed BA (one lax.cond branch)
# --------------------------------------------------------------------- #


def _create_keyframe(st: RTState, fd, spawn_ok, pose: SE3, local_ids,
                     local_alive, cfg: SystemConfig, lim: RTLimits
                     ) -> RTState:
    """Insert the current frame as keyframe ``lid = n_kf`` (ring row
    ``lid % K``) and spawn map points for close-depth unassociated
    keypoints (Tracking.cc:1142-1212) — all writes are
    dynamic_update_slice row/chunk updates; the N->S compaction is an
    argmax-over-one-hot gather (gather-free scatter substitute: TPU
    serializes data-dependent scatters).

    Before spawning, unmatched keypoints are ASSOCIATED to existing
    local-window landmarks by projection + Hamming (Fuse's
    track-extension case, ORBmatcher.cc:826): without this every missed
    per-frame match would duplicate its landmark in the new chunk.
    """
    cam = cfg.camera
    K, S = lim.max_kf, lim.spawn_per_kf
    P = K * S
    feats = fd.feats
    k_log = st.n_kf
    k_phys = k_log % K

    # ---- fuse-by-association (ORBmatcher::Fuse extend-track case)
    lw_phys = pid_phys(local_ids, lim)
    pt_live = local_alive & st.pt_valid[lw_phys]
    pos_w = st.pt_pos[lw_phys]
    pc = pos_w @ pose.R.T + pose.t
    z = jnp.maximum(pc[:, 2], 1e-6)
    pu = cam.fx * pc[:, 0] / z + cam.cx
    pv = cam.fy * pc[:, 1] / z + cam.cy
    vis = pt_live & (pc[:, 2] > 0.05) & (pu >= 0) & (pu < cam.width) \
        & (pv >= 0) & (pv < cam.height)
    sd_kp = feats.signed_desc()
    sd_pt = brief.to_signed(brief.unpack_bits(st.pt_desc[lw_phys]))
    ham = matching_ops.hamming_matrix(sd_kp, sd_pt)        # [N, L]
    near = (jnp.abs(pu[None, :] - feats.uv[:, :1]) <= 2.5) \
        & (jnp.abs(pv[None, :] - feats.uv[:, 1:2]) <= 2.5) & vis[None, :]
    ham = jnp.where(near, ham, 1e9)
    jbest = jnp.argmin(ham, axis=1)
    dbest = jnp.min(ham, axis=1)
    # Best-per-landmark (Fuse semantics, ORBmatcher.cc:826): without the
    # mutual check two keypoints at the same corner could both claim one
    # landmark, writing a duplicate pid into this keyframe's row.
    ibest = jnp.argmin(ham, axis=0)
    mutual = ibest[jbest] == jnp.arange(ham.shape[0])
    assoc = (st.track.pids < 0) & feats.valid & mutual \
        & (dbest <= cfg.matcher.th_low)
    pids0 = jnp.where(assoc, local_ids[jbest], st.track.pids)

    # ---- spawn selection.  RGB-D/stereo: close-depth unmatched
    # keypoints unproject directly (Tracking.cc:1142-1212).  Monocular:
    # epipolar-match + DLT-triangulate against the PREVIOUS keyframe
    # (CreateNewMapPoints, LocalMapping.cc:208-453 — the in-graph,
    # fixed-shape version; the full keypoint set of the previous KF is
    # in the ring since kf_desc landed).
    kf_pid_base = st.kf_pid
    if cfg.sensor == "monocular":
        from ..ops import triangulation as tri_ops
        prev_row = (k_log - 1) % K
        T_prev = SE3(st.kf_R[prev_row], st.kf_t[prev_row])
        prev_free = st.kf_kp_valid[prev_row] & (st.kf_pid[prev_row] < 0)
        ln_sf = jnp.log(jnp.float32(cfg.orb.scale_factor))
        prev_lvl = -jnp.log(jnp.maximum(st.kf_w[prev_row], 1e-9)) \
            / (2.0 * ln_sf)
        sd_prev = brief.to_signed(brief.unpack_bits(st.kf_desc[prev_row]))
        tri = tri_ops.triangulate_pair(
            feats.uv, sd_kp, feats.valid & (pids0 < 0) & spawn_ok,
            feats.level,
            st.kf_obs[prev_row][:, :2], sd_prev, prev_free, prev_lvl,
            st.kf_obs[prev_row][:, 2],
            pose, T_prev, cam, cfg.orb, cfg.matcher)
        spawn = tri.good & jnp.isfinite(tri.points).all(axis=-1)
        pts_w = tri.points
    else:
        spawn = (feats.valid & (pids0 < 0) & (fd.depth > 0)
                 & (fd.depth < cam.depth_threshold) & spawn_ok)
        pts_w = _unproject_world(cam, feats.uv, fd.depth, pose.R, pose.t)
    rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
    take = spawn & (rank < S)
    # Exact N->S compaction by gather: slot s's source keypoint is the one
    # whose rank is s (argmax over the one-hot; gathers are fast on TPU
    # and, unlike a one-hot MATMUL, don't round values through bf16).
    oh = (rank[None, :] == jnp.arange(S)[:, None]) & take[None, :]
    src = jnp.argmax(oh, axis=1)                       # [S] kp index
    valid_c = oh.any(axis=1)

    if cfg.sensor == "monocular":
        # Record the SECOND observation (the previous keyframe's matched
        # keypoint) so the windowed BA constrains the new landmark from
        # both views immediately.
        n_kp = feats.uv.shape[0]
        ohm = (tri.idx2[None, :] == jnp.arange(n_kp)[:, None]) \
            & take[None, :]
        n_of_m = jnp.argmax(ohm, axis=1)
        pid_for_m = k_log * S + rank[n_of_m]
        prev_pids = jnp.where(ohm.any(axis=1), pid_for_m,
                              st.kf_pid[prev_row])
        kf_pid_base = jax.lax.dynamic_update_slice(
            st.kf_pid, prev_pids[None], (prev_row, 0))
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

    base = k_phys * S            # chunk offset (recycles the evicted KF's)
    upd = lambda arr, chunk: jax.lax.dynamic_update_slice(
        arr, chunk.astype(arr.dtype), (base,) + (0,) * (arr.ndim - 1))
    pt_pos = upd(st.pt_pos, pos_c)
    pt_desc = upd(st.pt_desc, desc_c)
    pt_valid = jax.lax.dynamic_update_slice(st.pt_valid, valid_c, (base,))
    pt_angle = upd(st.pt_angle, angle_c)
    pt_normal = upd(st.pt_normal, normal_c)
    pt_mind = upd(st.pt_mind, mind)
    pt_maxd = upd(st.pt_maxd, maxd)

    pid_frame = jnp.where(take, k_log * S + rank, pids0)   # LOGICAL ids

    # ---- keyframe ring row (evicts the tenant K keyframes behind)
    row = lambda arr, v: jax.lax.dynamic_update_slice(
        arr, v[None].astype(arr.dtype), (k_phys,) + (0,) * (arr.ndim - 1))
    kf_R = row(st.kf_R, pose.R)
    kf_t = row(st.kf_t, pose.t)
    kf_lid = st.kf_lid.at[k_phys].set(k_log)
    kf_obs = row(st.kf_obs, fd.obs)
    kf_desc = row(st.kf_desc, feats.desc)
    kf_w = row(st.kf_w, fd.inv_sigma2)
    kf_kp_valid = row(st.kf_kp_valid, feats.valid)
    kf_pid = row(kf_pid_base, pid_frame)
    kf_frame = st.kf_frame.at[k_phys].set(st.frame_idx)

    st = st._replace(
        kf_R=kf_R, kf_t=kf_t, kf_lid=kf_lid, kf_obs=kf_obs,
        kf_desc=kf_desc, kf_w=kf_w, kf_kp_valid=kf_kp_valid, kf_pid=kf_pid,
        kf_frame=kf_frame, n_kf=k_log + 1,
        pt_pos=pt_pos, pt_desc=pt_desc, pt_valid=pt_valid,
        pt_angle=pt_angle, pt_normal=pt_normal, pt_mind=pt_mind,
        pt_maxd=pt_maxd,
        track=st.track._replace(pids=pid_frame),
        frames_since_kf=jnp.int32(0), peak_inliers=jnp.int32(0),
        n_assoc=st.n_assoc + assoc.sum().astype(jnp.int32))
    return _windowed_ba(st, cfg, lim)


def _windowed_ba(st: RTState, cfg: SystemConfig, lim: RTLimits) -> RTState:
    """Local BA over the last `ba_window` keyframes and their point
    chunks (Optimizer::LocalBundleAdjustment, Optimizer.cc:453-779; the
    covisibility window becomes a temporal window — for a continuous
    camera they coincide, and the device never needs the host's graph).

    The [P, M] observation table is built by comparing each window
    keyframe's pid row against the window's LOGICAL point-id range — a
    dense [N, P] equality matmul per window slot, no scatter, no host.
    Logical ids never recycle, so the compare cannot alias an evicted
    chunk's tenant.  Points whose every window observation fails the
    chi^2 gate are culled (MapPointCulling, LocalMapping.cc:171-206).
    """
    W, S, K = lim.ba_window, lim.spawn_per_kf, lim.max_kf
    P = W * S
    PT = K * S
    N = st.kf_pid.shape[1]
    k_new = st.n_kf - 1                       # newest logical KF
    start_kf = jnp.maximum(k_new - W + 1, 0)
    base_log = start_kf * S
    base_phys = (start_kf % K) * S

    wks = start_kf + jnp.arange(W)            # window logical ids
    wvalid = wks <= k_new
    wks_c = jnp.minimum(wks, k_new)
    rows_c = wks_c % K                        # ring rows

    kf_R_w = st.kf_R[rows_c]
    kf_t_w = st.kf_t[rows_c]
    # Anchor: the oldest window KF is fixed (plus KF 0 always — gauge).
    # Monocular needs TWO fixed anchors: with one fixed camera the map
    # scale is a free direction (the 7-DoF mono gauge) and the Schur
    # solve goes singular -> NaN poses.
    n_anchor = 2 if cfg.sensor == "monocular" else 1
    kf_fixed = (jnp.arange(W) < n_anchor) | ~wvalid | (wks_c <= n_anchor - 1)

    win_phys = (base_phys + jnp.arange(P)) % PT   # physical rows (wrap-safe)
    pt_pos_w = st.pt_pos[win_phys]
    pt_valid_w = st.pt_valid[win_phys]

    pid_rows = st.kf_pid[rows_c]              # [W, N] logical
    kpv_rows = st.kf_kp_valid[rows_c] & wvalid[:, None]
    obs_rows = st.kf_obs[rows_c]              # [W, N, 3]
    w_rows = st.kf_w[rows_c]

    win_ids = base_log + jnp.arange(P)        # LOGICAL ids of window points

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

    # Writeback: refined window poses + point chunk.  A degenerate solve
    # (rank-deficient window) must not write NaN into the arenas.
    kf_R, kf_t = st.kf_R, st.kf_t
    for w in range(W):        # static unroll, W row updates
        keep = kf_fixed[w] | ~(jnp.isfinite(res.kf_R[w]).all()
                               & jnp.isfinite(res.kf_t[w]).all())
        Rw = jnp.where(keep, kf_R_w[w], res.kf_R[w])
        tw = jnp.where(keep, kf_t_w[w], res.kf_t[w])
        kf_R = jax.lax.dynamic_update_slice(kf_R, Rw[None], (rows_c[w], 0, 0))
        kf_t = jax.lax.dynamic_update_slice(kf_t, tw[None], (rows_c[w], 0))
    # Writebacks wrap within the RING rows [0, K*S) only — the seed
    # staging rows past PT must never be clobbered by a wrapped window.
    new_pos = jnp.where(pt_valid_w[:, None]
                        & jnp.isfinite(res.pt_pos).all(-1, keepdims=True),
                        res.pt_pos, pt_pos_w)
    pt_pos = jnp.concatenate(
        [_unrotate_update(st.pt_pos[:PT], new_pos, base_phys),
         st.pt_pos[PT:]])

    # In-graph point culling: a window point that HAD observations but lost
    # every one to the chi^2 gate is a bad landmark (moving object residue
    # or a depth outlier) — MapPointCulling semantics without host lists.
    had = obs_valid.any(axis=1)
    kept = res.obs_valid.any(axis=1)
    cull = had & ~kept & pt_valid_w
    new_valid_w = pt_valid_w & ~cull
    pt_valid = jnp.concatenate(
        [_unrotate_update(st.pt_valid[:PT], new_valid_w, base_phys),
         st.pt_valid[PT:]])

    # The live pose adopts the newest KF's refinement so the next frame's
    # prediction doesn't fight the adjusted map (Tracking.cc:558-574's
    # relative-pose bookkeeping achieves the same in the reference).
    iw_new = jnp.minimum(k_new - start_kf, W - 1)
    keep_new = kf_fixed[iw_new] | ~(jnp.isfinite(res.kf_R[iw_new]).all()
                                    & jnp.isfinite(res.kf_t[iw_new]).all())
    newR = jnp.where(keep_new, kf_R_w[iw_new], res.kf_R[iw_new])
    newt = jnp.where(keep_new, kf_t_w[iw_new], res.kf_t[iw_new])
    track = st.track._replace(R=newR, t=newt)
    return st._replace(kf_R=kf_R, kf_t=kf_t, pt_pos=pt_pos,
                       pt_valid=pt_valid, track=track,
                       n_ba_culled=st.n_ba_culled
                       + cull.sum().astype(jnp.int32))


# --------------------------------------------------------------------- #
# the per-frame program
# --------------------------------------------------------------------- #


def rt_step(gray, depth, boxes, seed, st: RTState, cfg: SystemConfig,
            lim: RTLimits) -> RTState:
    """One sensor frame end-to-end.  Jittable; zero host transfers.

    ``depth`` is the depth image for RGB-D, or the RIGHT camera image
    when ``cfg.sensor == "stereo"`` (row-band disparity synthesizes the
    depth in-graph, frame.process_stereo — the reference's stereo path,
    Frame.cc:644-818, at zero-sync speed)."""
    cam = cfg.camera
    t_cfg = cfg.tracking
    K, S = lim.max_kf, lim.spawn_per_kf
    PT = K * S

    g = gray.astype(jnp.float32)
    with jax.named_scope("frontend"):
        if cfg.sensor == "stereo":
            fd = frame_mod.process_stereo(
                g, depth.astype(jnp.float32), cam, cfg.orb,
                n_features=st.budget, dynamic_mask=st.dyn.sticky > 0,
                area_mode=st.dyn.area_flag)
        else:
            if jnp.issubdtype(depth.dtype, jnp.integer):
                d = depth.astype(jnp.float32) / cam.depth_map_factor
            else:
                d = depth.astype(jnp.float32)
            fd = frame_mod.process_rgbd(
                g, d, cam, cfg.orb, n_features=st.budget,
                dynamic_mask=st.dyn.sticky > 0, area_mode=st.dyn.area_flag)
    key = jax.random.PRNGKey(seed)
    with jax.named_scope("dynamic_frontend"):
        fd, spawn_ok, dyn2, _info = dynamic_mod.dynamic_step(
            fd, g, st.dyn, boxes, key, cfg)

    if cfg.sensor == "monocular":
        # In-graph two-view initialization replaces the RGB-D depth
        # bootstrap (runs until the map exists; zero readbacks).
        with jax.named_scope("mono_init"):
            st = jax.lax.cond(
                st.n_kf == 0,
                lambda s: _mono_init(s, fd, jax.random.fold_in(key, 7),
                                     cfg, lim),
                lambda s: s, st)

    # Tracking local map = the last `local_window` keyframe chunks, plus
    # the loop-closure reuse window (revisit chunks re-exposed by the
    # maintenance program — the temporal window alone cannot re-match a
    # place seen 50 keyframes ago).
    Lw = lim.local_window * S
    k_new = jnp.maximum(st.n_kf - 1, 0)
    lstart = jnp.maximum((k_new - lim.local_window + 1), 0) * S
    temporal_ids = lstart + jnp.arange(Lw)
    temporal_valid = temporal_ids < st.n_kf * S

    Rw = lim.reuse_chunks * S
    reuse_ids = jnp.clip(st.reuse_lid, 0) * S + jnp.arange(Rw)
    reuse_on = (st.reuse_lid >= 0) & (st.reuse_ttl > 0)
    reuse_valid = reuse_on & (reuse_ids < st.n_kf * S) \
        & pid_alive(reuse_ids, st.kf_lid, lim)

    # Bank re-seed window: landmarks of a bank place (evicted from the
    # ring) staged by the maintenance program after a bank closure/reloc.
    seed_ids = SEED_BASE + jnp.arange(lim.seed_slots)
    seed_valid = jnp.full(lim.seed_slots, st.seed_ttl > 0)

    local_ids = jnp.concatenate([temporal_ids, reuse_ids, seed_ids])
    local_alive = jnp.concatenate([temporal_valid, reuse_valid, seed_valid])
    local_phys = pid_phys(local_ids, lim)

    with jax.named_scope("arena_unpack"):
        pt_sd = brief.to_signed(brief.unpack_bits(st.pt_desc))
    arena = (st.pt_pos, pt_sd, st.pt_valid, st.pt_angle, st.pt_normal,
             st.pt_mind, st.pt_maxd)
    gate = 1.0 + st.n_lost.astype(jnp.float32)

    # fused_step indexes the arena with PHYSICAL rows; its candidate chain
    # (state.pids) must be physical too, with evicted chunks masked out.
    pids_log = st.track.pids
    alive_in = pid_alive(pids_log, st.kf_lid, lim, seed_ok=st.seed_ttl > 0)
    track_in = st.track._replace(
        pids=jnp.where(alive_in, pid_phys(pids_log, lim), -1))
    with jax.named_scope("tracking"):
        out = fused_step(fd, track_in, local_phys, local_alive, arena,
                         gate, cfg)

    # Translate returned physical pids back to logical via the chunk's
    # current tenant (exact: a chunk visible to matching IS its tenant's);
    # seed rows (>= K*S) map back into the SEED_BASE logical range.
    def to_logical(phys):
        owner = st.kf_lid[jnp.clip(phys, 0) // S % K]
        ring_log = owner * S + jnp.clip(phys, 0) % S
        return jnp.where(phys >= PT, SEED_BASE + phys - PT,
                         jnp.where(phys >= 0, ring_log, -1))

    track2 = out.state._replace(pids=to_logical(out.state.pids))

    vec = out.scalars.vec
    ok = vec[_V_OK] > 0.5
    n_inl = vec[_V_INL].astype(jnp.int32)
    tracked_close = vec[_V_TRACKED_CLOSE]
    untracked_close = vec[_V_UNTRACKED_CLOSE]

    first = st.n_kf == 0
    if cfg.sensor == "monocular":
        # No depth bootstrap: the map only appears through _mono_init,
        # and until then the frame is simply not tracked.
        boot = jnp.bool_(False)
        mono_inited = (st.n_kf == 2) & (st.frames_since_kf == 0) \
            & st.track.ok
    else:
        boot = first & (fd.feats.valid.sum() >= 500)
        mono_inited = jnp.bool_(False)
    # On the mono-init frame, if the tracking gates failed, keep the
    # freshly-initialized pose rather than freezing at the last one.
    use_init = mono_inited & ~ok
    pose = SE3(jnp.where(first, jnp.eye(3),
                         jnp.where(use_init, st.track.R, track2.R)),
               jnp.where(first, jnp.zeros(3),
                         jnp.where(use_init, st.track.t, track2.t)))
    ok = ok | boot | mono_inited
    track = track2._replace(R=pose.R, t=pose.t, ok=ok)

    # ---- keyframe policy (NeedNewKeyFrame, Tracking.cc:1049-1140;
    # mapper is inline so bLocalMappingIdle is always true).  The ring
    # arena never fills — an insertion recycles the row K keyframes back.
    peak = jnp.maximum(st.peak_inliers, n_inl)
    fsk = st.frames_since_kf + 1
    need_close = (tracked_close < 100) & (untracked_close > 70)
    ratio = (t_cfg.kf_ref_ratio_mono if cfg.sensor == "monocular"
             else t_cfg.kf_ref_ratio_stereo)
    c1a = fsk >= t_cfg.max_frames_between_kf
    c1b = fsk >= t_cfg.min_frames_between_kf
    c2 = ((n_inl < (ratio * peak.astype(jnp.float32))) | need_close)
    need_kf = ok & (n_inl > t_cfg.min_inliers_kf) & (c1a | (c1b & c2))
    need_kf = (need_kf & ~mono_inited) | boot

    st = st._replace(track=track, dyn=dyn2, peak_inliers=peak,
                     frames_since_kf=fsk,
                     fr_desc=fd.feats.desc, fr_uv=fd.feats.uv,
                     fr_depth=fd.depth, fr_valid=fd.feats.valid,
                     reuse_ttl=jnp.maximum(st.reuse_ttl - 1, 0),
                     seed_ttl=jnp.maximum(st.seed_ttl - 1, 0))
    with jax.named_scope("keyframe_ba"):
        st = jax.lax.cond(
            need_kf,
            lambda s: _create_keyframe(s, fd, spawn_ok, pose, local_ids,
                                       local_alive, cfg, lim),
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

    # ---- trajectory ring (true ring: frame f lives at f % F; finish()
    # unwraps and reports how many early frames the ring dropped)
    row = jnp.concatenate([ok.astype(jnp.float32)[None],
                           st.track.R.reshape(9), st.track.t,
                           (st.n_kf - 1).astype(jnp.float32)[None]])
    fi = st.frame_idx % lim.max_frames
    traj = jax.lax.dynamic_update_slice(st.traj, row[None], (fi, 0))
    return st._replace(traj=traj, frame_idx=st.frame_idx + 1)


# --------------------------------------------------------------------- #
# host driver
# --------------------------------------------------------------------- #


#: Process-wide jitted-step cache: two RealtimeSlam sessions with the
#: same (cfg, lim) share ONE compiled executable.  Without this each
#: instance's `jax.jit(lambda ...)` is a distinct function identity, so
#: a second session recompiles ~35 MB of TPU code and can push the
#: client past its executable-retention budget (docs/TPU_BACKEND_NOTES
#: §2) — after which EVERY dispatch re-ships the program (~200 ms).
_STEP_CACHE: dict = {}


def _cached_step(cfg: SystemConfig, lim: RTLimits):
    try:
        key = (cfg, lim)
        hash(key)
    except TypeError:                        # unhashable config field
        key = None
    if key is not None and key in _STEP_CACHE:
        return _STEP_CACHE[key]
    step = jax.jit(lambda g, d, b, s, st: rt_step(g, d, b, s, st, cfg, lim))
    if key is not None:
        _STEP_CACHE[key] = step
        # Bounded (oldest-out): the retention win is the same-config
        # case; a host cycling many configs must not pin executables
        # for the process lifetime.
        while len(_STEP_CACHE) > 8:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
    return step


class RealtimeSlam:
    """Dispatch-only host loop around `rt_step` (+ the optional
    `slam.maintenance` loop-closing/relocalization program).

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
                 detector=None, detect_every: int = 10,
                 vocabulary=None, maintain_every: int = 8):
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
          vocabulary: optional slam.vocabulary.Vocabulary — enables the
            in-graph maintenance program (BoW loop closing +
            relocalization, slam/maintenance.py), dispatched every
            ``maintain_every`` frames with no readback.
        """
        self.cfg = cfg
        self.lim = lim or RTLimits()
        self.detector = detector
        self.detect_every = max(int(detect_every), 1)
        self.maintain_every = max(int(maintain_every), 1)
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
        self._step = _cached_step(cfg, self.lim)
        nb = cfg.dynamic.max_boxes
        self._no_boxes = jnp.full((nb, 4), -1.0, jnp.float32)

        self.maint = None
        self.mstate = None
        if vocabulary is not None:
            from . import maintenance
            self.maint = maintenance.Maintainer(cfg, self.lim, vocabulary)
            self.mstate = self.maint.init_state()

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
        if self.maint is not None \
                and len(self.stamps) % self.maintain_every == 0:
            self.state, self.mstate = self.maint.step(
                self.state, self.mstate, np.uint32(self._seed))
        self._since_sync += 1
        if self._since_sync >= self.pipeline_depth:
            jax.block_until_ready(self.state.track.ok)
            self._since_sync = 0

    def track_stereo(self, gray_left, gray_right, stamp: float,
                     boxes=None) -> None:
        """Stereo entry: identical zero-sync pipeline with in-graph
        row-band disparity depth (requires cfg.sensor == 'stereo')."""
        assert self.cfg.sensor == "stereo", \
            "construct with cfg.sensor='stereo'"
        self.track(gray_left, gray_right, stamp, boxes=boxes)

    def track_mono(self, gray, stamp: float, boxes=None) -> None:
        """Monocular entry: zero-sync pipeline with in-graph two-view
        initialization and triangulation-based point spawning (requires
        cfg.sensor == 'monocular'; map scale is normalized to median
        scene depth 1 at initialization, Tracking.cc:756-780)."""
        assert self.cfg.sensor == "monocular", \
            "construct with cfg.sensor='monocular'"
        if not hasattr(self, "_zero_depth"):
            h, w = self.cfg.camera.height, self.cfg.camera.width
            self._zero_depth = jnp.zeros((h, w), jnp.uint16)
        self.track(gray, self._zero_depth, stamp, boxes=boxes)

    def block(self) -> None:
        """Wait for all dispatched frames (still no readback)."""
        jax.block_until_ready(self.state)

    def finish(self) -> dict:
        """THE readback: trajectory (Twc centers derivable), keyframes and
        the point map, as numpy — plus honest saturation/health counters."""
        st = self.state
        F = self.lim.max_frames
        total = len(self.stamps)
        n_dropped = max(0, total - F)
        traj = np.asarray(st.traj)
        if total <= F:
            traj = traj[:total]
        else:
            # unwrap the ring: oldest surviving frame first
            traj = np.roll(traj, -(total % F), axis=0)
        stamps = np.asarray(self.stamps[n_dropped:])
        n_kf = int(st.n_kf)
        kf_lid = np.asarray(st.kf_lid)
        live = kf_lid >= 0
        order = np.argsort(kf_lid[live])     # oldest -> newest
        rows = np.nonzero(live)[0][order]
        out = {
            "stamps": stamps,
            "ok": traj[:, 0] > 0.5,
            "R": traj[:, 1:10].reshape(-1, 3, 3),
            "t": traj[:, 10:13],
            "n_kf": n_kf,
            "n_kf_live": int(live.sum()),
            "kf_evicted": max(0, n_kf - self.lim.max_kf),
            "frames_dropped": n_dropped,
            "kf_R": np.asarray(st.kf_R)[rows],
            "kf_t": np.asarray(st.kf_t)[rows],
            "kf_frame": np.asarray(st.kf_frame)[rows],
            "kf_lid": kf_lid[rows],
            # Full observation structure (lid-ordered rows) so
            # slam.handoff can rebuild a host MapArena for offline
            # refinement / checkpointing / loop-capable re-processing.
            "kf_obs": np.asarray(st.kf_obs)[rows],
            "kf_desc": np.asarray(st.kf_desc)[rows],
            "kf_w": np.asarray(st.kf_w)[rows],
            "kf_kp_valid": np.asarray(st.kf_kp_valid)[rows],
            "kf_pid": np.asarray(st.kf_pid)[rows],
            "pt_pos": np.asarray(st.pt_pos),
            "pt_valid": np.asarray(st.pt_valid),
            "pt_desc": np.asarray(st.pt_desc),
            "pt_angle": np.asarray(st.pt_angle),
            "budget": int(st.budget),
            "n_ba_culled": int(st.n_ba_culled),
            "n_assoc": int(st.n_assoc),
            "limits": self.lim,
        }
        if self.maint is not None:
            out.update(self.maint.report(self.mstate))
        return out
