"""Local mapping: the per-keyframe map-refinement pipeline.

TPU-native re-design of the `LocalMapping` thread (LocalMapping.cc:48-113,
SURVEY §3.2).  The reference runs mapping on a second thread racing the
tracker over a mutexed map; here each keyframe walks a small host-side
stage machine whose heavy stages are asynchronously dispatched device
programs:

  cull -> triangulate -> fuse -> local BA -> KF cull

In ``async_mode`` (production / bench) the machine advances at most one
stage per tracked frame via ``poll()`` — dispatch one device program,
return to the tracker, write its results back a frame later when the
device has finished.  The tracker keeps dispatching frames in between, so
mapping hides behind tracking exactly like the reference's mapper thread
(System.cc:100).  A new keyframe arriving mid-pipeline aborts the pending
local BA of the previous one (``mbAbortBA`` semantics, LocalMapping.cc:119,
Optimizer.cc:655-666) unless BA has already been starved twice.

In synchronous mode (default; deterministic for tests) ``process_keyframe``
drives the same machine to completion before returning.

Device data comes from the shared DeviceMap mirrors (map_device.py): point
arrays and per-KF feature blocks live on the TPU, so a triangulate/fuse
dispatch uploads only neighbor indices and masks (~20 KB) instead of
re-shipping descriptor blocks (~650 KB) every keyframe.

Pipeline stages (mirroring LocalMapping::Run):
  1. ProcessNewKeyFrame   — observation/covisibility wiring (done by the
                            arena at insertion, map.py)
  2. MapPointCulling      — found-ratio < 0.25 or too few observers
                            (LocalMapping.cc:171-206)
  3. CreateNewMapPoints   — epipolar triangulation against covisible
                            neighbors (LocalMapping.cc:208-453)
  4. SearchInNeighbors    — projection Fuse dedup across covisible KFs
  5. LocalBundleAdjustment (optim/local_ba.py)
  6. KeyFrameCulling      — >=90% redundant observations (LocalMapping.cc:633)
"""
from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..optim import local_ba
from ..ops import brief, matching as matching_ops
from .map import MapArena

WINDOW_KF = 16          # max optimized + fixed cameras in a BA window
WINDOW_PT = 4096        # max points in a window
WINDOW_OBS = 12         # max observations per point inside the window
N_FUSE_NBR = 10


def _age_ok(a: dict) -> bool:
    """Advance a pending stage after one full frame interval.

    `jax.Array.is_ready()` through the remote-TPU relay costs a round trip
    per leaf per poll — polling readiness is more expensive than the wait.
    One tracked frame (~30-60 ms wall) is comfortably longer than any
    mapper stage's device time, so a frame-count delay both avoids the
    poll RTTs and keeps the stage machine deterministic."""
    return a.get("age", 0) >= 1


class LocalMapper:
    def __init__(self, cfg: SystemConfig, arena: MapArena):
        self.cfg = cfg
        self.map = arena
        self.async_mode = False
        self._queue: List[int] = []
        self._active: Optional[dict] = None
        self._ba_skips = 0
        self.stage_ms = {}
        # Called with (dR, dt) — the newest window KF's pose delta — after
        # an asynchronous BA writeback, so the tracker can re-base its live
        # state (Tracker.apply_world_correction).
        self.on_pose_correction = None
        self._jit_ba = jax.jit(
            lambda prob: local_ba.optimize_local_ba(prob, cfg.camera,
                                                    cfg.optimizer))

    # ------------------------------------------------------------------ #
    # driver
    # ------------------------------------------------------------------ #

    def process_keyframe(self, kf_id: int) -> None:
        """Entry point on keyframe insertion."""
        if self.async_mode and self._active is not None:
            # Abort-pending-BA semantics: a new KF interrupts the previous
            # window's BA (LocalMapping.cc:119) — but never twice in a row,
            # so sustained fast insertion cannot starve BA entirely.
            if self._ba_skips < 2:
                self._active["skip_ba"] = True
                self._ba_skips += 1
        self._queue.append(kf_id)
        if self.async_mode:
            self.poll()
        else:
            self.poll(block=True)

    def poll(self, block: bool = False) -> None:
        """Advance the stage machine one step per call (one per tracked
        frame); ``block`` drives it to completion (synchronous mode)."""
        while True:
            if self._active is None:
                if not self._queue:
                    return
                kf = self._queue.pop(0)
                self._timed("cull_points", self.cull_map_points, kf)
                t0 = time.perf_counter()
                pending = self._tri_dispatch(kf)
                self._bump("triangulate", t0)
                self._active = {"kf": kf, "stage": "tri", "pending": pending,
                                "skip_ba": False, "age": 0}
                if not block:
                    return
            a = self._active
            if not block and a["pending"] is not None:
                a["age"] = a.get("age", 0) + 1
                if not _age_ok(a):
                    return
            kf = a["kf"]
            if a["stage"] == "tri":
                t0 = time.perf_counter()
                if a["pending"] is not None:
                    self._tri_writeback(kf, a["pending"])
                self._bump("triangulate", t0)
                t0 = time.perf_counter()
                a["pending"] = self._fuse_dispatch(kf)
                a["stage"] = "fuse"
                a["age"] = 0
                self._bump("fuse", t0)
            elif a["stage"] == "fuse":
                t0 = time.perf_counter()
                if a["pending"] is not None:
                    self._fuse_writeback(kf, a["pending"])
                self._bump("fuse", t0)
                if self.map.n_kf >= 3 and not a["skip_ba"]:
                    t0 = time.perf_counter()
                    a["pending"] = self._ba_dispatch(kf)
                    a["stage"] = "ba"
                    a["age"] = 0
                    self._bump("local_ba", t0)
                    self._ba_skips = 0
                else:
                    self._finish(kf)
            elif a["stage"] == "ba":
                t0 = time.perf_counter()
                if a["pending"] is not None:
                    self._ba_writeback(kf, a["pending"])
                self._bump("local_ba", t0)
                self._finish(kf)
            if not block:
                return
            if self._active is None and not self._queue:
                return

    def _finish(self, kf: int) -> None:
        self._timed("cull_kfs", self.cull_keyframes, kf)
        self._active = None

    def idle(self) -> bool:
        return self._active is None and not self._queue

    def flush(self) -> None:
        self.poll(block=True)

    def _timed(self, name, fn, *a):
        t0 = time.perf_counter()
        fn(*a)
        self._bump(name, t0)

    def _bump(self, name, t0):
        self.stage_ms[name] = self.stage_ms.get(name, 0.0) \
            + (time.perf_counter() - t0) * 1e3

    # ------------------------------------------------------------------ #
    # stage 3: CreateNewMapPoints (LocalMapping.cc:208-453)
    # ------------------------------------------------------------------ #

    def _tri_dispatch(self, kf_id: int):
        """Triangulate new landmarks from epipolar-matched unassociated
        keypoints against covisible neighbors — all neighbors in ONE
        device dispatch, feature blocks gathered from the device KF
        mirror (only masks + indices are uploaded)."""
        from ..geometry.se3 import SE3
        from ..ops import triangulation as tri

        m = self.map
        cfg = self.cfg
        mono = cfg.sensor == "monocular"
        n_nbr = (cfg.mapping.triangulation_neighbors_mono if mono
                 else cfg.mapping.triangulation_neighbors_rgbd)
        nbrs = m.best_covisible(kf_id, n_nbr)
        if len(nbrs) == 0:
            m.update_covisibility(kf_id)
            return None

        if not hasattr(self, "_jit_triangulate"):
            cam, orb, matcher = cfg.camera, cfg.orb, cfg.matcher

            def tri_all(kf_feats, kf_poses, k1, nbr_idx, v1, v2):
                uv_a, desc_a, lvl_a, ur_a, _ = kf_feats
                R_a, t_a = kf_poses
                sd1 = brief.to_signed(brief.unpack_bits(desc_a[k1]))
                T1 = SE3(R_a[k1], t_a[k1])

                def one(nb, v2row):
                    sd2 = brief.to_signed(brief.unpack_bits(desc_a[nb]))
                    T2 = SE3(R_a[nb], t_a[nb])
                    return tri.triangulate_pair(
                        uv_a[k1], sd1, v1, lvl_a[k1], uv_a[nb], sd2, v2row,
                        lvl_a[nb], ur_a[nb], T1, T2, cam, orb, matcher)

                return jax.vmap(one)(nbr_idx, v2)

            self._jit_triangulate = jax.jit(tri_all)

        # Baseline gate (LocalMapping.cc:244-262): RGB-D requires the
        # baseline to exceed the stereo baseline; monocular requires
        # baseline/median-depth > 0.01.  Evaluated host-side (cheap numpy).
        C1 = -m.kf_R[kf_id].T @ m.kf_t[kf_id]
        keep = []
        for nb in nbrs:
            nb = int(nb)
            C2 = -m.kf_R[nb].T @ m.kf_t[nb]
            baseline = float(np.linalg.norm(C1 - C2))
            if mono:
                depths = m.kf_depth[nb][m.kf_kp_valid[nb]]
                med = np.median(depths[depths > 0]) if (depths > 0).any() else 0
                if med > 0 and baseline / med < 0.01:
                    continue
            elif baseline < self.cfg.camera.baseline:
                continue
            if (m.kf_kp_valid[nb] & (m.kf_obs_pt[nb] < 0)).sum() >= 10:
                keep.append(nb)
        v1 = (m.kf_kp_valid[kf_id]) & (m.kf_obs_pt[kf_id] < 0)
        if not keep or v1.sum() < 10:
            m.update_covisibility(kf_id)
            return None
        # Pad the neighbor axis to the configured count so the vmapped
        # program compiles once (padding rows carry v2=False => no output).
        nbrs = np.asarray(keep + [keep[0]] * (n_nbr - len(keep)), np.int64)
        pad = np.arange(len(nbrs)) >= len(keep)
        v2 = m.kf_kp_valid[nbrs] & (m.kf_obs_pt[nbrs] < 0) & ~pad[:, None]

        from . import map_device
        dm = map_device.sync(m, self.cfg)
        res = self._jit_triangulate(
            dm.kf_feats, dm.kf_poses,
            jnp.int32(kf_id), jnp.asarray(nbrs.astype(np.int32)),
            jnp.asarray(v1), jnp.asarray(v2))
        return {"res": (res.good, res.idx2, res.points),
                "nbrs": nbrs, "n_keep": len(keep), "v1_len": v1.shape[0]}

    def _tri_writeback(self, kf_id: int, pending) -> None:
        m = self.map
        good_all, idx2_all, pts_all = jax.device_get(pending["res"])
        nbrs, n_keep = pending["nbrs"], pending["n_keep"]

        # Sequential-semantics dedup: the reference marks a keypoint
        # associated as soon as one neighbor triangulates it, so later
        # neighbors skip it; here the first (best-covisible) neighbor wins.
        claimed = np.zeros(pending["v1_len"], bool)
        # Respect associations made since dispatch (async interleave).
        claimed |= m.kf_obs_pt[kf_id] >= 0
        for b, nb in enumerate(nbrs[:n_keep]):
            good = good_all[b] & ~claimed
            if not good.any():
                continue
            # A neighbor keypoint may also have been claimed meanwhile.
            nb_free = m.kf_obs_pt[int(nb)] < 0
            good &= nb_free[idx2_all[b]]
            if not good.any():
                continue
            claimed |= good
            slots1 = np.nonzero(good)[0]
            slots2 = idx2_all[b][slots1]
            pts = pts_all[b][slots1]
            ids = m.add_points(pts, m.kf_desc[kf_id][slots1],
                               first_kf=kf_id,
                               angles=m.kf_angle[kf_id][slots1])
            ok = ids >= 0
            for s1, s2, pid in zip(slots1[ok], slots2[ok], ids[ok]):
                m.kf_obs_pt[kf_id, s1] = pid
                m._add_observation(int(pid), kf_id, int(s1))
                m.kf_obs_pt[int(nb), s2] = pid
                m._add_observation(int(pid), int(nb), int(s2))
            m.update_point_stats(ids[ok])
        m.update_covisibility(kf_id)

    # ------------------------------------------------------------------ #
    # stage 2: MapPointCulling (LocalMapping.cc:171-206)
    # ------------------------------------------------------------------ #

    def cull_map_points(self, kf_id: int) -> None:
        """Recently created points must be found in >=25% of the frames
        that predicted them visible and gather >=3 observations within
        their first keyframes."""
        m = self.map
        cfg = self.cfg.mapping
        pids = m.valid_points()
        if len(pids) == 0:
            return
        # Only recently created points are vetted (the reference's
        # mlpRecentAddedMapPoints list holds points for ~3 keyframes;
        # LocalMapping.cc:178-204) — mature points are never re-culled here.
        age = m.n_kf - 1 - m.pt_first_kf[pids]
        recent = age <= 3
        found_ratio = m.pt_found[pids] / np.maximum(m.pt_visible[pids], 1)
        obs_count = m.point_observation_count(pids)
        bad = recent & ((found_ratio < cfg.min_found_ratio)
                        | ((age >= 2) & (obs_count < cfg.min_observations)))
        for pid in pids[bad]:
            m.remove_point(int(pid))

    # ------------------------------------------------------------------ #
    # stage 4: SearchInNeighbors / Fuse (LocalMapping.cc:455-535)
    # ------------------------------------------------------------------ #

    def _fuse_dispatch(self, kf_id: int):
        """Project the new KF's points into covisible neighbors and find
        merge candidates (ORBmatcher::Fuse, ORBmatcher.cc:826).  Point data
        and neighbor feature blocks are device-resident; the dispatch
        uploads ids only, and the result is one [B, N] slot array."""
        m = self.map
        cfg = self.cfg
        neighbors = m.best_covisible(kf_id, N_FUSE_NBR)
        if len(neighbors) == 0:
            return None
        own = m.kf_obs_pt[kf_id]
        own_pids = own[own >= 0]
        if len(own_pids) == 0:
            return None

        if not hasattr(self, "_jit_fuse"):
            cam = cfg.camera
            th_low = cfg.matcher.th_low

            def fuse_all(pts, kf_feats, kf_poses, own_ids, own_valid,
                         nbr_idx):
                pos_a, sd_a = pts[0], pts[1]
                uv_a, desc_a, _, _, val_a = kf_feats
                R_a, t_a = kf_poses
                pos = pos_a[own_ids]
                own_signed = sd_a[own_ids]

                def one(nb):
                    R, t = R_a[nb], t_a[nb]
                    pc = pos @ R.T + t
                    z = jnp.maximum(pc[:, 2], 1e-6)
                    u = cam.fx * pc[:, 0] / z + cam.cx
                    v = cam.fy * pc[:, 1] / z + cam.cy
                    vis = own_valid & (pc[:, 2] > 0.05) & (u >= 0) \
                        & (u < cam.width) & (v >= 0) & (v < cam.height)
                    nb_signed = brief.to_signed(
                        brief.unpack_bits(desc_a[nb]))
                    ham = matching_ops.hamming_matrix(own_signed, nb_signed)
                    nb_uv = uv_a[nb]
                    close = (jnp.abs(nb_uv[None, :, 0] - u[:, None]) <= 3.0) \
                        & (jnp.abs(nb_uv[None, :, 1] - v[:, None]) <= 3.0) \
                        & val_a[nb][None, :]
                    ham = jnp.where(close, ham, 1e9)
                    slot = jnp.argmin(ham, 1).astype(jnp.int32)
                    hit = vis & (jnp.min(ham, 1) <= th_low)
                    return jnp.where(hit, slot, -1)

                return jax.vmap(one)(nbr_idx)

            self._jit_fuse = jax.jit(fuse_all)

        n_pad = m.kf_uv.shape[1]
        own_ids = np.zeros(n_pad, np.int32)
        own_ids[:len(own_pids)] = own_pids
        own_valid = np.zeros(n_pad, bool)
        own_valid[:len(own_pids)] = True

        nbp = np.asarray(list(neighbors)
                         + [int(neighbors[0])] * (N_FUSE_NBR - len(neighbors)),
                         np.int64)[:N_FUSE_NBR]
        from . import map_device
        dm = map_device.sync(m, self.cfg)
        slot_or_neg = self._jit_fuse(
            dm.points, dm.kf_feats, dm.kf_poses,
            jnp.asarray(own_ids), jnp.asarray(own_valid),
            jnp.asarray(nbp.astype(np.int32)))
        return {"slots": slot_or_neg, "own_pids": own_pids,
                "nbrs": nbp[:len(neighbors)]}

    def _fuse_writeback(self, kf_id: int, pending) -> None:
        m = self.map
        slots_all = np.asarray(jax.device_get(pending["slots"]))
        own_pids = pending["own_pids"]
        n_own = len(own_pids)
        # Vectorized prefetch of observation counts (the python loop below
        # touches only actual fuse candidates — few).
        for b, nb in enumerate(pending["nbrs"]):
            nb = int(nb)
            slots = slots_all[b][:n_own]
            cand = np.nonzero(slots >= 0)[0]
            if len(cand) == 0:
                continue
            own_counts = m.point_observation_count(own_pids[cand])
            for j, i in enumerate(cand):
                pid_own = int(own_pids[i])
                if not m.pt_valid[pid_own]:
                    continue
                slot = int(slots[i])
                other = int(m.kf_obs_pt[nb, slot])
                if other < 0:
                    # Unclaimed keypoint: extend this point's track.
                    m.kf_obs_pt[nb, slot] = pid_own
                    m._add_observation(pid_own, nb, slot)
                elif other != pid_own and m.pt_valid[other]:
                    # Duplicate landmark: keep the better-observed one.
                    keep, drop = (pid_own, other) \
                        if own_counts[j] \
                        >= m.point_observation_count([other])[0] \
                        else (other, pid_own)
                    m.replace_point(drop, keep)
        m.update_covisibility(kf_id)

    # ------------------------------------------------------------------ #
    # stage 5: LocalBundleAdjustment (Optimizer.cc:453-779)
    # ------------------------------------------------------------------ #

    def _ba_dispatch(self, kf_id: int):
        """Assemble the covisibility window and dispatch the jitted BA."""
        m = self.map
        opt_kfs = np.concatenate([[kf_id],
                                  m.best_covisible(kf_id, WINDOW_KF // 2 - 1)])
        opt_kfs = np.unique(opt_kfs)[:WINDOW_KF // 2]
        opt_set = set(int(k) for k in opt_kfs)

        pts = m.local_map_points(opt_kfs, WINDOW_PT)
        pts = pts[pts >= 0]

        # Fixed frontier: other KFs observing window points
        # (Optimizer.cc:490-504).
        obs_kfs = np.unique(m.pt_obs_kf[pts])
        obs_kfs = obs_kfs[obs_kfs >= 0]
        frontier = np.array([k for k in obs_kfs if int(k) not in opt_set],
                            dtype=np.int64)[:WINDOW_KF - len(opt_kfs)]
        window = np.concatenate([opt_kfs, frontier]).astype(np.int64)
        # Always anchor: fix the oldest KF in the window; plus frontier.
        fixed = np.zeros(len(window), bool)
        fixed[len(opt_kfs):] = True
        fixed[np.argmin(window)] = True
        kf_index = {int(k): i for i, k in enumerate(window)}

        K, P, M = WINDOW_KF, WINDOW_PT, WINDOW_OBS
        kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        kf_t = np.zeros((K, 3), np.float32)
        kf_fixed = np.ones(K, bool)
        kf_valid = np.zeros(K, bool)
        kf_R[:len(window)] = m.kf_R[window]
        kf_t[:len(window)] = m.kf_t[window]
        kf_fixed[:len(window)] = fixed
        kf_valid[:len(window)] = True

        n_pts = min(len(pts), P)
        pts = pts[:n_pts]
        pt_pos = np.zeros((P, 3), np.float32)
        pt_valid = np.zeros(P, bool)
        pt_pos[:n_pts] = m.pt_pos[pts]
        pt_valid[:n_pts] = True

        # Observation-table fill from the point back-references (native
        # runtime when available; python fallback otherwise).
        from .. import native

        okf = m.pt_obs_kf[pts]          # [n, MAX_OBS]
        oslot = m.pt_obs_slot[pts]
        in_window = np.isin(okf, window) & (okf >= 0)
        sf2 = (self.cfg.orb.scale_factor ** 2)
        kf_index_map = np.full(m.kf_R.shape[0], -1, np.int32)
        for g, w_idx in kf_index.items():
            kf_index_map[g] = w_idx

        obs_kf = np.full((P, M), -1, np.int32)
        obs_uvr = np.zeros((P, M, 3), np.float32)
        obs_w = np.ones((P, M), np.float32)
        obs_valid = np.zeros((P, M), bool)
        if native.available():
            okf_n, ouvr_n, ow_n, ov_n = native.fill_ba_obs_table(
                okf, oslot, kf_index_map, m.kf_uv, m.kf_ur, m.kf_level,
                sf2, M)
            obs_kf[:n_pts] = okf_n
            obs_uvr[:n_pts] = ouvr_n
            obs_w[:n_pts] = ow_n
            obs_valid[:n_pts] = ov_n
        else:
            for i in range(n_pts):
                cols = np.nonzero(in_window[i])[0][:M]
                for j, c in enumerate(cols):
                    k_global = int(okf[i, c])
                    s = int(oslot[i, c])
                    obs_kf[i, j] = kf_index[k_global]
                    uv = m.kf_uv[k_global, s]
                    obs_uvr[i, j] = (uv[0], uv[1], m.kf_ur[k_global, s])
                    obs_w[i, j] = 1.0 / (sf2 ** m.kf_level[k_global, s])
                    obs_valid[i, j] = True

        prob = local_ba.BAProblem(
            kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
            kf_fixed=jnp.asarray(kf_fixed), kf_valid=jnp.asarray(kf_valid),
            pt_pos=jnp.asarray(pt_pos), pt_valid=jnp.asarray(pt_valid),
            obs_kf=jnp.asarray(obs_kf), obs_uvr=jnp.asarray(obs_uvr),
            obs_w=jnp.asarray(obs_w), obs_valid=jnp.asarray(obs_valid))
        result = self._jit_ba(prob)
        return {"result": result, "window": window, "fixed": fixed,
                "pts": pts, "n_pts": n_pts, "okf": okf, "oslot": oslot,
                "in_window": in_window, "obs_kf": obs_kf}

    def _ba_writeback(self, kf_id: int, pending) -> None:
        m = self.map
        result = pending["result"]
        window, fixed = pending["window"], pending["fixed"]
        pts, n_pts = pending["pts"], pending["n_pts"]
        new_R, new_t, new_pos, ov = jax.device_get(
            (result.kf_R, result.kf_t, result.pt_pos, result.obs_valid))

        newest_delta = None
        for i, k in enumerate(window):
            if not fixed[i]:
                if int(k) == int(kf_id):
                    oR, ot = m.kf_R[int(k)].copy(), m.kf_t[int(k)].copy()
                    dR = oR.T @ new_R[i]
                    dt = oR.T @ (new_t[i] - ot)
                    newest_delta = (dR, dt)
                m.set_keyframe_pose(int(k), new_R[i], new_t[i])
        live = m.pt_valid[pts]       # points culled since dispatch stay dead
        m.pt_pos[pts[live]] = new_pos[:n_pts][live]
        m.mark_points_dirty(pts[live])
        m.bump()

        # Erase gated-out observations (Optimizer.cc:711-757).  Vectorized:
        # map each filled (i, j) table cell back to its source column, then
        # loop only over the actual removals (few).
        okf, oslot = pending["okf"], pending["oslot"]
        in_window, obs_kf = pending["in_window"], pending["obs_kf"]
        ov = ov[:n_pts]
        filled = obs_kf[:n_pts] >= 0
        # Source column of the j-th filled cell per row.
        order = np.argsort(~in_window, axis=1, kind="stable")   # in-window first
        src_col = order[:, :WINDOW_OBS]
        bad_i, bad_j = np.nonzero(filled & ~ov)
        for i, j in zip(bad_i, bad_j):
            if not m.pt_valid[pts[i]]:
                continue
            c = src_col[i, j]
            kf_g, slot = int(okf[i, c]), int(oslot[i, c])
            m._remove_observation(int(pts[i]), kf_g)
            if m.kf_obs_pt[kf_g, slot] == pts[i]:
                m.kf_obs_pt[kf_g, slot] = -1

        # NOTE: local-BA deltas are deliberately NOT pushed into the
        # tracker (on_pose_correction stays for loop closure): the
        # tracker's per-frame stage-2 solve re-bases onto the refined map
        # by itself, and out-of-band nudges measurably destabilize the
        # prediction chain.
        del newest_delta

    # ------------------------------------------------------------------ #
    # stage 6: KeyFrameCulling (LocalMapping.cc:633-697)
    # ------------------------------------------------------------------ #

    def cull_keyframes(self, kf_id: int) -> None:
        """A covisible KF whose points are >=90% observed by >=3 other KFs
        at the same-or-finer scale is redundant."""
        m = self.map
        cfg = self.cfg.mapping
        for k in m.best_covisible(kf_id, 10):
            k = int(k)
            if k == 0 or not m.kf_valid[k]:
                continue
            obs = m.kf_obs_pt[k]
            slots = np.nonzero(obs >= 0)[0]
            if len(slots) < 50:
                continue
            pids = obs[slots]
            counts = m.point_observation_count(pids)
            redundant = (counts >= cfg.kf_cull_min_obs + 1).sum()
            if redundant > cfg.kf_cull_redundancy_ratio * len(slots):
                m.remove_keyframe(k)

    # ------------------------------------------------------------------ #
    # compatibility wrappers (tests exercise stages individually)
    # ------------------------------------------------------------------ #

    def create_new_map_points(self, kf_id: int) -> None:
        pending = self._tri_dispatch(kf_id)
        if pending is not None:
            self._tri_writeback(kf_id, pending)

    def fuse_neighbors(self, kf_id: int) -> None:
        pending = self._fuse_dispatch(kf_id)
        if pending is not None:
            self._fuse_writeback(kf_id, pending)

    def run_local_ba(self, kf_id: int) -> None:
        pending = self._ba_dispatch(kf_id)
        self._ba_writeback(kf_id, pending)
