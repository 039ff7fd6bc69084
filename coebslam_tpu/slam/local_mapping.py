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
            K_OUT = 640      # compacted output rows per neighbor

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

                res = jax.vmap(one)(nbr_idx, v2)
                # Compact: only ~a few hundred keypoints triangulate per
                # pair; fetching the full [B, N, 3] point block wastes
                # ~3x the wire.  top_k floats the good rows to the front.
                _, sel = jax.lax.top_k(res.good.astype(jnp.float32), K_OUT)
                good = jnp.take_along_axis(res.good, sel, axis=1)
                idx2 = jnp.take_along_axis(res.idx2, sel, axis=1)
                pts = jnp.take_along_axis(
                    res.points, sel[..., None], axis=1)
                # ONE output leaf: device->host transfers pay ~70-140 ms
                # LATENCY each on the degraded client regardless of size
                # (docs/TPU_BACKEND_NOTES.md §1), so a 4-leaf result costs
                # 4x what this [B, K, 6] pack does.
                return jnp.concatenate(
                    [sel.astype(jnp.float32)[..., None],
                     good.astype(jnp.float32)[..., None],
                     idx2.astype(jnp.float32)[..., None], pts], axis=-1)

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
        return {"res": res,
                "nbrs": nbrs, "n_keep": len(keep), "v1_len": v1.shape[0]}

    def _tri_writeback(self, kf_id: int, pending) -> None:
        m = self.map
        packed = np.asarray(jax.device_get(pending["res"]))
        idx1_all = packed[..., 0].astype(np.int64)
        good_all = packed[..., 1] > 0.5
        idx2_all = packed[..., 2].astype(np.int64)
        pts_all = packed[..., 3:6]
        nbrs, n_keep = pending["nbrs"], pending["n_keep"]

        # Sequential-semantics dedup: the reference marks a keypoint
        # associated as soon as one neighbor triangulates it, so later
        # neighbors skip it; here the first (best-covisible) neighbor wins.
        claimed = np.zeros(pending["v1_len"], bool)
        # Respect associations made since dispatch (async interleave).
        claimed |= m.kf_obs_pt[kf_id] >= 0
        for b, nb in enumerate(nbrs[:n_keep]):
            good = good_all[b] & ~claimed[idx1_all[b]]
            # A neighbor keypoint may also have been claimed meanwhile.
            nb_free = m.kf_obs_pt[int(nb)] < 0
            good &= nb_free[idx2_all[b]]
            if not good.any():
                continue
            rows = np.nonzero(good)[0]
            slots1 = idx1_all[b][rows]
            # Two compacted rows can map to the same keypoint only across
            # neighbors (claimed handles that); within one neighbor top_k
            # indices are unique.
            claimed[slots1] = True
            slots2 = idx2_all[b][rows]
            pts = pts_all[b][rows]
            ids = m.add_points(pts, m.kf_desc[kf_id][slots1],
                               first_kf=kf_id,
                               angles=m.kf_angle[kf_id][slots1])
            ok = ids >= 0
            # New points have empty observation rows — wire both views with
            # direct column assignment (no per-point free-slot search).
            s1, s2, pid = slots1[ok], slots2[ok], ids[ok]
            m.kf_obs_pt[kf_id, s1] = pid
            m.kf_obs_pt[int(nb), s2] = pid
            m.pt_obs_kf[pid, 0] = kf_id
            m.pt_obs_slot[pid, 0] = s1
            m.pt_obs_kf[pid, 1] = int(nb)
            m.pt_obs_slot[pid, 1] = s2
            m.update_point_stats(pid)
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
        # Age is measured in insertion SEQUENCE numbers, not ids: keyframe
        # ids are recycled after culling, so id arithmetic aliases tenants.
        age = m.kf_seq_counter - 1 - m.pt_first_seq[pids]
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
        for b, nb in enumerate(pending["nbrs"]):
            nb = int(nb)
            slots = slots_all[b][:n_own]
            cand = (slots >= 0) & m.pt_valid[own_pids]
            if not cand.any():
                continue
            pids_c = own_pids[cand]
            slots_c = slots[cand]
            # De-duplicate target slots (two own points claiming the same
            # neighbor keypoint: first wins, as in the sequential reference).
            _, first = np.unique(slots_c, return_index=True)
            pids_c, slots_c = pids_c[first], slots_c[first]
            other = m.kf_obs_pt[nb, slots_c]

            # Case 1 — unclaimed keypoint: extend the track (batched; each
            # pid appears once per neighbor, so free-column search is a
            # single argmax over the obs rows).
            ext = other < 0
            if ext.any():
                p_ext, s_ext = pids_c[ext], slots_c[ext]
                rows = m.pt_obs_kf[p_ext]
                free = rows < 0
                has_free = free.any(1)
                col = np.argmax(free, 1)
                p_ext, s_ext, col = p_ext[has_free], s_ext[has_free], \
                    col[has_free]
                m.kf_obs_pt[nb, s_ext] = p_ext
                m.pt_obs_kf[p_ext, col] = nb
                m.pt_obs_slot[p_ext, col] = s_ext

            # Case 2 — duplicate landmark: keep the better-observed one
            # (rare; python loop over actual merges only).
            dup = (other >= 0) & (other != pids_c) \
                & m.pt_valid[np.clip(other, 0, None)]
            if dup.any():
                own_counts = m.point_observation_count(pids_c[dup])
                other_counts = m.point_observation_count(other[dup])
                for pid_own, oth, co, ct in zip(pids_c[dup], other[dup],
                                                own_counts, other_counts):
                    if not (m.pt_valid[pid_own] and m.pt_valid[oth]):
                        continue
                    keep, drop = (int(pid_own), int(oth)) if co >= ct \
                        else (int(oth), int(pid_own))
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
        kf_fixed = np.ones(K, bool)
        kf_valid = np.zeros(K, bool)
        kf_fixed[:len(window)] = fixed
        kf_valid[:len(window)] = True

        n_pts = min(len(pts), P)
        pts = pts[:n_pts]
        pt_ids = np.zeros(P, np.int32)
        pt_ids[:n_pts] = pts
        pt_valid = np.zeros(P, bool)
        pt_valid[:n_pts] = True

        # Packed observation table: (global kf, slot) per cell, encoded in
        # one int32 so the whole window uploads ~200 KB; uv/ur/level gather
        # from the device KF mirror in-graph (the old host-side fill
        # shipped ~1 MB of obs_uvr/w per keyframe).
        okf = m.pt_obs_kf[pts]          # [n, MAX_OBS]
        oslot = m.pt_obs_slot[pts]
        in_window = np.isin(okf, window) & (okf >= 0)
        order = np.argsort(~in_window, axis=1, kind="stable")[:, :M]
        sel = np.take_along_axis(in_window, order, 1)
        gkf = np.take_along_axis(okf, order, 1)
        gslot = np.take_along_axis(oslot, order, 1)
        n_kp = m.kf_uv.shape[1]
        packed = np.full((P, M), -1, np.int32)
        packed[:n_pts] = np.where(sel, gkf * n_kp + gslot, -1)

        kf_index_map = np.full(m.kf_R.shape[0] + 1, -1, np.int32)
        for g, w_idx in kf_index.items():
            kf_index_map[g] = w_idx

        if not hasattr(self, "_jit_ba_assemble"):
            cam, optcfg = self.cfg.camera, self.cfg.optimizer
            sf2 = jnp.float32(self.cfg.orb.scale_factor ** 2)
            NKP = n_kp
            KW = WINDOW_KF

            def assemble_solve(kf_feats, kf_poses, pts_dev, window_ids,
                               kf_fixed, kf_valid, win_of_kf, pt_ids,
                               pt_valid, packed):
                uv_a, _, lvl_a, ur_a, _ = kf_feats
                R_a, t_a = kf_poses
                ok = packed >= 0
                code = jnp.maximum(packed, 0)
                g = code // NKP
                s = code % NKP
                widx = jnp.where(ok, win_of_kf[g], -1)
                uv = uv_a[g, s]
                ur = ur_a[g, s]
                lvl = lvl_a[g, s].astype(jnp.float32)
                obs_uvr = jnp.concatenate([uv, ur[..., None]], -1)
                obs_w = 1.0 / (sf2 ** lvl)
                prob = local_ba.BAProblem(
                    kf_R=R_a[window_ids], kf_t=t_a[window_ids],
                    kf_fixed=kf_fixed, kf_valid=kf_valid,
                    pt_pos=pts_dev[0][pt_ids], pt_valid=pt_valid,
                    obs_kf=widx, obs_uvr=obs_uvr, obs_w=obs_w,
                    obs_valid=ok & (widx >= 0))
                res = local_ba.optimize_local_ba(prob, cam, optcfg)
                # ONE output leaf (see _tri_dispatch's pack rationale).
                return jnp.concatenate(
                    [res.kf_R.reshape(-1), res.kf_t.reshape(-1),
                     res.pt_pos.reshape(-1),
                     res.obs_valid.astype(jnp.float32).reshape(-1)])

            self._jit_ba_assemble = jax.jit(assemble_solve)

        window_ids = np.zeros(WINDOW_KF, np.int32)
        window_ids[:len(window)] = window
        from . import map_device
        dm = map_device.sync(m, self.cfg)
        result = self._jit_ba_assemble(
            dm.kf_feats, dm.kf_poses, dm.points,
            jnp.asarray(window_ids), jnp.asarray(kf_fixed),
            jnp.asarray(kf_valid), jnp.asarray(kf_index_map),
            jnp.asarray(pt_ids), jnp.asarray(pt_valid),
            jnp.asarray(packed))
        return {"result": result, "window": window, "fixed": fixed,
                "pts": pts, "n_pts": n_pts, "okf": okf, "oslot": oslot,
                "in_window": in_window, "packed": packed}

    def _ba_writeback(self, kf_id: int, pending) -> None:
        m = self.map
        window, fixed = pending["window"], pending["fixed"]
        pts, n_pts = pending["pts"], pending["n_pts"]
        flat = np.asarray(jax.device_get(pending["result"]))
        K, P, M = WINDOW_KF, WINDOW_PT, WINDOW_OBS
        o = 0
        new_R = flat[o:o + K * 9].reshape(K, 3, 3); o += K * 9
        new_t = flat[o:o + K * 3].reshape(K, 3); o += K * 3
        new_pos = flat[o:o + P * 3].reshape(P, 3); o += P * 3
        ov = flat[o:o + P * M].reshape(P, M) > 0.5

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
        in_window, packed = pending["in_window"], pending["packed"]
        ov = ov[:n_pts]
        filled = packed[:n_pts] >= 0
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
