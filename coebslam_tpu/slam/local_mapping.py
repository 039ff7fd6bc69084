"""Local mapping: the per-keyframe map-refinement pipeline.

TPU-native re-design of the `LocalMapping` thread (LocalMapping.cc:48-113,
SURVEY §3.2): instead of a mapper thread racing the tracker over a mutexed
map, keyframe insertion triggers a synchronous-but-jitted refinement step —
the host assembles a fixed-shape covisibility window from the arena,
dispatches one Schur-complement BA program, and writes results back.  (On
TPU the BA program runs asynchronously on its own; the host only blocks
when it reads the results, preserving the reference's latency split without
shared-state races.)

Pipeline per keyframe (mirroring LocalMapping::Run):
  1. ProcessNewKeyFrame   — observation/covisibility wiring (done by the
                            arena at insertion, map.py)
  2. MapPointCulling      — found-ratio < 0.25 or too few observers
                            (LocalMapping.cc:171-206)
  3. CreateNewMapPoints   — RGB-D spawning happens at tracking time; the
                            epipolar triangulation path lands with the
                            monocular milestone
  4. SearchInNeighbors    — projection Fuse dedup across covisible KFs
  5. LocalBundleAdjustment (optim/local_ba.py)
  6. KeyFrameCulling      — >=90% redundant observations (LocalMapping.cc:633)
"""
from __future__ import annotations

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


class LocalMapper:
    def __init__(self, cfg: SystemConfig, arena: MapArena):
        self.cfg = cfg
        self.map = arena
        self.recent_points: List[np.ndarray] = []   # per-KF spawned ids
        self._jit_ba = jax.jit(
            lambda prob: local_ba.optimize_local_ba(prob, cfg.camera,
                                                    cfg.optimizer))

    # ------------------------------------------------------------------ #

    def process_keyframe(self, kf_id: int) -> None:
        """Run the mapping pipeline for a freshly inserted keyframe."""
        import time as _t
        self.stage_ms = getattr(self, "stage_ms", {})

        def timed(name, fn, *a):
            t0 = _t.perf_counter()
            fn(*a)
            self.stage_ms[name] = self.stage_ms.get(name, 0.0) \
                + (_t.perf_counter() - t0) * 1e3

        timed("cull_points", self.cull_map_points, kf_id)
        timed("triangulate", self.create_new_map_points, kf_id)
        timed("fuse", self.fuse_neighbors, kf_id)
        if self.map.n_kf >= 3:
            timed("local_ba", self.run_local_ba, kf_id)
        timed("cull_kfs", self.cull_keyframes, kf_id)

    # ------------------------------------------------------------------ #

    def create_new_map_points(self, kf_id: int) -> None:
        """CreateNewMapPoints (LocalMapping.cc:208-453): triangulate new
        landmarks from epipolar-matched unassociated keypoints against
        covisible neighbors.  Essential for monocular; for RGB-D it adds
        far points beyond the depth range (the reference behaves the same:
        RGB-D only skips triangulation for close points)."""
        from ..geometry.se3 import SE3
        from ..ops import triangulation as tri

        m = self.map
        cfg = self.cfg
        mono = cfg.sensor == "monocular"
        n_nbr = (cfg.mapping.triangulation_neighbors_mono if mono
                 else cfg.mapping.triangulation_neighbors_rgbd)
        nbrs = m.best_covisible(kf_id, n_nbr)
        if len(nbrs) == 0:
            return
        if not hasattr(self, "_jit_triangulate"):
            # All neighbors in ONE dispatch: vmap over the neighbor axis.
            # Per-neighbor calls each pay the dispatch round trip (~40 ms on
            # a tunneled TPU), which dominated this stage.
            self._jit_triangulate = jax.jit(jax.vmap(
                lambda uv1, d1, v1, l1, uv2, d2, v2, l2, ur2, T1, T2:
                tri.triangulate_pair(uv1, d1, v1, l1, uv2, d2, v2, l2, ur2,
                                     T1, T2, cfg.camera, cfg.orb,
                                     cfg.matcher),
                in_axes=(None, None, 0, None, 0, 0, 0, 0, 0, None, 0)))

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
            return
        # Pad the neighbor axis to the configured count so the vmapped
        # program compiles once (padding rows carry v2=False => no output).
        nbrs = np.asarray(keep + [keep[0]] * (n_nbr - len(keep)), np.int64)
        pad = np.arange(len(nbrs)) >= len(keep)

        T1 = SE3(jnp.asarray(m.kf_R[kf_id]), jnp.asarray(m.kf_t[kf_id]))
        uv1 = jnp.asarray(m.kf_uv[kf_id])
        l1 = jnp.asarray(m.kf_level[kf_id])
        d1 = _signed_jnp(m.kf_desc[kf_id])
        v2 = m.kf_kp_valid[nbrs] & (m.kf_obs_pt[nbrs] < 0) & ~pad[:, None]
        res = self._jit_triangulate(
            uv1, d1, jnp.asarray(np.tile(v1, (len(nbrs), 1))), l1,
            jnp.asarray(m.kf_uv[nbrs]), _signed_jnp(m.kf_desc[nbrs]),
            jnp.asarray(v2), jnp.asarray(m.kf_level[nbrs]),
            jnp.asarray(m.kf_ur[nbrs]), T1,
            SE3(jnp.asarray(m.kf_R[nbrs]), jnp.asarray(m.kf_t[nbrs])))
        good_all, idx2_all, pts_all = jax.device_get(
            (res.good, res.idx2, res.points))

        # Sequential-semantics dedup: the reference marks a keypoint
        # associated as soon as one neighbor triangulates it, so later
        # neighbors skip it; here the first (best-covisible) neighbor wins.
        claimed = np.zeros(v1.shape[0], bool)
        for b, nb in enumerate(nbrs[:len(keep)]):
            good = good_all[b] & ~claimed
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

    def cull_map_points(self, kf_id: int) -> None:
        """MapPointCulling (LocalMapping.cc:171-206): recently created points
        must be found in >=25% of the frames that predicted them visible and
        gather >=3 observations within their first keyframes."""
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

    def fuse_neighbors(self, kf_id: int) -> None:
        """SearchInNeighbors / ORBmatcher::Fuse (LocalMapping.cc:455-535,
        ORBmatcher.cc:826): project the new KF's points into covisible
        neighbors and merge duplicates (same landmark observed under two
        ids)."""
        m = self.map
        cam = self.cfg.camera
        neighbors = m.best_covisible(kf_id, 10)
        if len(neighbors) == 0:
            return
        own = m.kf_obs_pt[kf_id]
        own_pids = own[own >= 0]
        if len(own_pids) == 0:
            return

        # Device-side projection + windowed Hamming matching, all neighbors
        # batched into one dispatch (per-neighbor calls each paid the ~40 ms
        # relay round trip).
        N_FUSE_NBR = 10
        if not hasattr(self, "_jit_fuse"):
            def fuse_match(pos, own_signed, R, t, nb_uv, nb_signed, nb_valid):
                pc = pos @ R.T + t
                z = jnp.maximum(pc[:, 2], 1e-6)
                u = cam.fx * pc[:, 0] / z + cam.cx
                v = cam.fy * pc[:, 1] / z + cam.cy
                vis = (pc[:, 2] > 0.05) & (u >= 0) & (u < cam.width) \
                    & (v >= 0) & (v < cam.height)
                ham = matching_ops.hamming_matrix(own_signed, nb_signed)
                close = (jnp.abs(nb_uv[None, :, 0] - u[:, None]) <= 3.0) \
                    & (jnp.abs(nb_uv[None, :, 1] - v[:, None]) <= 3.0) \
                    & nb_valid[None, :]
                ham = jnp.where(close, ham, 1e9)
                return vis, jnp.argmin(ham, 1).astype(jnp.int32), jnp.min(ham, 1)

            self._jit_fuse = jax.jit(jax.vmap(
                fuse_match, in_axes=(None, None, 0, 0, 0, 0, 0)))

        n_pad = m.kf_uv.shape[1]
        pos_pad = np.zeros((n_pad, 3), np.float32)
        pos_pad[:len(own_pids)] = m.pt_pos[own_pids]
        desc_pad = np.zeros((n_pad, 32), np.uint8)
        desc_pad[:len(own_pids)] = m.pt_desc[own_pids]

        nbp = np.asarray(list(neighbors)
                         + [int(neighbors[0])] * (N_FUSE_NBR - len(neighbors)),
                         np.int64)[:N_FUSE_NBR]
        pad = np.arange(len(nbp)) >= len(neighbors)
        vis_a, slot_a, dist_a = jax.device_get(self._jit_fuse(
            jnp.asarray(pos_pad), _signed_jnp(desc_pad),
            jnp.asarray(m.kf_R[nbp]), jnp.asarray(m.kf_t[nbp]),
            jnp.asarray(m.kf_uv[nbp]), _signed_jnp(m.kf_desc[nbp]),
            jnp.asarray(m.kf_kp_valid[nbp] & ~pad[:, None])))

        for b, nb in enumerate(nbp[:len(neighbors)]):
            nb = int(nb)
            vis = vis_a[b][:len(own_pids)]
            best_slot = slot_a[b][:len(own_pids)]
            best_dist = dist_a[b][:len(own_pids)]
            for i in np.nonzero(vis & (best_dist <= self.cfg.matcher.th_low))[0]:
                pid_own = int(own_pids[i])
                slot = int(best_slot[i])
                other = int(m.kf_obs_pt[nb, slot])
                if other < 0:
                    # Unclaimed keypoint: extend this point's track.
                    if m.pt_valid[pid_own]:
                        m.kf_obs_pt[nb, slot] = pid_own
                        m._add_observation(pid_own, int(nb), slot)
                elif other != pid_own and m.pt_valid[other] and m.pt_valid[pid_own]:
                    # Duplicate landmark: keep the better-observed one.
                    keep, drop = (pid_own, other) \
                        if m.point_observation_count([pid_own])[0] \
                        >= m.point_observation_count([other])[0] \
                        else (other, pid_own)
                    m.replace_point(drop, keep)
        m.update_covisibility(kf_id)

    # ------------------------------------------------------------------ #

    def run_local_ba(self, kf_id: int) -> None:
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

        # Write back poses + points.
        new_R = np.asarray(result.kf_R)[:len(window)]
        new_t = np.asarray(result.kf_t)[:len(window)]
        for i, k in enumerate(window):
            if not fixed[i]:
                m.set_keyframe_pose(int(k), new_R[i], new_t[i])
        m.pt_pos[pts] = np.asarray(result.pt_pos)[:n_pts]
        m.bump()

        # Erase gated-out observations (Optimizer.cc:711-757).  Vectorized:
        # map each filled (i, j) table cell back to its source column, then
        # loop only over the actual removals (few).
        ov = np.asarray(result.obs_valid)[:n_pts]
        filled = obs_kf[:n_pts] >= 0
        # Source column of the j-th filled cell per row.
        order = np.argsort(~in_window, axis=1, kind="stable")   # in-window first
        src_col = order[:, :M]
        bad_i, bad_j = np.nonzero(filled & ~ov)
        for i, j in zip(bad_i, bad_j):
            c = src_col[i, j]
            kf_g, slot = int(okf[i, c]), int(oslot[i, c])
            m._remove_observation(int(pts[i]), kf_g)
            if m.kf_obs_pt[kf_g, slot] == pts[i]:
                m.kf_obs_pt[kf_g, slot] = -1

    # ------------------------------------------------------------------ #

    def cull_keyframes(self, kf_id: int) -> None:
        """KeyFrameCulling (LocalMapping.cc:633-697): a covisible KF whose
        points are >=90% observed by >=3 other KFs at the same-or-finer scale
        is redundant."""
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


def _signed(desc_u8: np.ndarray) -> np.ndarray:
    bits = np.unpackbits(desc_u8, axis=1, bitorder="little")
    return (bits.astype(np.int8) * 2 - 1)


def _signed_jnp(desc_u8: np.ndarray):
    from ..ops import brief
    return brief.to_signed(brief.unpack_bits(jnp.asarray(desc_u8)))
