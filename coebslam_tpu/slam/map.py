"""Fixed-capacity map arena: keyframes, points, observations, covisibility.

The TPU-native replacement for the reference's pointer graph (`Map` +
`KeyFrame` + `MapPoint`, SURVEY §2.1 rows Map/KeyFrame/MapPoint): instead of
std::set<KeyFrame*> with per-object mutexes, the map is a set of
fixed-capacity SoA arrays with validity masks, mutated only by the host
orchestration thread (device steps are pure functions of snapshots, so the
reference's whole mutex protocol disappears).  Erase becomes mask-clearing;
`SetBadFlag` becomes a vectorized back-reference sweep.

Bookkeeping (covisibility counting, culling, local-map queries) is
vectorized numpy on the host — pointer-chasing work the TPU is wrong for —
while every array is laid out so device steps (matching, BA) can consume
zero-copy snapshots.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..config import SystemConfig

MAX_OBS_PER_POINT = 32


class MapArena:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        K = cfg.map.max_keyframes
        P = cfg.map.max_points
        N = cfg.orb.max_keypoints

        # --- keyframes ---
        self.kf_R = np.zeros((K, 3, 3), np.float32)
        self.kf_t = np.zeros((K, 3), np.float32)
        self.kf_stamp = np.zeros(K, np.float64)
        self.kf_valid = np.zeros(K, bool)
        self.kf_uv = np.zeros((K, N, 2), np.float32)
        self.kf_level = np.zeros((K, N), np.int32)
        self.kf_angle = np.zeros((K, N), np.float32)
        self.kf_desc = np.zeros((K, N, 32), np.uint8)
        self.kf_depth = np.zeros((K, N), np.float32)
        self.kf_ur = np.full((K, N), -1.0, np.float32)
        self.kf_kp_valid = np.zeros((K, N), bool)
        # point id observed at each keypoint slot, -1 = none.
        self.kf_obs_pt = np.full((K, N), -1, np.int32)
        # covisibility weight matrix (shared-point counts, KeyFrame
        # covisibility graph, KeyFrame.cc:289-379).
        self.covis = np.zeros((K, K), np.int32)
        # spanning tree parent (first covis connection, KeyFrame.cc:371-376).
        self.kf_parent = np.full(K, -1, np.int32)
        self.n_kf = 0
        # Monotonic insertion sequence (id recycling makes raw ids useless
        # as an age proxy): kf_seq[k] = how many KFs were inserted before k.
        self.kf_seq = np.zeros(K, np.int64)
        self.kf_seq_counter = 0

        # --- map points ---
        self.pt_pos = np.zeros((P, 3), np.float32)
        self.pt_valid = np.zeros(P, bool)
        self.pt_desc = np.zeros((P, 32), np.uint8)
        self.pt_normal = np.zeros((P, 3), np.float32)
        self.pt_min_dist = np.zeros(P, np.float32)
        self.pt_max_dist = np.zeros(P, np.float32)
        self.pt_angle = np.zeros(P, np.float32)    # representative kp angle
        self.pt_found = np.zeros(P, np.int32)      # MapPoint::IncreaseFound
        self.pt_visible = np.zeros(P, np.int32)    # MapPoint::IncreaseVisible
        self.pt_first_kf = np.full(P, -1, np.int32)
        self.pt_first_seq = np.full(P, -1, np.int64)   # creation kf_seq
        # observation back-references: (kf, slot) pairs per point.
        self.pt_obs_kf = np.full((P, MAX_OBS_PER_POINT), -1, np.int32)
        self.pt_obs_slot = np.full((P, MAX_OBS_PER_POINT), -1, np.int32)
        self.n_pt = 0
        self._free_pt: List[int] = []   # recycled point ids
        # Fuse redirect (MapPoint::Replace keeps mpReplaced so stale frame
        # references can follow the merge): replace_point(old, new) sets
        # pt_redirect[old] = new.
        self.pt_redirect = np.full(P, -1, np.int32)
        # Culled-KF re-anchoring: kf id -> (parent, R_cp, t_cp), the pose
        # relative to the parent at cull time (KeyFrame mTcp).
        self.kf_cull_rel = {}
        # Recycled keyframe ids (KF analogue of _free_pt): culling reclaims
        # capacity so long runs never exhaust the arena.  An id becomes
        # reusable only after its cull-relative chain is folded away and
        # on_keyframe_removed listeners re-anchored their references.
        self._free_kf: List[int] = []
        # Listeners called with the removed kf id BEFORE its id is recycled
        # (tracker re-anchors trajectory records; db erases the BoW row).
        self.on_keyframe_removed: List = []
        # Monotonic mutation counter: device-side mirrors (tracking keeps the
        # point arrays resident on the TPU) refresh when this changes.
        self.version = 0
        # Dirty-row masks drained by slam.map_device.DeviceMap.sync —
        # incremental device mirror updates instead of full re-uploads.
        self._dirty_pt = np.zeros(P, bool)
        self._dirty_kf = np.zeros(K, bool)
        self._dirty_all = True
        self._pose_version = 0

    def bump(self) -> None:
        self.version += 1

    def mark_points_dirty(self, pids) -> None:
        """External writers (BA writeback, loop correction) must call this
        after mutating point rows directly."""
        self._dirty_pt[np.asarray(pids, np.int64)] = True

    def mark_poses_dirty(self) -> None:
        self._pose_version += 1

    def anchored_pose(self, k: int):
        """World pose of KF k, walking the cull-parent chain if k was
        culled (SaveTrajectoryTUM's while(pKF->isBad()) loop,
        System.cc:351-360).  Returns (R, t, found)."""
        R_rel = np.eye(3, dtype=np.float32)
        t_rel = np.zeros(3, np.float32)
        for _ in range(64):
            if self.kf_valid[k]:
                R = R_rel @ self.kf_R[k]
                t = R_rel @ self.kf_t[k] + t_rel
                return R, t, True
            if k not in self.kf_cull_rel:
                break
            parent, Rcp, tcp = self.kf_cull_rel[k]
            R_rel, t_rel = R_rel @ Rcp, R_rel @ tcp + t_rel
            k = parent
        return self.kf_R[k], self.kf_t[k], False

    # ------------------------------------------------------------------ #
    # keyframes
    # ------------------------------------------------------------------ #

    def add_keyframe(self, R_cw, t_cw, stamp, uv, level, angle, desc, depth,
                     ur, kp_valid, point_ids) -> int:
        """Insert a keyframe snapshot; wires observations + covisibility.

        Args:
          point_ids: [N] int32 — map-point id per keypoint slot (-1 none).
        Returns the new keyframe id.
        """
        if self._free_kf:
            k = self._free_kf.pop()
            # Recycled slot: clear state a previous tenant left behind.
            self.kf_parent[k] = -1
            self.kf_cull_rel.pop(k, None)
        else:
            k = self.n_kf
            if k >= self.kf_R.shape[0]:
                raise RuntimeError("keyframe arena full")
            self.n_kf += 1
        self.kf_R[k] = R_cw
        self.kf_t[k] = t_cw
        self.kf_stamp[k] = stamp
        self.kf_uv[k] = uv
        self.kf_level[k] = level
        self.kf_angle[k] = angle
        self.kf_desc[k] = desc
        self.kf_depth[k] = depth
        self.kf_ur[k] = ur
        self.kf_kp_valid[k] = kp_valid
        self.kf_valid[k] = True
        self.kf_seq[k] = self.kf_seq_counter
        self.kf_seq_counter += 1
        self._dirty_kf[k] = True
        self._pose_version += 1

        pid = np.asarray(point_ids, np.int32).copy()
        pid[~np.asarray(kp_valid, bool)] = -1
        self.kf_obs_pt[k] = pid
        slots = np.nonzero(pid >= 0)[0]
        for s in slots:
            self._add_observation(int(pid[s]), k, int(s))
        self.update_covisibility(k)
        return k

    def update_covisibility(self, k: int) -> None:
        """Recount shared points between KF k and all others; set spanning
        parent on first connection (weight threshold 15, KeyFrame.cc:330)."""
        from .. import native

        obs = self.kf_obs_pt[k]
        observed = obs[obs >= 0]
        if len(observed) == 0:
            return
        if native.available():
            shared = native.covisibility_row(self.kf_obs_pt, int(k),
                                             self.n_kf,
                                             self.pt_pos.shape[0])
        else:
            mask = np.zeros(self.pt_pos.shape[0], bool)
            mask[observed] = True
            other = self.kf_obs_pt[:self.n_kf]        # [K', N]
            shared = (mask[np.clip(other, 0, None)] & (other >= 0)).sum(1)
        shared[k] = 0
        self.covis[k, :self.n_kf] = shared
        self.covis[:self.n_kf, k] = shared
        if self.kf_parent[k] < 0 and shared.max(initial=0) > 0:
            self.kf_parent[k] = int(np.argmax(shared))

    def covisible_keyframes(self, k: int, min_weight: int = 1,
                            top: Optional[int] = None) -> np.ndarray:
        w = self.covis[k, :self.n_kf] * self.kf_valid[:self.n_kf]
        ids = np.nonzero(w >= min_weight)[0]
        ids = ids[np.argsort(-w[ids])]
        if top is not None:
            ids = ids[:top]
        return ids

    def best_covisible(self, k: int, n: int) -> np.ndarray:
        """GetBestCovisibilityKeyFrames equivalent."""
        return self.covisible_keyframes(k, min_weight=1, top=n)

    def remove_keyframe(self, k: int) -> None:
        """SetBadFlag for keyframes: clear observations + covis row; orphan
        children re-parent to their best remaining covisible neighbor
        (KeyFrame.cc:453-540, simplified to best-covis re-parenting).

        Stores the culled KF's pose relative to its parent (the reference's
        mTcp, KeyFrame.cc:515) so trajectory export can re-anchor frames
        whose reference KF was culled (System.cc:351-360)."""
        parent = int(self.kf_parent[k])
        if parent < 0:
            parent = 0
        Rp, tp = self.kf_R[parent], self.kf_t[parent]
        Rcp = self.kf_R[k] @ Rp.T
        tcp = self.kf_t[k] - Rcp @ tp
        self.kf_cull_rel[k] = (parent, Rcp.copy(), tcp.copy())
        obs = self.kf_obs_pt[k]
        for s in np.nonzero(obs >= 0)[0]:
            self._remove_observation(int(obs[s]), k)
        self.kf_obs_pt[k] = -1
        self.kf_valid[k] = False
        # Re-anchor point ownership: pt_first_kf is used as the pose anchor
        # when warping points (pose graph / loop correction) — after k's id
        # is recycled it would alias the new tenant and warp points by an
        # unrelated delta.  Fall back to the first live observation.
        owned = np.nonzero(self.pt_first_kf[:self.n_pt] == k)[0]
        if len(owned):
            okf = self.pt_obs_kf[owned]
            live = (okf >= 0) & self.kf_valid[np.clip(okf, 0, None)]
            has = live.any(1)
            first = okf[np.arange(len(owned)), np.argmax(live, 1)]
            self.pt_first_kf[owned] = np.where(has, first, -1)
        self._dirty_kf[k] = True
        self.covis[k, :] = 0
        self.covis[:, k] = 0
        children = np.nonzero(self.kf_parent[:self.n_kf] == k)[0]
        for c in children:
            nb = self.covisible_keyframes(int(c), min_weight=1, top=1)
            self.kf_parent[c] = int(nb[0]) if len(nb) else self.kf_parent[k]

        # --- id recycling ---
        # 1. listeners re-anchor external references (trajectory records,
        #    BoW rows) while kf_cull_rel[k] still resolves k.
        for cb in self.on_keyframe_removed:
            cb(k)
        # 2. fold earlier culled KFs whose re-anchor chain passes through k,
        #    so no chain references k once it is reused.
        _, Rk, tk = self.kf_cull_rel[k]
        for j, (pj, Rj, tj) in list(self.kf_cull_rel.items()):
            if pj == k and j != k:
                self.kf_cull_rel[j] = (parent, Rj @ Rk, Rj @ tk + tj)
        # 3. reclaim the slot.  kf_cull_rel[k] is KEPT until the slot is
        #    actually reused (add_keyframe pops it): anchored_pose(k) must
        #    keep resolving the culled id in the interim — trajectory export
        #    and tests may query it directly without a removal listener.
        self._free_kf.append(k)

    # ------------------------------------------------------------------ #
    # points
    # ------------------------------------------------------------------ #

    def add_points(self, positions, descs, first_kf: int,
                   normals=None, min_dists=None, max_dists=None,
                   angles=None) -> np.ndarray:
        """Batch-create map points; returns their ids ([-1 where arena full])."""
        positions = np.atleast_2d(positions)
        m = len(positions)
        # Bulk id allocation: recycled slots first, then the arena tail.
        n_free = min(len(self._free_pt), m)
        alloc = [self._free_pt.pop() for _ in range(n_free)]
        n_tail = min(m - n_free, self.pt_pos.shape[0] - self.n_pt)
        alloc += list(range(self.n_pt, self.n_pt + n_tail))
        self.n_pt += n_tail
        ids = np.full(m, -1, np.int32)
        if alloc:
            sel = np.asarray(alloc, np.int64)
            k = len(sel)
            ids[:k] = sel
            self.pt_pos[sel] = positions[:k]
            self.pt_desc[sel] = np.atleast_2d(descs)[:k]
            self.pt_valid[sel] = True
            self.pt_found[sel] = 1
            self.pt_visible[sel] = 1
            self.pt_first_kf[sel] = first_kf
            self.pt_first_seq[sel] = self.kf_seq[first_kf] \
                if first_kf >= 0 else -1
            self.pt_obs_kf[sel] = -1
            self.pt_obs_slot[sel] = -1
            self.pt_redirect[sel] = -1    # recycled slot: clear stale merge
            if angles is not None:
                self.pt_angle[sel] = np.atleast_1d(angles)[:k]
            if normals is not None:
                self.pt_normal[sel] = np.atleast_2d(normals)[:k]
            if min_dists is not None:
                self.pt_min_dist[sel] = np.atleast_1d(min_dists)[:k]
                self.pt_max_dist[sel] = np.atleast_1d(max_dists)[:k]
            self._dirty_pt[sel] = True
        self.bump()
        return ids

    def _add_observation(self, pid: int, kf: int, slot: int) -> None:
        row = self.pt_obs_kf[pid]
        free = np.nonzero(row < 0)[0]
        if len(free) == 0:
            return
        self.pt_obs_kf[pid, free[0]] = kf
        self.pt_obs_slot[pid, free[0]] = slot

    def _remove_observation(self, pid: int, kf: int) -> None:
        sel = self.pt_obs_kf[pid] == kf
        self.pt_obs_kf[pid, sel] = -1
        self.pt_obs_slot[pid, sel] = -1
        if not (self.pt_obs_kf[pid] >= 0).any():
            self.remove_point(pid)

    def point_observation_count(self, pids) -> np.ndarray:
        return (self.pt_obs_kf[pids] >= 0).sum(-1)

    def resolve_ids(self, pids: np.ndarray) -> np.ndarray:
        """Follow fuse redirects and drop dead ids: stale per-frame match
        lists (pipelined tracking) stay usable across a fuse/cull boundary
        (MapPoint::Replace semantics)."""
        out = np.asarray(pids, np.int32).copy()
        for _ in range(3):                    # bounded redirect chains
            live = out >= 0
            r = self.pt_redirect[np.clip(out, 0, None)]
            follow = live & (r >= 0)
            if not follow.any():
                break
            out[follow] = r[follow]
        out[(out >= 0) & ~self.pt_valid[np.clip(out, 0, None)]] = -1
        return out

    def remove_point(self, pid: int) -> None:
        """MapPoint::SetBadFlag — clear forward references from keyframes."""
        kfs = self.pt_obs_kf[pid]
        slots = self.pt_obs_slot[pid]
        for kf, s in zip(kfs, slots):
            if kf >= 0:
                self.kf_obs_pt[kf, s] = -1
        self.pt_obs_kf[pid] = -1
        self.pt_obs_slot[pid] = -1
        self.pt_valid[pid] = False
        self._free_pt.append(pid)
        self._dirty_pt[pid] = True
        self.bump()

    def replace_point(self, old: int, new: int) -> None:
        """MapPoint::Replace — redirect observations of `old` to `new`
        (used by Fuse dedup)."""
        kfs = self.pt_obs_kf[old].copy()
        slots = self.pt_obs_slot[old].copy()
        self.pt_found[new] += self.pt_found[old]
        self.pt_visible[new] += self.pt_visible[old]
        for kf, s in zip(kfs, slots):
            if kf < 0:
                continue
            if (self.pt_obs_kf[new] == kf).any():
                # new already observed in this KF: drop the duplicate slot.
                self.kf_obs_pt[kf, s] = -1
            else:
                self.kf_obs_pt[kf, s] = new
                self._add_observation(new, kf, int(s))
        self.pt_obs_kf[old] = -1
        self.pt_obs_slot[old] = -1
        self.pt_valid[old] = False
        self.pt_redirect[old] = new
        self._free_pt.append(old)
        self._dirty_pt[old] = True
        self.bump()

    def update_point_stats(self, pids) -> None:
        """Recompute distinctive descriptor + normal + scale band for the
        given points (MapPoint::ComputeDistinctiveDescriptors min-median-
        Hamming, MapPoint.cc:287-298; UpdateNormalAndDepth, 367-368).

        The descriptor medians run in the native runtime when available
        (coebslam_tpu/native); geometry is vectorized numpy either way.
        """
        from .. import native

        sf = self.cfg.orb.scale_factor
        n_levels = self.cfg.orb.n_levels
        pids = np.atleast_1d(np.asarray(pids, np.int64))
        pids = pids[pids >= 0]
        if len(pids) == 0:
            return
        okf = self.pt_obs_kf[pids]
        oslot = self.pt_obs_slot[pids]
        has_obs = (okf >= 0).any(1)

        # --- distinctive descriptors (+ representative observation) ---
        if native.available():
            desc, bkf, bslot = native.distinctive_descriptors(
                self.kf_desc, okf, oslot)
            sel = has_obs & (bkf >= 0)
            self.pt_desc[pids[sel]] = desc[sel]
            self.pt_angle[pids[sel]] = self.kf_angle[bkf[sel], bslot[sel]]
        else:
            for i, pid in enumerate(pids):
                if not has_obs[i]:
                    continue
                s = okf[i] >= 0
                kf_ids, slots = okf[i][s], oslot[i][s]
                descs = self.kf_desc[kf_ids, slots]
                bits = np.unpackbits(descs, axis=1)
                ham = (bits[:, None, :] != bits[None, :, :]).sum(-1)
                best = int(np.argmin(np.median(ham, axis=1)))
                self.pt_desc[pid] = descs[best]
                self.pt_angle[pid] = self.kf_angle[kf_ids[best], slots[best]]

        # --- normals + scale bands, vectorized over all points/obs ---
        kf_safe = np.clip(okf, 0, None)
        Rk = self.kf_R[kf_safe]                         # [n, m, 3, 3]
        tk = self.kf_t[kf_safe]                         # [n, m, 3]
        centers = -np.einsum("nmji,nmj->nmi", Rk, tk)
        vecs = self.pt_pos[pids][:, None, :] - centers
        norms = np.linalg.norm(vecs, axis=-1)
        w = (okf >= 0).astype(np.float32)
        unit = vecs / np.maximum(norms, 1e-9)[..., None]
        nrm = (unit * w[..., None]).sum(1)
        nlen = np.linalg.norm(nrm, axis=-1, keepdims=True)
        self.pt_normal[pids[has_obs]] = (nrm / np.maximum(nlen, 1e-9))[has_obs]

        # Reference observation = first valid column.
        first = np.argmax(okf >= 0, axis=1)
        rng = np.arange(len(pids))
        ref_kf = okf[rng, first]
        ref_slot = oslot[rng, first]
        dist = norms[rng, first]
        level = self.kf_level[np.clip(ref_kf, 0, None), ref_slot]
        max_d = dist * (sf ** level)
        self.pt_max_dist[pids[has_obs]] = max_d[has_obs]
        self.pt_min_dist[pids[has_obs]] = (max_d / (sf ** (n_levels - 1)))[has_obs]
        self._dirty_pt[pids] = True
        self.bump()

    # ------------------------------------------------------------------ #
    # queries
    # ------------------------------------------------------------------ #

    def local_map_points(self, kf_ids, cap: int) -> np.ndarray:
        """All valid points observed by the given keyframes, padded/truncated
        to ``cap`` (Tracking::UpdateLocalPoints semantics)."""
        if len(kf_ids) == 0:
            return np.full(cap, -1, np.int32)
        pts = np.unique(self.kf_obs_pt[kf_ids])
        pts = pts[(pts >= 0)]
        pts = pts[self.pt_valid[pts]]
        out = np.full(cap, -1, np.int32)
        out[:min(len(pts), cap)] = pts[:cap]
        return out

    def keyframe_pose(self, k: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.kf_R[k], self.kf_t[k]

    def set_keyframe_pose(self, k: int, R, t) -> None:
        self.kf_R[k] = R
        self.kf_t[k] = t
        self._pose_version += 1

    def valid_keyframes(self) -> np.ndarray:
        return np.nonzero(self.kf_valid[:self.n_kf])[0]

    def valid_points(self) -> np.ndarray:
        return np.nonzero(self.pt_valid[:self.n_pt])[0]
