"""Loop closing: detection, Sim3 computation, correction, pose graph, GBA.

Re-design of the `LoopClosing` thread (LoopClosing.cc:58-777, SURVEY §3.3)
as a host-driven procedure over the arena, with every solve jitted:

  detect      — BoW candidates below the covisibility min-score, kept only
                after 3 consecutive consistent detections (LoopClosing.cc:
                104-212, threshold at :44)
  compute_sim3— descriptor matches current KF <-> candidate's points ->
                batched 3-point Horn RANSAC (ops/procrustes; the reference's
                Sim3Solver) -> OptimizeSim3 refinement -> guided projection
                of the loop neighborhood for >= 40 total matches
                (LoopClosing.cc:232-401)
  correct     — propagate the corrected pose to the current covisibility
                group + its points, fuse duplicates, add the loop edge, run
                the essential-graph optimization, then (bounded) global BA
                (LoopClosing.cc:403-750)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Set

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import se3 as se3_mod
from ..geometry.se3 import SE3
from ..geometry.sim3 import Sim3
from ..optim import pose_graph as pg_mod
from ..optim import sim3_opt
from ..ops import brief, matching, procrustes
from .keyframe_db import KeyFrameDatabase
from .map import MapArena

MAX_EDGES = 4096


class LoopCloser:
    def __init__(self, cfg: SystemConfig, arena: MapArena,
                 kf_db: KeyFrameDatabase, mapper=None):
        self.cfg = cfg
        self.map = arena
        self.db = kf_db
        self.mapper = mapper
        self._global_ba = None      # lazy slam.global_ba.GlobalBA
        self._rng = jax.random.PRNGKey(13)
        # Sequence number (NOT keyframe id — ids are recycled) of the last
        # accepted loop; gates re-detection for 10 insertions.
        self.last_loop_seq = -(10 ** 9)
        self._consistency: List[Dict] = []   # prior candidate groups
        self.loop_edges: List = []           # (kf_a, kf_b) accepted loops
        self.n_loops_closed = 0

    # ------------------------------------------------------------------ #

    def insert_keyframe(self, kf_id: int) -> None:
        cand = self.detect(kf_id)
        if cand < 0:
            return
        ok, S_corr = self.compute_sim3(kf_id, cand)
        if not ok:
            return
        self.correct(kf_id, cand, S_corr)
        self.n_loops_closed += 1

    # ------------------------------------------------------------------ #

    def detect(self, kf_id: int) -> int:
        """Returns a consistent loop-candidate KF id or -1."""
        m = self.map
        seq = int(m.kf_seq[kf_id])
        if seq < 10 or seq - self.last_loop_seq < 10:
            self._consistency = []
            return -1
        # minScore: lowest BoW similarity among covisible neighbors
        # (LoopClosing.cc:122-139).
        nbrs = m.covisible_keyframes(kf_id, min_weight=15)
        if len(nbrs) == 0:
            return -1
        sims = self.db.score_kf(kf_id, nbrs)
        min_score = float(sims.min()) * self.cfg.loop.min_score_factor

        cands = self.db.detect_loop_candidates(kf_id, min_score)
        if len(cands) == 0:
            self._consistency = []
            return -1

        # Covisibility-consistency over 3 consecutive KFs
        # (LoopClosing.cc:153-212).
        new_groups = []
        chosen = -1
        for c in cands:
            group = set(int(k) for k in m.covisible_keyframes(int(c), 1))
            group.add(int(c))
            count = 0
            for prev in self._consistency:
                if group & prev["group"]:
                    count = prev["count"] + 1
                    break
            new_groups.append({"group": group, "count": count})
            if count >= self.cfg.loop.covisibility_consistency_threshold \
                    and chosen < 0:
                chosen = int(c)
        self._consistency = new_groups
        return chosen

    # ------------------------------------------------------------------ #

    def _kf_point_table(self, kf: int):
        obs = self.map.kf_obs_pt[kf]
        slots = np.nonzero((obs >= 0) & self.map.pt_valid[np.clip(obs, 0, None)])[0]
        return slots, obs[slots]

    def compute_sim3(self, kf_id: int, cand: int):
        """Returns (ok, corrected Sim3 S_cw for the current KF)."""
        m = self.map
        cfg = self.cfg
        self.last_debug = {"stage": "points", "n1": 0, "n2": 0}
        slots1, pids1 = self._kf_point_table(kf_id)
        slots2, pids2 = self._kf_point_table(cand)
        self.last_debug.update(n1=len(pids1), n2=len(pids2))
        if len(pids1) < cfg.loop.min_bow_matches \
                or len(pids2) < cfg.loop.min_bow_matches:
            return False, None

        # Descriptor matching between the two KFs' map points.
        d1 = brief.to_signed(brief.unpack_bits(jnp.asarray(m.pt_desc[pids1])))
        d2 = brief.to_signed(brief.unpack_bits(jnp.asarray(m.pt_desc[pids2])))
        dist = matching.hamming_matrix(d1, d2)
        res = matching.match(dist, max_distance=cfg.matcher.th_low,
                             ratio=cfg.matcher.nn_ratio_bow, mutual=True)
        sel = np.asarray(res.valid)
        self.last_debug.update(stage="match", n_match=int(sel.sum()))
        if sel.sum() < cfg.loop.min_bow_matches:
            return False, None

        # Matched landmark positions in each KF's camera frame.
        idx2 = np.asarray(res.idx)
        T1 = SE3(jnp.asarray(m.kf_R[kf_id]), jnp.asarray(m.kf_t[kf_id]))
        T2 = SE3(jnp.asarray(m.kf_R[cand]), jnp.asarray(m.kf_t[cand]))
        X1_w = jnp.asarray(m.pt_pos[pids1])
        X2_w = jnp.asarray(m.pt_pos[pids2[np.clip(idx2, 0, None)]])
        p1_c1 = se3_mod.transform_points(T1, X1_w)
        p2_c2 = se3_mod.transform_points(T2, X2_w)
        uv1 = jnp.asarray(m.kf_uv[kf_id, slots1])
        uv2 = jnp.asarray(m.kf_uv[cand, slots2[np.clip(idx2, 0, None)]])

        # RANSAC Sim3 (fixed scale for RGB-D): src = cam2 coords,
        # dst = cam1 coords; S12 maps cam2 -> cam1.
        self._rng, key = jax.random.split(self._rng)
        align = procrustes.ransac_alignment(
            p2_c2, p1_c1, jnp.asarray(sel), key,
            n_hypotheses=cfg.loop.sim3_ransac_iters,
            cam=cfg.camera, obs_uv=uv1, px_threshold=6.0,
            with_scale=(cfg.sensor == "monocular"))
        self.last_debug.update(stage="ransac", ransac_inl=int(align.n_inliers))
        if int(align.n_inliers) < cfg.loop.sim3_ransac_min_inliers:
            return False, None

        S12 = Sim3(align.scale, align.R, align.t)
        opt = sim3_opt.optimize_sim3(
            S12, p1_c1, p2_c2, uv1, uv2,
            jnp.asarray(sel) & align.inliers, cfg.camera, cfg.optimizer,
            fix_scale=(cfg.sensor != "monocular"))
        self.last_debug.update(stage="sim3opt", sim3_inl=int(opt.n_inliers))
        if int(opt.n_inliers) < cfg.loop.min_sim3_inliers:
            return False, None

        # Guided projection against the loop neighborhood for total support
        # (SearchBySim3/SearchByProjection stage, LoopClosing.cc:330-401).
        nbr = np.concatenate([[cand], m.best_covisible(cand, 10)])
        nbr_pts = m.local_map_points(nbr, 4096)
        nbr_pts = nbr_pts[nbr_pts >= 0]
        # Stashed for CorrectLoop's SearchAndFuse (the reference's
        # mvpLoopMapPoints, LoopClosing.cc:373-380).
        self._loop_pts = nbr_pts.copy()
        S1w = opt.S12.compose(Sim3.from_se3(T2.R, T2.t))   # corrected S_cw
        Xn_w = jnp.asarray(m.pt_pos[nbr_pts])
        pn_c1 = S1w.apply(Xn_w)
        from ..geometry import camera as cam_ops
        uv_pred = cam_ops.project(cfg.camera, pn_c1)
        vis = (pn_c1[:, 2] > 0.05) \
            & (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cfg.camera.width) \
            & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cfg.camera.height)
        dn = brief.to_signed(brief.unpack_bits(jnp.asarray(m.pt_desc[nbr_pts])))
        dmat = matching.hamming_matrix(
            brief.to_signed(brief.unpack_bits(jnp.asarray(m.kf_desc[kf_id]))),
            dn)
        kf_uv = jnp.asarray(m.kf_uv[kf_id])
        du = jnp.abs(kf_uv[:, None, 0] - uv_pred[None, :, 0])
        dv = jnp.abs(kf_uv[:, None, 1] - uv_pred[None, :, 1])
        dmat = dmat + jnp.where((du <= 8.0) & (dv <= 8.0), 0.0, matching.BIG)
        res2 = matching.match(dmat, max_distance=cfg.matcher.th_low,
                              mutual=True,
                              row_valid=jnp.asarray(m.kf_kp_valid[kf_id]),
                              col_valid=vis)
        total = int(res2.valid.sum())
        self.last_debug.update(stage="guided", total=total)
        if total < cfg.loop.min_total_matches:
            return False, None
        self.last_debug.update(stage="accepted")
        return True, S1w

    # ------------------------------------------------------------------ #

    def correct(self, kf_id: int, cand: int, S_corr: Sim3) -> None:
        """CorrectLoop (LoopClosing.cc:403-750)."""
        m = self.map
        # Snapshot pre-correction poses: essential-graph edges between
        # uncorrected keyframes must be measured in the drifted-but-
        # consistent frame (the reference's NonCorrectedSim3 map,
        # LoopClosing.cc:444-517).
        self._snapshot_R = m.kf_R.copy()
        self._snapshot_t = m.kf_t.copy()
        T_old = Sim3.from_se3(jnp.asarray(m.kf_R[kf_id]),
                              jnp.asarray(m.kf_t[kf_id]))
        # S_new_cw = S_corr for the current KF; neighbors: S_new = S_rel*S_corr
        group = np.concatenate([[kf_id], m.covisible_keyframes(kf_id, 1)])

        corrections = {}
        for k in group:
            k = int(k)
            T_k = Sim3.from_se3(jnp.asarray(m.kf_R[k]), jnp.asarray(m.kf_t[k]))
            S_rel = T_k.compose(T_old.inverse())       # k relative to current
            S_new = S_rel.compose(S_corr)              # corrected k pose
            corrections[k] = (T_k, S_new)

        # Move the group's points (X_new = S_new^-1( S_old(X) ) via owning
        # KF) and ALWAYS update each group pose — a KF whose points were all
        # moved already still needs its own pose corrected.
        moved: Set[int] = set()
        for k, (T_k, S_new) in corrections.items():
            mtx = np.asarray(S_new.to_se3_matrix())
            Rn = mtx[:3, :3]
            for _ in range(2):          # polar re-projection onto SO(3)
                Rn = 1.5 * Rn - 0.5 * Rn @ Rn.T @ Rn
            m.set_keyframe_pose(k, Rn, mtx[:3, 3])
            obs = m.kf_obs_pt[k]
            pids = obs[obs >= 0]
            pids = pids[m.pt_valid[pids]]
            pids = np.asarray([p for p in pids if p not in moved])
            if len(pids) == 0:
                continue
            moved.update(int(p) for p in pids)
            X = jnp.asarray(m.pt_pos[pids])
            X_new = S_new.inverse().apply(T_k.apply(X))
            m.pt_pos[pids] = np.asarray(X_new)
            m.mark_points_dirty(pids)
            m.bump()

        self.loop_edges.append((kf_id, cand))
        self.last_loop_seq = int(m.kf_seq[kf_id])
        self._consistency = []

        # SearchAndFuse (LoopClosing.cc:521-543, 588-614): project the loop
        # neighborhood's map points into every corrected keyframe and fuse
        # duplicated landmarks; the covisibility links this creates across
        # the loop ("fused connections", LoopClosing.cc:546-568) become
        # extra essential-graph edges.
        group_ids = [int(k) for k in group]
        pre_nbrs = {k: set(int(j) for j in m.covisible_keyframes(k, 1))
                    for k in group_ids}
        self._search_and_fuse(group_ids)
        fused = []
        group_set = set(group_ids)
        for k in group_ids:
            post = set(int(j) for j in m.covisible_keyframes(k, 1))
            for j in post - pre_nbrs[k] - group_set:
                fused.append((k, j))
        self._fused_edges = fused

        self.run_pose_graph(fixed_kf=cand)
        # Full global BA after the essential-graph solve, exactly like the
        # reference's RunGlobalBundleAdjustment (LoopClosing.cc:576-580,
        # 646-750).  The mapper is drained first so nothing is created
        # mid-solve (the reference's spanning-tree catch-up propagation is
        # then vacuous — the solve is a single device program, not a
        # detached minutes-long thread).
        if self.mapper is not None:
            self.mapper.flush()
        if self._global_ba is None:
            from .global_ba import GlobalBA
            self._global_ba = GlobalBA(self.cfg)
        self._global_ba.run(self.map, fixed_kf=cand)

    # ------------------------------------------------------------------ #

    def _search_and_fuse(self, group_ids) -> None:
        """Project the stashed loop map points into each corrected-group KF
        (matcher::Fuse with the corrected pose, LoopClosing.cc:521-543):
        a keypoint that already observes a landmark gets it REPLACED by the
        loop point (the older, loop-side landmark wins — MapPoint::Replace
        semantics at :604-607); a free keypoint gains an observation.

        One vmapped device program over the group; host writeback touches
        only actual hits."""
        m = self.map
        cfg = self.cfg
        loop_pts = getattr(self, "_loop_pts", None)
        if loop_pts is None or len(loop_pts) == 0 or len(group_ids) == 0:
            return
        loop_pts = loop_pts[m.pt_valid[loop_pts]]
        if len(loop_pts) == 0:
            return

        if not hasattr(self, "_jit_saf"):
            cam = cfg.camera
            th_low = cfg.matcher.th_low

            def saf(pts, kf_feats, kf_poses, pt_ids, pt_valid, kf_idx):
                pos_a, sd_a = pts[0], pts[1]
                uv_a, desc_a, _, _, val_a = kf_feats
                R_a, t_a = kf_poses
                pos = pos_a[pt_ids]
                sd = sd_a[pt_ids]

                def one(k):
                    R, t = R_a[k], t_a[k]
                    pc = pos @ R.T + t
                    z = jnp.maximum(pc[:, 2], 1e-6)
                    u = cam.fx * pc[:, 0] / z + cam.cx
                    v = cam.fy * pc[:, 1] / z + cam.cy
                    vis = pt_valid & (pc[:, 2] > 0.05) & (u >= 0) \
                        & (u < cam.width) & (v >= 0) & (v < cam.height)
                    nb_sd = brief.to_signed(brief.unpack_bits(desc_a[k]))
                    ham = matching.hamming_matrix(sd, nb_sd)
                    # Fuse radius 4 px (LoopClosing.cc:540 th=4).
                    close = (jnp.abs(uv_a[k][None, :, 0] - u[:, None]) <= 4.0) \
                        & (jnp.abs(uv_a[k][None, :, 1] - v[:, None]) <= 4.0) \
                        & val_a[k][None, :]
                    ham = jnp.where(close, ham, 1e9)
                    slot = jnp.argmin(ham, 1).astype(jnp.int32)
                    hit = vis & (jnp.min(ham, 1) <= th_low)
                    return jnp.where(hit, slot, -1)

                return jax.vmap(one)(kf_idx)

            self._jit_saf = jax.jit(saf)

        P = 4096
        pt_ids = np.zeros(P, np.int32)
        n = min(len(loop_pts), P)
        pt_ids[:n] = loop_pts[:n]
        pt_valid = np.zeros(P, bool)
        pt_valid[:n] = True
        from . import map_device
        dm = map_device.sync(m, cfg)
        slots = np.asarray(jax.device_get(self._jit_saf(
            dm.points, dm.kf_feats, dm.kf_poses,
            jnp.asarray(pt_ids), jnp.asarray(pt_valid),
            jnp.asarray(np.asarray(group_ids, np.int32)))))

        for b, k in enumerate(group_ids):
            hits = np.nonzero(slots[b][:n] >= 0)[0]
            if len(hits) == 0:
                continue
            # One keypoint slot can win several loop points: keep the first
            # (hits iterate in loop-point order, mirroring the reference's
            # sequential Fuse).
            seen = set()
            for i in hits:
                lp = int(pt_ids[i])
                s = int(slots[b][i])
                if s in seen or not m.pt_valid[lp]:
                    continue
                seen.add(s)
                cur = int(m.kf_obs_pt[k, s])
                if cur == lp:
                    continue
                if cur >= 0 and m.pt_valid[cur]:
                    # Duplicate landmark across the loop: loop point wins.
                    m.replace_point(cur, lp)
                elif not (m.pt_obs_kf[lp] == k).any():
                    m.kf_obs_pt[k, s] = lp
                    m._add_observation(lp, k, s)
        for k in group_ids:
            m.update_covisibility(k)
        m.bump()

    def run_pose_graph(self, fixed_kf: int) -> None:
        """Build + solve the essential graph over all valid keyframes."""
        m = self.map
        cfg = self.cfg
        kfs = m.valid_keyframes()
        if len(kfs) < 3:
            return
        K = int(kfs.max()) + 1

        edges_i, edges_j = [], []
        # Spanning tree edges.
        for k in kfs:
            p = m.kf_parent[k]
            if p >= 0 and m.kf_valid[p]:
                edges_i.append(int(k))
                edges_j.append(int(p))
        # Strong covisibility edges (weight >= 100).
        cov = m.covis[:K, :K]
        ii, jj = np.nonzero(np.triu(cov, 1)
                            >= cfg.loop.essential_graph_min_covis)
        edges_i += ii.tolist()
        edges_j += jj.tolist()
        # Loop edges + fused cross-loop connections (SearchAndFuse output):
        # both are measured from the CORRECTED poses below — they encode
        # the closure, not the drift (LoopConnections at LoopClosing.cc:568).
        fresh = [e for e in getattr(self, "_fused_edges", [])
                 if m.kf_valid[e[0]] and m.kf_valid[e[1]]]
        fresh += [e for e in self.loop_edges
                  if m.kf_valid[e[0]] and m.kf_valid[e[1]]]
        for a, b in fresh:
            edges_i.append(int(a))
            edges_j.append(int(b))

        E = len(edges_i)
        if E == 0:
            return
        ei = np.asarray(edges_i, np.int32)
        ej = np.asarray(edges_j, np.int32)
        n_loop = len(fresh)
        # Non-loop edges: measured from the PRE-correction snapshot (drifted
        # but internally consistent); loop edges: from the corrected poses.
        # This is what makes the graph distribute the loop correction.
        snap_R = getattr(self, "_snapshot_R", m.kf_R)
        snap_t = getattr(self, "_snapshot_t", m.kf_t)
        Ri, ti = snap_R[ei].copy(), snap_t[ei].copy()
        Rj, tj = snap_R[ej].copy(), snap_t[ej].copy()
        if n_loop:
            Ri[-n_loop:] = m.kf_R[ei[-n_loop:]]
            ti[-n_loop:] = m.kf_t[ei[-n_loop:]]
            Rj[-n_loop:] = m.kf_R[ej[-n_loop:]]
            tj[-n_loop:] = m.kf_t[ej[-n_loop:]]
        R_rel = np.einsum("eij,ekj->eik", Ri, Rj)      # Ri Rj^T
        t_rel = ti - np.einsum("eij,ej->ei", R_rel, tj)

        valid_k = np.zeros(K, bool)
        valid_k[kfs] = True
        fixed = np.zeros(K, bool)
        fixed[fixed_kf] = True
        fixed[~valid_k] = True

        prob = pg_mod.PoseGraphProblem(
            s=jnp.ones(K), R=jnp.asarray(m.kf_R[:K]),
            t=jnp.asarray(m.kf_t[:K]),
            fixed=jnp.asarray(fixed), valid=jnp.asarray(valid_k),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_s=jnp.ones(E), edge_R=jnp.asarray(R_rel),
            edge_t=jnp.asarray(t_rel), edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.ones(E))
        out = pg_mod.optimize_pose_graph(
            prob, cfg.optimizer, fix_scale=(cfg.sensor != "monocular"))

        # Recover SE3 poses and remap points through their first-observing KF.
        new_R = np.asarray(out.R)
        # Newton polar re-projection (see geometry.so3.orthonormalize): the
        # scan of Sim3 composes leaves small manifold drift.
        for _ in range(2):
            new_R = 1.5 * new_R \
                - 0.5 * new_R @ new_R.transpose(0, 2, 1) @ new_R
        new_t = np.asarray(out.t) / np.asarray(out.s)[:, None]
        old_R = m.kf_R[:K].copy()
        old_t = m.kf_t[:K].copy()
        pids = m.valid_points()
        owner = m.pt_first_kf[pids]
        ok = (owner >= 0) & valid_k[np.clip(owner, 0, K - 1)]
        pids, owner = pids[ok], owner[ok]
        X = m.pt_pos[pids]
        Xc = np.einsum("pij,pj->pi", old_R[owner], X) + old_t[owner]
        Rn = new_R[owner]
        X_new = np.einsum("pji,pj->pi", Rn, Xc - new_t[owner])
        m.pt_pos[pids] = X_new
        m.mark_points_dirty(pids)
        m.bump()
        for k in kfs:
            m.set_keyframe_pose(int(k), new_R[k], new_t[k])
