"""In-graph map maintenance for the zero-sync realtime mode: BoW loop
closing + relocalization as a SECOND small device program, dispatched by
the host every few frames with NO device->host readback.

This is the reference's LoopClosing thread (LoopClosing.cc:58-777) and
the relocalization path (Tracking.cc:1417-1580) brought into the
no-readback regime (VERDICT r3 "grow the realtime mode toward full
SLAM"): the host cannot look at detection scores — every decision
(candidate gating, consistency streaks, Sim3 acceptance, correction
propagation) happens on device behind `lax.cond`, and the outcome is
only visible in the session-end readback (`RealtimeSlam.finish()`).

Pipeline per dispatch (each stage conditional, so a no-event dispatch
costs only the BoW transform of at most one new keyframe):

1. **Process one new keyframe** — compute its tf-idf BoW row from the
   descriptors of its observed landmarks (device vocabulary descent, the
   DBoW2 transform of Frame.cc:575) into the [K, n_words] device
   database (KeyFrameDatabase::add, KeyFrameDatabase.cc:40).
2. **Detect** — L1 similarity against all older rows; gate by the
   temporal-neighbor min-score (DetectLoop's covisibility min-score,
   LoopClosing.cc:122-139), a minimum keyframe gap (the covisibility
   exclusion), and a 3-consecutive-keyframe consistency streak
   (LoopClosing.cc:153-212).
3. **Solve** — mutual-best Hamming matching between the two keyframes'
   landmark descriptors (SearchByBoW, ORBmatcher.cc:522), then 3D-3D
   RANSAC alignment of the new keyframe's depth-backed observations
   against the OLD map positions (Sim3Solver semantics, Sim3Solver.cc:
   226-338; scale fixed for RGB-D) — `ops.procrustes.ransac_alignment`.
4. **Correct** — initialize the newest node at the solved pose, build a
   sequential-chain + loop-edge Sim3 pose graph over the live keyframe
   ring, fix every node at-or-before the loop candidate, run
   `optim.pose_graph.optimize_pose_graph` (OptimizeEssentialGraph,
   Optimizer.cc:781-1044), write corrected rows back, re-map every point
   chunk through its owner keyframe's correction (LoopClosing.cc:
   448-517) and re-base the live tracking pose.  The candidate's chunks
   are re-exposed to tracking (`RTState.reuse_lid`) so the front-end
   re-matches the revisited place (SearchAndFuse's role, LoopClosing.cc:
   588-614, without a host round trip).
5. **Relocalize** — when tracking has been lost for several frames:
   BoW-score the stashed newest frame against the keyframe database,
   match its descriptors against the best candidate's landmarks, solve
   camera pose by 3D-3D RANSAC on the frame's depth (Relocalization,
   Tracking.cc:1417; with RGB-D depth the EPnP of PnPsolver.cc collapses
   to absolute orientation — ops/procrustes docstring), and repair the
   device tracking state in place.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import so3 as so3_mod
from ..ops import brief, matching as matching_ops, procrustes
from ..optim import pose_graph as pg
from . import realtime as rt

LOG_ROWS = 16         # loop-event log capacity (per session)

# Loop policy constants (reference equivalents; see class docstring).
MIN_KF_GAP = 15       # candidate must be >= this many keyframes older
                      # (stands in for the covisibility exclusion,
                      # LoopClosing.cc:146-152)
COOLDOWN_KFS = 10     # no re-detection sooner than this after a closure
                      # (mnLastLoopKFid + 10 gate, LoopClosing.cc:114)
REUSE_TTL = 120       # frames the revisited chunks stay in the local map
LOOP_EDGE_WEIGHT = 3.0
ALIGN_INLIER_M = 0.08      # 3D RANSAC consensus radius (loop)
ALIGN_FINAL_M = 0.03       # annealed refit radius — acceptance counts
                           # inliers HERE, so a closure must be tight
                           # (a loose-fit correction hurts low-drift
                           # trajectories more than it helps)
RELOC_INLIER_M = 0.07      # 3D RANSAC consensus radius (reloc)
RELOC_FINAL_M = 0.05       # annealed refit radius (reloc)
RELOC_AFTER_LOST = 4       # frames lost before in-graph reloc fires
RELOC_MIN_INLIERS = 15
MAX_BACKLOG = 8            # keyframes BoW-processed per dispatch (bound)


class MaintState(NamedTuple):
    kf_bow: jnp.ndarray        # [K, n_words] float32 L1-normalized tf-idf
    bow_lid: jnp.ndarray       # [K] int32 logical id the row was built for
    bow_next: jnp.ndarray      # int32 next logical keyframe to process
    cand_lid: jnp.ndarray      # int32 last detection candidate (-1)
    streak: jnp.ndarray        # int32 consecutive-detection count
    last_loop_lid: jnp.ndarray # int32 newest keyframe of the last closure
    loop_log: jnp.ndarray      # [LOG_ROWS, 6] (lid, cand, score, pairs,
                               #                inliers, applied)
    n_events: jnp.ndarray      # int32 confirmed candidates attempted
    n_loops: jnp.ndarray       # int32 closures applied
    n_reloc: jnp.ndarray       # int32 relocalizations applied
    # ---- persistent place bank (the reference's KeyFrameDatabase +
    # Map keep EVERY keyframe, KeyFrameDatabase.cc:33-46 / Map.h:43-60;
    # the ring alone forgets a place max_kf keyframes after visiting it).
    # Every processed keyframe leaves a compact entry: a SPARSE top-k
    # BoW row (dense rows at bank scale would be ~1 GB; top-64 words is
    # ~0.5 MB), its pose, and a landmark subset for re-seeding.
    bank_lid: jnp.ndarray      # [B] int32 logical keyframe id (-1 empty)
    bank_next: jnp.ndarray     # int32 ring insertion cursor
    bank_bow_w: jnp.ndarray    # [B, KW] f32 top-k word weights
    bank_bow_i: jnp.ndarray    # [B, KW] int32 word indices (-1 pad)
    bank_R: jnp.ndarray        # [B, 3, 3] pose at insertion (anchor frame)
    bank_t: jnp.ndarray        # [B, 3]
    bank_pos: jnp.ndarray      # [B, LB, 3] landmark subset (world)
    bank_desc: jnp.ndarray     # [B, LB, 32] uint8 packed BRIEF
    bank_angle: jnp.ndarray    # [B, LB]
    bank_normal: jnp.ndarray   # [B, LB, 3]
    bank_mind: jnp.ndarray     # [B, LB]
    bank_maxd: jnp.ndarray     # [B, LB]
    bank_ok: jnp.ndarray       # [B, LB] bool
    n_bank_loops: jnp.ndarray  # int32 closures against BANK places
    n_bank_reloc: jnp.ndarray  # int32 relocalizations against BANK places


def _descend(desc_u8, valid, node_bits, children, word_id, depth: int):
    """Vocabulary tree descent (vocabulary._descend over device arrays)."""
    bits = brief.unpack_bits(desc_u8)                # [N, 256]
    n = desc_u8.shape[0]
    cur = jnp.zeros(n, jnp.int32)
    for _ in range(depth):
        ch = children[cur]                           # [N, k]
        cb = node_bits[jnp.clip(ch, 0)]              # [N, k, 256]
        d = jnp.sum(bits[:, None, :] != cb, axis=-1)
        d = jnp.where(ch >= 0, d, 1 << 30)
        nxt = jnp.take_along_axis(ch, jnp.argmin(d, 1)[:, None], 1)[:, 0]
        cur = jnp.where((ch >= 0).any(1), nxt, cur)
    return jnp.where(valid, word_id[cur], -1)


def _bow_vector(words, valid, weights, n_words: int):
    """Returns (L1-normalized bow, has_words).  An EMPTY query must be
    flagged: a zero vector scores a uniform 0.5 L1-similarity against
    every L1-normalized database row, which would make the argmax
    candidate arbitrary instead of absent."""
    w = jnp.where(valid & (words >= 0), weights[jnp.clip(words, 0)], 0.0)
    bow = jnp.zeros(n_words).at[jnp.clip(words, 0)].add(w)
    total = jnp.sum(bow)
    return bow / jnp.maximum(total, 1e-9), total > 0.0


def _l1_scores(bow, rows):
    """DBoW2 L1 similarity of one vector against a row matrix."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(rows - bow[None, :]), axis=-1)


def _sparse_scores(bow, w, i):
    """L1 similarity of a dense query against SPARSE top-k rows.  For
    L1-normalized non-negative vectors, 1 - 0.5*sum|a-b| == sum min(a,b),
    so the score needs only the stored (index, weight) pairs — a [B, k]
    gather from the query instead of a [B, n_words] row walk.  Truncation
    UNDERESTIMATES uniformly, so bank scores are compared against
    bank-side neighbor scores, never against dense ring scores."""
    qv = bow[jnp.clip(i, 0)]                         # [B, k]
    return jnp.sum(jnp.where(i >= 0, jnp.minimum(qv, w), 0.0), axis=-1)


def _compact(mask, take_n: int):
    """First ``take_n`` set rows of a bool mask, as (src_idx, slot_valid)
    — the rank-compaction gather (no data-dependent scatter)."""
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    take = mask & (rank < take_n)
    oh = (rank[None, :] == jnp.arange(take_n)[:, None]) & take[None, :]
    return jnp.argmax(oh, axis=1), oh.any(axis=1)


def _cam_points(cam, uv, z):
    return jnp.stack([(uv[:, 0] - cam.cx) / cam.fx * z,
                      (uv[:, 1] - cam.cy) / cam.fy * z, z], axis=-1)


def _kf_landmarks(st: rt.RTState, row, lim):
    """(logical pids, physical rows, validity) of one keyframe row's
    observed landmarks."""
    pids = st.kf_pid[row]
    ph = rt.pid_phys(pids, lim)
    ok = rt.pid_alive(pids, st.kf_lid, lim) & st.pt_valid[ph]
    return pids, ph, ok


def maintenance_step(st: rt.RTState, ms: MaintState, seed,
                     node_bits, children, word_id, word_weight,
                     cfg: SystemConfig, lim: rt.RTLimits, depth: int):
    """One maintenance dispatch.  Jittable; zero host transfers."""
    K, S = lim.max_kf, lim.spawn_per_kf
    n_words = ms.kf_bow.shape[1]
    cam = cfg.camera
    key = jax.random.PRNGKey(seed)
    k_detect, k_reloc = jax.random.split(key)

    # ---------------------------------------------------------------- #
    # stage 1+2: BoW the pending keyframes, detect loop candidates
    # ---------------------------------------------------------------- #
    # Process the whole pending backlog (bounded): every keyframe gets a
    # BoW row — the reference adds EVERY keyframe to KeyFrameDatabase
    # (KeyFrameDatabase.cc:40), and a gapped database silently loses loop
    # candidates.  The fori_loop bounds are traced, so a no-burst
    # dispatch still pays for at most one descent; only if maintenance
    # lags more than MAX_BACKLOG keyframes (impossible at one KF/frame
    # with maintain_every <= MAX_BACKLOG) are the oldest skipped.
    lo = jnp.maximum(ms.bow_next, st.n_kf - MAX_BACKLOG)
    hi = st.n_kf

    def process_one(lid, carry):
        st, ms = carry
        row = lid % K
        # BoW document = the keyframe's FULL keypoint descriptor set
        # (Frame::ComputeBoW over mDescriptors, Frame.cc:570-577) —
        # landmark-only rows score genuine revisits ~10x weaker than
        # temporal neighbors and the min-score gate never opens.
        kp_ok = st.kf_kp_valid[row]
        words = _descend(st.kf_desc[row], kp_ok, node_bits, children,
                         word_id, depth)
        bow, has_words = _bow_vector(words, kp_ok, word_weight, n_words)
        pids, ph, ok = _kf_landmarks(st, row, lim)

        # Detection against the PRE-update database (self not included).
        scores = _l1_scores(bow, ms.kf_bow)
        db_ok = (ms.bow_lid >= 0) & (ms.bow_lid == st.kf_lid)
        elig = db_ok & (ms.bow_lid <= lid - MIN_KF_GAP)
        sc = jnp.where(elig, scores, -1.0)
        best = jnp.argmax(sc)
        best_sc = sc[best]
        best_lid = ms.bow_lid[best]
        # min-score: the WEAKEST similarity among recent temporal
        # neighbors (the reference's min-over-covisible-neighbors gate,
        # LoopClosing.cc:122-139 — temporal neighbors are the realtime
        # mode's covisibility stand-in).
        nbr = db_ok & (ms.bow_lid >= lid - 8) & (ms.bow_lid <= lid - 1)
        min_sc = jnp.min(jnp.where(nbr, scores, 1.0))
        hit_ring = (best_sc > 0.0) & nbr.any() & has_words \
            & (best_sc >= min_sc * cfg.loop.min_score_factor)

        # BANK detection — places the ring evicted.  Truncated sparse
        # scores are uniformly lower than dense ones, so the neighbor
        # min-score gate uses BANK rows of the same truncation (every
        # processed keyframe has one), never the dense ring scores.
        bsc_all = _sparse_scores(bow, ms.bank_bow_w, ms.bank_bow_i)
        evicted = st.kf_lid[jnp.clip(ms.bank_lid, 0) % K] != ms.bank_lid
        b_elig = (ms.bank_lid >= 0) & evicted \
            & (ms.bank_lid <= lid - MIN_KF_GAP)
        bsc = jnp.where(b_elig, bsc_all, -1.0)
        bbest = jnp.argmax(bsc)
        bbest_sc = bsc[bbest]
        bbest_lid = ms.bank_lid[bbest]
        b_nbr = (ms.bank_lid >= 0) & (ms.bank_lid >= lid - 8) \
            & (ms.bank_lid <= lid - 1)
        b_min = jnp.min(jnp.where(b_nbr, bsc_all, 1.0))
        hit_bank = (bbest_sc > 0.0) & b_nbr.any() & has_words \
            & (bbest_sc >= b_min * cfg.loop.min_score_factor) & ~hit_ring

        hit = hit_ring | hit_bank
        cand = jnp.where(hit_ring, best_lid, bbest_lid)
        near_prev = jnp.abs(cand - ms.cand_lid) <= 3
        streak = jnp.where(hit & near_prev, ms.streak + 1,
                           jnp.where(hit, 1, 0))
        confirmed = hit \
            & (streak >= cfg.loop.covisibility_consistency_threshold) \
            & (lid - ms.last_loop_lid >= COOLDOWN_KFS)

        # ---- bank insertion: every processed keyframe leaves a compact
        # persistent entry (sparse top-k BoW + pose + landmark subset) —
        # KeyFrameDatabase::add for places that will outlive the ring.
        # The top-k is taken over the KEYPOINT word list (<= N entries),
        # not the [n_words] dense vector: lax.top_k over 245k words is a
        # device SORT (~10 ms/keyframe); aggregating duplicate words
        # with an [N, N] equality matmul and top_k over N is exact and
        # ~100x cheaper.
        KW, LB, B = lim.bank_words, lim.bank_landmarks, lim.bank_cap
        w_ok = kp_ok & (words >= 0)
        wkp = jnp.where(w_ok, word_weight[jnp.clip(words, 0)], 0.0)
        eq = (words[None, :] == words[:, None]) & w_ok[None, :]
        agg = eq.astype(jnp.float32) @ wkp              # [N] per-occurrence
        first = (jnp.argmax(eq, axis=1) == jnp.arange(words.shape[0])) \
            & w_ok
        total = jnp.maximum(wkp.sum(), 1e-9)
        cand_w = jnp.where(first, agg / total, 0.0)
        topw, top_kp = jax.lax.top_k(cand_w, KW)
        topi = jnp.where(topw > 0, words[top_kp], -1).astype(jnp.int32)
        lsrc, lok = _compact(ok, LB)
        lph = ph[lsrc]
        brow = ms.bank_next % B

        def bank_row(arr, new):
            old = arr[brow]
            v = jnp.where(
                jnp.reshape(has_words, (1,) * old.ndim), new, old)
            return jax.lax.dynamic_update_slice(
                arr, v[None].astype(arr.dtype),
                (brow,) + (0,) * (arr.ndim - 1))

        ms = ms._replace(
            kf_bow=jax.lax.dynamic_update_slice(ms.kf_bow, bow[None],
                                                (row, 0)),
            bow_lid=ms.bow_lid.at[row].set(lid),
            bow_next=lid + 1,
            cand_lid=jnp.where(hit, cand, jnp.int32(-1)),
            streak=streak,
            bank_lid=ms.bank_lid.at[brow].set(
                jnp.where(has_words, lid, ms.bank_lid[brow])),
            bank_next=ms.bank_next + has_words.astype(jnp.int32),
            bank_bow_w=bank_row(ms.bank_bow_w, topw),
            bank_bow_i=bank_row(ms.bank_bow_i, topi),
            bank_R=bank_row(ms.bank_R, st.kf_R[row]),
            bank_t=bank_row(ms.bank_t, st.kf_t[row]),
            bank_pos=bank_row(ms.bank_pos, st.pt_pos[lph]),
            bank_desc=bank_row(ms.bank_desc, st.pt_desc[lph]),
            bank_angle=bank_row(ms.bank_angle, st.pt_angle[lph]),
            bank_normal=bank_row(ms.bank_normal, st.pt_normal[lph]),
            bank_mind=bank_row(ms.bank_mind, st.pt_mind[lph]),
            bank_maxd=bank_row(ms.bank_maxd, st.pt_maxd[lph]),
            bank_ok=bank_row(ms.bank_ok, lok & ok[lsrc]))

        st, ms = jax.lax.cond(
            confirmed & hit_ring,
            lambda c: _close_loop(c[0], c[1], lid, best, best_sc,
                                  jax.random.fold_in(k_detect, lid),
                                  cfg, lim),
            lambda c: c, (st, ms))
        st, ms = jax.lax.cond(
            confirmed & hit_bank,
            lambda c: _close_loop_bank(c[0], c[1], lid, bbest, bbest_sc,
                                       jax.random.fold_in(k_detect, ~lid),
                                       cfg, lim),
            lambda c: c, (st, ms))
        return st, ms

    st, ms = jax.lax.fori_loop(lo, hi, process_one, (st, ms))

    # ---------------------------------------------------------------- #
    # stage 5: relocalization when tracking is lost
    # ---------------------------------------------------------------- #
    need = (~st.track.ok) & (st.n_lost >= RELOC_AFTER_LOST) & (st.n_kf > 0)

    def reloc(carry):
        st, ms = carry
        words = _descend(st.fr_desc, st.fr_valid, node_bits, children,
                         word_id, depth)
        bow, has_words = _bow_vector(words, st.fr_valid, word_weight,
                                     n_words)
        db_ok = (ms.bow_lid >= 0) & (ms.bow_lid == st.kf_lid)
        sc = jnp.where(db_ok & has_words, _l1_scores(bow, ms.kf_bow), -1.0)
        best = jnp.argmax(sc)

        # Bank candidates (evicted-only).  Truncated sparse scores are
        # not comparable with dense ring scores (same-room ring views
        # can out-score the true evicted match), so the policy is
        # SEQUENTIAL: try the ring candidate first; only if its solve
        # fails, try the best bank place (the reference's relocalizer
        # similarly iterates candidates until one solves,
        # Tracking.cc:1495-1569).
        bsc_all = _sparse_scores(bow, ms.bank_bow_w, ms.bank_bow_i)
        evicted = st.kf_lid[jnp.clip(ms.bank_lid, 0) % K] != ms.bank_lid
        b_elig = (ms.bank_lid >= 0) & evicted & has_words
        bsc = jnp.where(b_elig, bsc_all, -1.0)
        bbest = jnp.argmax(bsc)

        has_d = st.fr_depth > 0
        dst_c = _cam_points(cam, st.fr_uv, st.fr_depth)
        sd_f = brief.to_signed(brief.unpack_bits(st.fr_desc))

        def solve_against(desc_u8, src_ok, src_pos):
            sd_b = brief.to_signed(brief.unpack_bits(desc_u8))
            ham = matching_ops.hamming_matrix(sd_f, sd_b)
            ham = jnp.where(st.fr_valid[:, None] & src_ok[None, :],
                            ham, 1e9)
            j = jnp.argmin(ham, axis=1)
            dmin = jnp.min(ham, axis=1)
            pair = st.fr_valid & (dmin <= cfg.matcher.th_high)
            res = procrustes.ransac_alignment(
                src_pos[j], dst_c, pair & has_d, k_reloc, n_hypotheses=256,
                threshold=RELOC_INLIER_M, with_scale=False,
                final_threshold=RELOC_FINAL_M)
            ok = (res.n_inliers >= RELOC_MIN_INLIERS) \
                & jnp.isfinite(res.R).all() & jnp.isfinite(res.t).all()
            return res, j, ok

        def repair_track(st, res, applied, pids_new):
            R_cw = so3_mod.orthonormalize(res.R)
            return st.track._replace(
                R=jnp.where(applied, R_cw, st.track.R),
                t=jnp.where(applied, res.t, st.track.t),
                vR=jnp.eye(3, dtype=jnp.float32),
                vt=jnp.zeros(3, jnp.float32),
                has_vel=jnp.bool_(False),
                ok=st.track.ok | applied,
                pids=jnp.where(applied, pids_new, st.track.pids))

        def ring_reloc(carry):
            st, ms = carry
            pids_b, ph_b, ok_b = _kf_landmarks(st, best, lim)
            res, j, applied = solve_against(st.pt_desc[ph_b], ok_b,
                                            st.pt_pos[ph_b])
            pids_new = jnp.where(res.inliers, pids_b[j], -1)
            st = st._replace(
                track=repair_track(st, res, applied, pids_new),
                n_lost=jnp.where(applied, 0, st.n_lost),
                # re-expose the candidate's chunks so the next frames
                # match against the place we believe we are at
                reuse_lid=jnp.where(applied, ms.bow_lid[best],
                                    st.reuse_lid),
                reuse_ttl=jnp.where(applied, REUSE_TTL, st.reuse_ttl))
            ms = ms._replace(n_reloc=ms.n_reloc + applied.astype(jnp.int32))
            return st, ms

        def bank_reloc(carry):
            st, ms = carry
            LB = lim.bank_landmarks
            res, j, applied = solve_against(ms.bank_desc[bbest],
                                            ms.bank_ok[bbest],
                                            ms.bank_pos[bbest])
            # Matched landmarks live only in the bank — stage the subset
            # into the seed arena and hand the track SEED pids.
            pids_new = jnp.where(res.inliers, rt.SEED_BASE + j, -1)
            PT = K * S
            sv = ms.bank_ok[bbest] & applied
            sv = jnp.concatenate([sv, jnp.zeros(lim.seed_slots - LB, bool)])
            pad = lambda a: jnp.concatenate(
                [a, jnp.zeros((lim.seed_slots - LB,) + a.shape[1:],
                              a.dtype)])
            gated = lambda arr, v: jnp.where(
                applied, jax.lax.dynamic_update_slice(
                    arr, pad(v).astype(arr.dtype),
                    (PT,) + (0,) * (arr.ndim - 1)), arr)
            st = st._replace(
                track=repair_track(st, res, applied, pids_new),
                n_lost=jnp.where(applied, 0, st.n_lost),
                pt_pos=gated(st.pt_pos, ms.bank_pos[bbest]),
                pt_desc=gated(st.pt_desc, ms.bank_desc[bbest]),
                pt_angle=gated(st.pt_angle, ms.bank_angle[bbest]),
                pt_normal=gated(st.pt_normal, ms.bank_normal[bbest]),
                pt_mind=gated(st.pt_mind, ms.bank_mind[bbest]),
                pt_maxd=gated(st.pt_maxd, ms.bank_maxd[bbest]),
                pt_valid=jnp.where(
                    applied, jax.lax.dynamic_update_slice(
                        st.pt_valid, sv, (PT,)), st.pt_valid),
                seed_ttl=jnp.where(applied, REUSE_TTL, st.seed_ttl))
            ms = ms._replace(
                n_reloc=ms.n_reloc + applied.astype(jnp.int32),
                n_bank_reloc=ms.n_bank_reloc + applied.astype(jnp.int32))
            return st, ms

        n_before = ms.n_reloc
        st, ms = ring_reloc((st, ms))
        ring_applied = ms.n_reloc > n_before
        st, ms = jax.lax.cond(~ring_applied & b_elig.any(), bank_reloc,
                              lambda c: c, (st, ms))
        return st, ms

    st, ms = jax.lax.cond(need, reloc, lambda c: c, (st, ms))
    return st, ms


def _remap_trajectory(traj, kf_lid, Ro, to, Rn, tn, moved, K: int):
    """Re-map WRITTEN trajectory rows through their owner keyframe's
    correction (pose' = pose ∘ To^-1 ∘ Tn — the right-composition the
    live pose gets): a closure repairs the past trajectory, not just the
    future, exactly like the reference's keyframe-relative trajectory
    export against corrected keyframes (System.cc:331-401).  Rows owned
    by evicted keyframes (or written before any) are anchor-frame by
    construction and stay put."""
    own = traj[:, 13].astype(jnp.int32)
    own_row = jnp.clip(own, 0) % K
    ok = (own >= 0) & (kf_lid[own_row] == own) & moved[own_row]
    M_R = jnp.einsum("kji,kjl->kil", Ro, Rn)        # Ro^T Rn
    M_t = jnp.einsum("kji,kj->ki", Ro, tn - to)     # Ro^T (tn - to)
    R_f = traj[:, 1:10].reshape(-1, 3, 3)
    t_f = traj[:, 10:13]
    R2 = jnp.einsum("fij,fjk->fik", R_f, M_R[own_row])
    t2 = jnp.einsum("fij,fj->fi", R_f, M_t[own_row]) + t_f
    R2 = jnp.where(ok[:, None, None], R2, R_f)
    t2 = jnp.where(ok[:, None], t2, t_f)
    return jnp.concatenate([traj[:, :1], R2.reshape(-1, 9), t2,
                            traj[:, 13:]], axis=1)


def _close_loop(st: rt.RTState, ms: MaintState, lid, cand_row, score,
                key, cfg: SystemConfig, lim: rt.RTLimits):
    """Stages 3+4: solve the closure and propagate the correction."""
    K, S = lim.max_kf, lim.spawn_per_kf
    PT = K * S
    cam = cfg.camera
    row_new = lid % K
    cand_lid = st.kf_lid[cand_row]

    # ---- stage 3: landmark matching + 3D-3D RANSAC
    pids_n, ph_n, ok_n = _kf_landmarks(st, row_new, lim)
    pids_c, ph_c, ok_c = _kf_landmarks(st, cand_row, lim)
    sd_n = brief.to_signed(brief.unpack_bits(st.pt_desc[ph_n]))
    sd_c = brief.to_signed(brief.unpack_bits(st.pt_desc[ph_c]))
    ham = matching_ops.hamming_matrix(sd_n, sd_c)
    ham = jnp.where(ok_n[:, None] & ok_c[None, :], ham, 1e9)
    j = jnp.argmin(ham, axis=1)
    dmin = jnp.min(ham, axis=1)
    ibest = jnp.argmin(ham, axis=0)
    mutual = ibest[j] == jnp.arange(ham.shape[0])
    pair = ok_n & (dmin <= cfg.matcher.th_low) & mutual

    # New KF's camera-frame 3D from its stereo-virtual observations
    # (depth = bf / disparity, Frame.cc:820-842 inverted).
    obs = st.kf_obs[row_new]
    u, v, ur = obs[:, 0], obs[:, 1], obs[:, 2]
    disp = u - ur
    has_d = (jnp.abs(ur + 1.0) > 1e-4) & (disp > 0.1)
    z = cam.bf / jnp.maximum(disp, 0.1)
    src = _cam_points(cam, obs[:, :2], z)
    dst = st.pt_pos[ph_c[j]]           # candidate-era world positions

    res = procrustes.ransac_alignment(
        src, dst, pair & has_d, key, n_hypotheses=256,
        threshold=ALIGN_INLIER_M, with_scale=False,
        final_threshold=ALIGN_FINAL_M)
    # A rank-deficient inlier set (coplanar/collinear points) can emit a
    # non-finite SVD solution without raising; one NaN pose would
    # propagate through the pose graph into every arena.  Reject it.
    solve_ok = jnp.isfinite(res.R).all() & jnp.isfinite(res.t).all()
    # Accept on TIGHT (annealed) inliers, OR on an overwhelming
    # wide-radius consensus: heavy accumulated drift deforms the old map
    # (a 6% depth-scale error puts candidate-era points ~10 cm off at
    # range), so a genuine revisit can fail the tight count while the
    # wide consensus is unambiguous — the pose graph + junction BA then
    # iron the residual (the reference's equivalent split: Sim3Solver
    # RANSAC accepts wide, OptimizeSim3 refines, LoopClosing.cc:276-330).
    strong = res.n_consensus >= 3 * cfg.loop.min_sim3_inliers
    accepted = solve_ok & ((res.n_inliers >= cfg.loop.min_sim3_inliers)
                           | strong)

    # ---- event log (always recorded, applied flag says the rest)
    ev = jnp.stack([lid.astype(jnp.float32),
                    cand_lid.astype(jnp.float32), score,
                    pair.sum().astype(jnp.float32),
                    res.n_inliers.astype(jnp.float32),
                    accepted.astype(jnp.float32)])
    log = jax.lax.dynamic_update_slice(
        ms.loop_log, ev[None], (ms.n_events % LOG_ROWS, 0))
    ms = ms._replace(loop_log=log, n_events=ms.n_events + 1)

    def apply(carry):
        st, ms = carry
        # Corrected world->cam pose of the new keyframe: RANSAC solved
        # cam->old-world (dst = R src + t), so T_cw = (R^T, -R^T t).
        R_corr = so3_mod.orthonormalize(res.R.T)
        t_corr = -R_corr @ res.t

        # ---- stage 4: sequential-chain + loop-edge pose graph
        lids = st.kf_lid                      # [K] per physical row
        valid_nodes = lids >= 0
        R0 = jax.lax.dynamic_update_slice(st.kf_R, R_corr[None],
                                          (row_new, 0, 0))
        t0 = jax.lax.dynamic_update_slice(st.kf_t, t_corr[None],
                                          (row_new, 0))
        fixed = (lids <= cand_lid) | ~valid_nodes

        low = jnp.maximum(st.n_kf - K, 0)
        e_lids = low + 1 + jnp.arange(K - 1)
        e_ok = e_lids < st.n_kf
        ei = e_lids % K
        ej = (e_lids - 1) % K
        # Measured relatives from PRE-correction poses (drift-consistent).
        R_i, t_i = st.kf_R[ei], st.kf_t[ei]
        R_j, t_j = st.kf_R[ej], st.kf_t[ej]
        R_m = jnp.einsum("eij,ekj->eik", R_i, R_j)       # R_i R_j^T
        t_m = t_i - jnp.einsum("eij,ej->ei", R_m, t_j)
        # Loop edge: corrected newest vs candidate.
        R_cl = R_corr @ st.kf_R[cand_row].T
        t_cl = t_corr - R_cl @ st.kf_t[cand_row]
        edge_i = jnp.concatenate([ei, jnp.asarray([0])]).at[K - 1].set(
            row_new)
        edge_j = jnp.concatenate([ej, jnp.asarray([0])]).at[K - 1].set(
            cand_row)
        edge_R = jnp.concatenate([R_m, R_cl[None]])
        edge_t = jnp.concatenate([t_m, t_cl[None]])
        edge_valid = jnp.concatenate([e_ok, jnp.asarray([True])])
        edge_w = jnp.concatenate([jnp.ones(K - 1),
                                  jnp.asarray([LOOP_EDGE_WEIGHT])])

        prob = pg.PoseGraphProblem(
            s=jnp.ones(K), R=R0, t=t0, fixed=fixed, valid=valid_nodes,
            edge_i=edge_i.astype(jnp.int32), edge_j=edge_j.astype(jnp.int32),
            edge_s=jnp.ones(K), edge_R=edge_R, edge_t=edge_t,
            edge_valid=edge_valid, edge_weight=edge_w)
        sol = pg.optimize_pose_graph(prob, cfg.optimizer, fix_scale=True)

        # Per-node finite guard: a degenerate normal system (isolated
        # node, singular block) must not write NaN into the ring.
        node_ok = jnp.isfinite(sol.R).all(axis=(1, 2)) \
            & jnp.isfinite(sol.t).all(axis=1)
        changed = (~fixed) & valid_nodes & node_ok
        Rn = jnp.where(changed[:, None, None], sol.R, st.kf_R)
        tn = jnp.where(changed[:, None], sol.t, st.kf_t)

        # ---- re-map point chunks through their owner's correction:
        # x_c invariant  =>  x_w' = Rn^T (Ro x + to - tn).  Only the
        # RING rows [0, K*S) move; the seed staging rows past PT belong
        # to the OLD (anchor) frame, which a closure never moves.
        A = jnp.einsum("kji,kjl->kil", Rn, st.kf_R)      # Rn^T Ro
        b = jnp.einsum("kji,kj->ki", Rn, st.kf_t - tn)
        owner = jnp.arange(PT) // S
        moved = changed[owner]
        ring_pos = st.pt_pos[:PT]
        pos2 = jnp.einsum("pij,pj->pi", A[owner], ring_pos) + b[owner]
        ring_new = jnp.where((moved & st.pt_valid[:PT])[:, None], pos2,
                             ring_pos)
        pt_pos = jnp.concatenate([ring_new, st.pt_pos[PT:]])

        # ---- re-base the live tracking pose (rigid with the NEWEST live
        # keyframe, not the processed one: when maintenance lags, newer
        # keyframes exist and the pose graph moves them by a different
        # delta — re-basing by the processed keyframe's delta would leave
        # the track pose disagreeing with the chunks it matches next):
        # T_track' = T_track o T_old(newest)^-1 o T_new(newest)
        row_last = (st.n_kf - 1) % K
        Ro_n, to_n = st.kf_R[row_last], st.kf_t[row_last]
        Rn_n, tn_n = Rn[row_last], tn[row_last]
        M_R = Ro_n.T @ Rn_n
        M_t = Ro_n.T @ (tn_n - to_n)
        trk_R = so3_mod.orthonormalize(st.track.R @ M_R)
        trk_t = st.track.R @ M_t + st.track.t
        track = st.track._replace(R=trk_R, t=trk_t,
                                  vR=jnp.eye(3, dtype=jnp.float32),
                                  vt=jnp.zeros(3, jnp.float32),
                                  has_vel=jnp.bool_(False))

        traj2 = _remap_trajectory(st.traj, st.kf_lid, st.kf_R, st.kf_t,
                                  Rn, tn, changed, K)
        st = st._replace(kf_R=Rn, kf_t=tn, pt_pos=pt_pos, track=track,
                         traj=traj2,
                         reuse_lid=cand_lid, reuse_ttl=REUSE_TTL)

        # ---- SearchAndFuse (LoopClosing.cc:543-614): the new keyframe's
        # fresh spawns whose RANSAC match hit a candidate-era landmark
        # are DUPLICATES the revisit created — drop the fresh copy and
        # point the keyframe row (and the live match chain) at the OLD
        # landmark, so the junction extends old tracks instead of
        # forking them into a double wall.
        fuse = pair & res.inliers & (pids_n >= 0) & (pids_n // S == lid)
        slot_oh = ((jnp.clip(pids_n, 0) % S)[None, :]
                   == jnp.arange(S)[:, None]) & fuse[None, :]
        dup = slot_oh.any(axis=1)                        # [S] chunk slots
        n_of = jnp.argmax(slot_oh, axis=1)
        partner = jnp.where(dup, pids_c[j[n_of]], -1)    # old pid per slot
        base = row_new * S
        chunk_valid = jax.lax.dynamic_slice(st.pt_valid, (base,), (S,)) \
            & ~dup
        pt_valid2 = jax.lax.dynamic_update_slice(st.pt_valid, chunk_valid,
                                                 (base,))
        row_pid = jnp.where(fuse, pids_c[j], pids_n)
        kf_pid2 = jax.lax.dynamic_update_slice(st.kf_pid, row_pid[None],
                                               (row_new, 0))
        tp = st.track.pids
        tp_new = (tp >= 0) & (tp // S == lid)
        tp_part = partner[jnp.clip(tp, 0) % S]
        tp2 = jnp.where(tp_new & (tp_part >= 0), tp_part, tp)
        st = st._replace(pt_valid=pt_valid2, kf_pid=kf_pid2,
                         track=st.track._replace(pids=tp2))

        # ---- post-closure junction BA (the detached GBA's role,
        # LoopClosing.cc:646-750, at window scale): refine the corrected
        # chain against its own (fused) points.  The LIVE pose must stay
        # rigid with the newest keyframe THROUGH the refinement —
        # _windowed_ba adopts the newest KF pose, which is only correct
        # when the keyframe IS the current frame.
        pre = st.track
        Ro2, to2 = st.kf_R[row_last], st.kf_t[row_last]
        st = rt._windowed_ba(st, cfg, lim)
        Rn2, tn2 = st.kf_R[row_last], st.kf_t[row_last]
        B_R = Ro2.T @ Rn2
        B_t = Ro2.T @ (tn2 - to2)
        st = st._replace(track=st.track._replace(
            R=so3_mod.orthonormalize(pre.R @ B_R),
            t=pre.R @ B_t + pre.t))

        ms = ms._replace(n_loops=ms.n_loops + 1, last_loop_lid=lid,
                         streak=jnp.int32(0), cand_lid=jnp.int32(-1))
        return st, ms

    return jax.lax.cond(accepted, apply, lambda c: c, (st, ms))


def _close_loop_bank(st: rt.RTState, ms: MaintState, lid, bidx, score,
                     key, cfg: SystemConfig, lim: rt.RTLimits):
    """Stages 3+4 against a BANK place — somewhere the ring evicted long
    ago.  The bank entry's landmark subset (old world frame = the map
    anchor) is matched and RANSAC-aligned exactly like a ring candidate;
    the correction then anchors the NEWEST keyframe at the solved pose
    and relaxes the whole live chain to it (the old map is fixed by
    construction — it has no live nodes to move).  Finally the subset is
    staged into the seed arena rows so tracking re-observes the place
    (SearchAndFuse's role, LoopClosing.cc:588-614, for keyframes the
    ring no longer holds)."""
    K, S = lim.max_kf, lim.spawn_per_kf
    PT = K * S
    LB = lim.bank_landmarks
    assert LB <= lim.seed_slots, "seed arena smaller than a bank subset"
    cam = cfg.camera
    row_new = lid % K
    cand_lid = ms.bank_lid[bidx]

    # ---- stage 3: landmark matching + 3D-3D RANSAC vs the bank subset
    pids_n, ph_n, ok_n = _kf_landmarks(st, row_new, lim)
    sd_n = brief.to_signed(brief.unpack_bits(st.pt_desc[ph_n]))
    sd_c = brief.to_signed(brief.unpack_bits(ms.bank_desc[bidx]))
    ok_c = ms.bank_ok[bidx]
    ham = matching_ops.hamming_matrix(sd_n, sd_c)
    ham = jnp.where(ok_n[:, None] & ok_c[None, :], ham, 1e9)
    j = jnp.argmin(ham, axis=1)
    dmin = jnp.min(ham, axis=1)
    ibest = jnp.argmin(ham, axis=0)
    mutual = ibest[j] == jnp.arange(ham.shape[0])
    pair = ok_n & (dmin <= cfg.matcher.th_low) & mutual

    obs = st.kf_obs[row_new]
    ur = obs[:, 2]
    disp = obs[:, 0] - ur
    has_d = (jnp.abs(ur + 1.0) > 1e-4) & (disp > 0.1)
    z = cam.bf / jnp.maximum(disp, 0.1)
    src = _cam_points(cam, obs[:, :2], z)
    dst = ms.bank_pos[bidx][j]               # bank-era world positions

    res = procrustes.ransac_alignment(
        src, dst, pair & has_d, key, n_hypotheses=256,
        threshold=ALIGN_INLIER_M, with_scale=False,
        final_threshold=ALIGN_FINAL_M)
    solve_ok = jnp.isfinite(res.R).all() & jnp.isfinite(res.t).all()
    # Accept on TIGHT (annealed) inliers, OR on an overwhelming
    # wide-radius consensus: heavy accumulated drift deforms the old map
    # (a 6% depth-scale error puts candidate-era points ~10 cm off at
    # range), so a genuine revisit can fail the tight count while the
    # wide consensus is unambiguous — the pose graph + junction BA then
    # iron the residual (the reference's equivalent split: Sim3Solver
    # RANSAC accepts wide, OptimizeSim3 refines, LoopClosing.cc:276-330).
    strong = res.n_consensus >= 3 * cfg.loop.min_sim3_inliers
    accepted = solve_ok & ((res.n_inliers >= cfg.loop.min_sim3_inliers)
                           | strong)

    ev = jnp.stack([lid.astype(jnp.float32),
                    cand_lid.astype(jnp.float32), score,
                    pair.sum().astype(jnp.float32),
                    res.n_inliers.astype(jnp.float32),
                    accepted.astype(jnp.float32)])
    log = jax.lax.dynamic_update_slice(
        ms.loop_log, ev[None], (ms.n_events % LOG_ROWS, 0))
    ms = ms._replace(loop_log=log, n_events=ms.n_events + 1)

    def apply(carry):
        st, ms = carry
        R_corr = so3_mod.orthonormalize(res.R.T)
        t_corr = -R_corr @ res.t

        # ---- stage 4: chain pose graph ANCHORED at the corrected
        # newest node (the bank place has no live node; fixing the
        # newest at the solved pose and relaxing the chain spreads the
        # accumulated drift across the live window).
        lids = st.kf_lid
        valid_nodes = lids >= 0
        R0 = jax.lax.dynamic_update_slice(st.kf_R, R_corr[None],
                                          (row_new, 0, 0))
        t0 = jax.lax.dynamic_update_slice(st.kf_t, t_corr[None],
                                          (row_new, 0))
        fixed = (jnp.arange(K) == row_new) | ~valid_nodes

        low = jnp.maximum(st.n_kf - K, 0)
        e_lids = low + 1 + jnp.arange(K - 1)
        e_ok = e_lids < st.n_kf
        ei = e_lids % K
        ej = (e_lids - 1) % K
        R_i, t_i = st.kf_R[ei], st.kf_t[ei]
        R_j, t_j = st.kf_R[ej], st.kf_t[ej]
        R_m = jnp.einsum("eij,ekj->eik", R_i, R_j)
        t_m = t_i - jnp.einsum("eij,ej->ei", R_m, t_j)

        prob = pg.PoseGraphProblem(
            s=jnp.ones(K), R=R0, t=t0, fixed=fixed, valid=valid_nodes,
            edge_i=ei.astype(jnp.int32), edge_j=ej.astype(jnp.int32),
            edge_s=jnp.ones(K - 1), edge_R=R_m, edge_t=t_m,
            edge_valid=e_ok, edge_weight=jnp.ones(K - 1))
        sol = pg.optimize_pose_graph(prob, cfg.optimizer, fix_scale=True)

        node_ok = jnp.isfinite(sol.R).all(axis=(1, 2)) \
            & jnp.isfinite(sol.t).all(axis=1)
        changed = (~fixed) & valid_nodes & node_ok
        Rn = jnp.where(changed[:, None, None], sol.R, R0)
        tn = jnp.where(changed[:, None], sol.t, t0)

        # Point remap through each owner's correction — the newest node
        # moved too (anchored at the corrected pose), so include it.
        remap = (changed | (jnp.arange(K) == row_new)) & valid_nodes
        A = jnp.einsum("kji,kjl->kil", Rn, st.kf_R)
        b = jnp.einsum("kji,kj->ki", Rn, st.kf_t - tn)
        owner = jnp.arange(PT) // S
        moved = remap[owner]
        ring_pos = st.pt_pos[:PT]
        pos2 = jnp.einsum("pij,pj->pi", A[owner], ring_pos) + b[owner]
        ring_new = jnp.where((moved & st.pt_valid[:PT])[:, None], pos2,
                             ring_pos)

        # ---- stage the bank subset into the seed arena (rows PT..)
        sv = jnp.concatenate([ms.bank_ok[bidx],
                              jnp.zeros(lim.seed_slots - LB, bool)])
        seed_upd = lambda arr, v: jax.lax.dynamic_update_slice(
            arr, v.astype(arr.dtype), (PT,) + (0,) * (arr.ndim - 1))
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((lim.seed_slots - LB,) + a.shape[1:], a.dtype)])
        pt_pos = jnp.concatenate([ring_new, st.pt_pos[PT:]])
        pt_pos = seed_upd(pt_pos, pad(ms.bank_pos[bidx]))
        pt_desc = seed_upd(st.pt_desc, pad(ms.bank_desc[bidx]))
        pt_angle = seed_upd(st.pt_angle, pad(ms.bank_angle[bidx]))
        pt_normal = seed_upd(st.pt_normal, pad(ms.bank_normal[bidx]))
        pt_mind = seed_upd(st.pt_mind, pad(ms.bank_mind[bidx]))
        pt_maxd = seed_upd(st.pt_maxd, pad(ms.bank_maxd[bidx]))
        pt_valid = jax.lax.dynamic_update_slice(st.pt_valid, sv, (PT,))

        # ---- re-base the live tracking pose via the NEWEST live KF
        row_last = (st.n_kf - 1) % K
        Ro_n, to_n = st.kf_R[row_last], st.kf_t[row_last]
        Rn_n, tn_n = Rn[row_last], tn[row_last]
        M_R = Ro_n.T @ Rn_n
        M_t = Ro_n.T @ (tn_n - to_n)
        trk_R = so3_mod.orthonormalize(st.track.R @ M_R)
        trk_t = st.track.R @ M_t + st.track.t
        track = st.track._replace(R=trk_R, t=trk_t,
                                  vR=jnp.eye(3, dtype=jnp.float32),
                                  vt=jnp.zeros(3, jnp.float32),
                                  has_vel=jnp.bool_(False))

        traj2 = _remap_trajectory(st.traj, st.kf_lid, st.kf_R, st.kf_t,
                                  Rn, tn, remap, K)
        st = st._replace(kf_R=Rn, kf_t=tn, pt_pos=pt_pos, pt_desc=pt_desc,
                         pt_angle=pt_angle, pt_normal=pt_normal,
                         pt_mind=pt_mind, pt_maxd=pt_maxd,
                         pt_valid=pt_valid, track=track, traj=traj2,
                         seed_ttl=jnp.int32(REUSE_TTL))
        ms = ms._replace(n_loops=ms.n_loops + 1,
                         n_bank_loops=ms.n_bank_loops + 1,
                         last_loop_lid=lid, streak=jnp.int32(0),
                         cand_lid=jnp.int32(-1))
        return st, ms

    return jax.lax.cond(accepted, apply, lambda c: c, (st, ms))


#: Process-wide caches keyed by (cfg, lim, vocab identity): a second
#: session with the same setup reuses the compiled program AND the
#: device-resident vocabulary arrays (see realtime._cached_step).
#: Cache VALUES carry the vocabulary object itself: that pins the id()
#: the key uses (a freed vocabulary's address could otherwise be reused
#: by a DIFFERENT vocabulary, silently hitting the wrong entry) and the
#: hit path verifies identity with `is`.  Bounded (oldest-out at
#: _CACHE_CAP entries): the common case is one config per process — the
#: executable-retention win — while a host cycling many configs or
#: vocabularies must not pin compiled programs + vocab arrays forever.
_CACHE_CAP = 8
_JIT_CACHE: dict = {}
_VOC_DEV_CACHE: dict = {}


def _bound(cache: dict) -> None:
    while len(cache) > _CACHE_CAP:
        cache.pop(next(iter(cache)))


class Maintainer:
    """Host-side wrapper: owns the device vocabulary arrays and the
    jitted maintenance program."""

    def __init__(self, cfg: SystemConfig, lim: rt.RTLimits, voc):
        from . import vocabulary as voc_mod
        self.cfg, self.lim, self.voc = cfg, lim, voc
        self._depth = int(voc.depth)
        self._n_words = int(voc.n_words)
        # Device-resident vocabulary (ARGUMENTS of the jitted program, not
        # closed-over constants — constants would be baked into the
        # executable and re-shipped on every compile).
        hit = _VOC_DEV_CACHE.get(id(voc))
        if hit is not None and hit[0] is voc:
            self._dev = hit[1]
        else:
            self._dev = (
                jax.device_put(jnp.asarray(voc_mod._unpack(voc.node_desc))),
                jax.device_put(jnp.asarray(voc.children)),
                jax.device_put(jnp.asarray(voc.word_id)),
                jax.device_put(jnp.asarray(voc.word_weight)))
            _VOC_DEV_CACHE[id(voc)] = (voc, self._dev)
            _bound(_VOC_DEV_CACHE)
        try:
            key = (cfg, lim, id(voc))
            hash(key)
        except TypeError:
            key = None
        jhit = _JIT_CACHE.get(key) if key is not None else None
        if jhit is not None and jhit[0] is voc:
            self._step = jhit[1]
        else:
            self._step = jax.jit(
                lambda st, ms, seed, nb, ch, wi, ww: maintenance_step(
                    st, ms, seed, nb, ch, wi, ww, cfg, lim, self._depth))
            if key is not None:
                _JIT_CACHE[key] = (voc, self._step)
                _bound(_JIT_CACHE)

    def init_state(self) -> MaintState:
        K = self.lim.max_kf
        B, KW, LB = (self.lim.bank_cap, self.lim.bank_words,
                     self.lim.bank_landmarks)
        i32, f32 = jnp.int32, jnp.float32
        return MaintState(
            kf_bow=jnp.zeros((K, self._n_words), f32),
            bow_lid=jnp.full(K, -1, i32), bow_next=i32(0),
            cand_lid=i32(-1), streak=i32(0), last_loop_lid=i32(-10 ** 6),
            loop_log=jnp.zeros((LOG_ROWS, 6), f32),
            n_events=i32(0), n_loops=i32(0), n_reloc=i32(0),
            bank_lid=jnp.full(B, -1, i32), bank_next=i32(0),
            bank_bow_w=jnp.zeros((B, KW), f32),
            bank_bow_i=jnp.full((B, KW), -1, i32),
            bank_R=jnp.tile(jnp.eye(3, dtype=f32), (B, 1, 1)),
            bank_t=jnp.zeros((B, 3), f32),
            bank_pos=jnp.zeros((B, LB, 3), f32),
            bank_desc=jnp.zeros((B, LB, 32), jnp.uint8),
            bank_angle=jnp.zeros((B, LB), f32),
            bank_normal=jnp.zeros((B, LB, 3), f32),
            bank_mind=jnp.full((B, LB), 1e-2, f32),
            bank_maxd=jnp.full((B, LB), 1e3, f32),
            bank_ok=jnp.zeros((B, LB), bool),
            n_bank_loops=i32(0), n_bank_reloc=i32(0))

    def step(self, st: rt.RTState, ms: MaintState, seed):
        return self._step(st, ms, seed, *self._dev)

    def report(self, ms: MaintState) -> dict:
        """Session-end readback of the maintenance outcome.

        ``loop_events`` is chronological (oldest surviving first): the
        device log is a ring, so once more than LOG_ROWS events occurred
        it is unwrapped here and only the newest LOG_ROWS survive."""
        n_ev = int(ms.n_events)
        log = np.asarray(ms.loop_log)
        if n_ev <= LOG_ROWS:
            log = log[:n_ev]
        else:
            log = np.roll(log, -(n_ev % LOG_ROWS), axis=0)
        return {
            "loop_events": [
                {"lid": int(r[0]), "cand_lid": int(r[1]),
                 "score": float(r[2]), "n_pairs": int(r[3]),
                 "n_inliers": int(r[4]), "applied": bool(r[5] > 0.5)}
                for r in log],
            "n_loop_events": n_ev,
            "n_loops_closed": int(ms.n_loops),
            "n_relocalizations": int(ms.n_reloc),
            "n_bank_loops": int(ms.n_bank_loops),
            "n_bank_reloc": int(ms.n_bank_reloc),
            "bank_entries": int((np.asarray(ms.bank_lid) >= 0).sum()),
        }
