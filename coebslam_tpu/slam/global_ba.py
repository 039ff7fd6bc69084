"""Global bundle adjustment driver: the whole map in one chunked solve.

TPU-native replacement for `Optimizer::GlobalBundleAdjustemnt` [sic]
(Optimizer.cc:41-237) + `LoopClosing::RunGlobalBundleAdjustment`
(LoopClosing.cc:646-750): after a loop correction (and after monocular
initialization in the reference) every keyframe pose and point position is
re-optimized jointly with only the first keyframe fixed.

The reference spawns a detached thread and later propagates corrections to
keyframes/points created while it ran via the spanning tree.  Here the
solve is a single device program (optim.local_ba.optimize_global_ba:
point blocks streamed through the Schur assembly under lax.scan), fast
enough to run synchronously at the loop-closing cadence — the caller
flushes the mapper first, so no state is created mid-solve and the
reference's catch-up propagation is vacuous by construction.

Problem assembly reuses the device mirrors (map_device): the host uploads
only a packed (keyframe, slot) observation table; uv/ur/level gather
in-graph from the keyframe feature mirror.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..optim import local_ba
from .map import MapArena, MAX_OBS_PER_POINT

GLOBAL_OBS = 16      # obs per point carried into GBA (reference: unbounded)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class GlobalBA:
    """Holds the per-shape jitted solvers (bucketed so recompiles are
    bounded) and drives assembly + writeback."""

    def __init__(self, cfg: SystemConfig, max_obs: int = GLOBAL_OBS):
        """``max_obs``: observations carried per point (reference g2o is
        unbounded, Optimizer.cc:49-237).  tools/measure_gba_obs.py runs
        the loop-circuit scene at M=16 vs M=32 to price the truncation
        (results in docs/TPU_BACKEND_NOTES.md); the drop counter below
        records what was cut."""
        self.cfg = cfg
        self.max_obs = max_obs
        self._jits = {}
        self.truncated_obs = 0       # drop counter (surfaced in metrics)

    def _solver(self, K: int, P: int, n_kp: int, n_blocks: int):
        key = (K, P, n_kp, n_blocks)
        if key not in self._jits:
            cam, optcfg = self.cfg.camera, self.cfg.optimizer
            sf2 = jnp.float32(self.cfg.orb.scale_factor ** 2)

            def solve(kf_feats, kf_poses, pts_dev, window_ids, kf_fixed,
                      kf_valid, win_of_kf, pt_ids, pt_valid, packed):
                uv_a, _, lvl_a, ur_a, _ = kf_feats
                R_a, t_a = kf_poses
                ok = packed >= 0
                code = jnp.maximum(packed, 0)
                g = code // n_kp
                s = code % n_kp
                widx = jnp.where(ok, win_of_kf[g], -1)
                uv = uv_a[g, s]
                ur = ur_a[g, s]
                lvl = lvl_a[g, s].astype(jnp.float32)
                prob = local_ba.BAProblem(
                    kf_R=R_a[window_ids], kf_t=t_a[window_ids],
                    kf_fixed=kf_fixed, kf_valid=kf_valid,
                    pt_pos=pts_dev[0][pt_ids], pt_valid=pt_valid,
                    obs_kf=widx,
                    obs_uvr=jnp.concatenate([uv, ur[..., None]], -1),
                    obs_w=1.0 / (sf2 ** lvl),
                    obs_valid=ok & (widx >= 0))
                return local_ba.optimize_global_ba(prob, cam, optcfg,
                                                   n_blocks=n_blocks)

            self._jits[key] = jax.jit(solve)
        return self._jits[key]

    # ------------------------------------------------------------------ #

    def run(self, m: MapArena, fixed_kf: Optional[int] = None) -> int:
        """Optimize all valid keyframes + points in place.  Returns the
        number of optimized keyframes.  ``fixed_kf`` defaults to the map
        origin (the reference fixes keyframe 0, Optimizer.cc:94)."""
        from . import map_device

        kfs = m.valid_keyframes()
        pts = m.valid_points()
        if len(kfs) < 3 or len(pts) == 0:
            return 0
        K = _bucket(len(kfs), (16, 64, 128, 256, 512))
        P = _bucket(len(pts), (4096, 8192, 16384, 32768))
        M = self.max_obs
        n_kp = m.kf_uv.shape[1]
        n_blocks = max(1, P // 4096)

        window_ids = np.zeros(K, np.int32)
        window_ids[:len(kfs)] = kfs
        kf_valid = np.zeros(K, bool)
        kf_valid[:len(kfs)] = True
        kf_fixed = ~kf_valid
        anchor = fixed_kf if fixed_kf is not None else int(kfs[0])
        kf_fixed[np.nonzero(window_ids == anchor)[0][:1]] = True

        win_of_kf = np.full(m.kf_R.shape[0] + 1, -1, np.int32)
        for i, g in enumerate(window_ids[:len(kfs)]):
            win_of_kf[g] = i

        pt_ids = np.zeros(P, np.int32)
        pt_ids[:len(pts)] = pts
        pt_valid = np.zeros(P, bool)
        pt_valid[:len(pts)] = True

        okf = m.pt_obs_kf[pts]                  # [n, MAX_OBS]
        oslot = m.pt_obs_slot[pts]
        live = okf >= 0
        order = np.argsort(~live, axis=1, kind="stable")[:, :M]
        sel = np.take_along_axis(live, order, 1)
        gkf = np.take_along_axis(okf, order, 1)
        gslot = np.take_along_axis(oslot, order, 1)
        self.truncated_obs += int(live.sum() - sel.sum())
        packed = np.full((P, M), -1, np.int32)
        packed[:len(pts)] = np.where(sel, gkf * n_kp + gslot, -1)

        dm = map_device.sync(m, self.cfg)
        result = self._solver(K, P, n_kp, n_blocks)(
            dm.kf_feats, dm.kf_poses, dm.points,
            jnp.asarray(window_ids), jnp.asarray(kf_fixed),
            jnp.asarray(kf_valid), jnp.asarray(win_of_kf),
            jnp.asarray(pt_ids), jnp.asarray(pt_valid),
            jnp.asarray(packed))

        new_R, new_t, new_pos = jax.device_get(
            (result.kf_R, result.kf_t, result.pt_pos))
        for i, k in enumerate(kfs):
            if int(k) != anchor:
                m.set_keyframe_pose(int(k), new_R[i], new_t[i])
        still = m.pt_valid[pts]
        m.pt_pos[pts[still]] = new_pos[:len(pts)][still]
        m.mark_points_dirty(pts[still])
        m.bump()
        return len(kfs)
