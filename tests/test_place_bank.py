"""Persistent place memory beyond the keyframe ring (slam/maintenance.py
bank): the realtime mode must close loops to — and relocalize against —
places whose keyframes the ring evicted long ago.

The reference keeps EVERY keyframe in its KeyFrameDatabase inverted file
(/root/reference/src/KeyFrameDatabase.cc:33-46) and its Map never drops
keyframes except by culling (Map.h:43-60); the realtime ring alone
forgets a place ``max_kf`` keyframes after visiting it (r4 VERDICT
missing #1).  Here the ring is deliberately TINY (8 rows) against a
~27-keyframe circuit, so by the time the camera returns to its start the
start keyframes have been evicted ~3 ring generations ago — only the
bank can recognize them.
"""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # ~3 min of e2e runs (fast tier: -m 'not slow')

from coebslam_tpu.eval import ate
from coebslam_tpu.slam import vocabulary as voc_mod
from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits
from coebslam_tpu.utils import synthetic

from test_loop_e2e import (DEPTH_BIAS, N_CIRCUIT, N_OVERLAP, circuit_poses,
                           six_wall_room)
from test_realtime_loop import rt_config

#: Ring of 8 rows vs ~27 keyframes/circuit: wraps >= 3x per lap.
BANK_LIM = RTLimits(max_kf=8, spawn_per_kf=256, ba_window=4,
                    local_window=4, max_frames=256,
                    bank_cap=64, bank_words=64, bank_landmarks=128,
                    seed_slots=256)


@pytest.fixture(scope="module")
def scene():
    cfg = rt_config()
    planes = six_wall_room()
    poses = circuit_poses(N_CIRCUIT + N_OVERLAP)
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])

    from coebslam_tpu.ops import extractor
    descs = []
    ex = jax.jit(lambda g: extractor.extract(g, cfg.orb))
    for i in range(0, N_CIRCUIT, 12):
        g, _ = render(poses[i])
        f = ex(g)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = voc_mod.train(np.concatenate(descs)[:6000], branching=8, depth=3,
                        seed=0)
    frames = []
    for p in poses:
        g, d = render(p)
        frames.append((np.asarray(g), np.asarray(d) * DEPTH_BIAS))
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    return cfg, voc, frames, gt


def _run(cfg, voc, frames, maintain):
    rt = RealtimeSlam(cfg, BANK_LIM,
                      vocabulary=voc if maintain else None,
                      maintain_every=1)
    for i, (g, d) in enumerate(frames):
        rt.track(g, d, stamp=i / 30.0)
    rt.block()
    return rt.finish()


def _centers(res):
    return np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])


def test_bank_loop_closure_after_ring_wrap(scene):
    """A full drifted circuit with an 8-row ring: the closure candidate
    MUST come from the bank (every start keyframe is evicted), and
    applying it must beat the open-loop odometry."""
    cfg, voc, frames, gt = scene
    res = _run(cfg, voc, frames, maintain=True)
    res_odo = _run(cfg, voc, frames, maintain=False)

    n = len(frames)
    assert res["n_kf"] >= 3 * BANK_LIM.max_kf, \
        f"ring only wrapped {res['n_kf']}/{BANK_LIM.max_kf} rows"
    assert res["bank_entries"] > BANK_LIM.max_kf, "bank not accumulating"

    # The closure event must target an EVICTED keyframe: anything still
    # in the ring is at most max_kf keyframes old.
    applied = [e for e in res["loop_events"] if e["applied"]]
    assert res["n_bank_loops"] >= 1, \
        f"no bank closure applied; events={res['loop_events']}"
    assert any(e["lid"] - e["cand_lid"] > BANK_LIM.max_kf for e in applied)

    # Closure benefit metric: the circuit period is N_CIRCUIT frames, so
    # frame i and frame i+N_CIRCUIT are the SAME place — the gap between
    # the overlap frames and their first-lap twins is the accumulated
    # drift the closure exists to remove.  (Full-trajectory ATE is the
    # wrong metric here: with an 8-row ring only the live tail can be
    # re-mapped; the evicted middle keeps its odometry.)
    c_loop, c_odo = _centers(res), _centers(res_odo)
    gap_loop = np.linalg.norm(c_loop[N_CIRCUIT:] - c_loop[:N_OVERLAP],
                              axis=1).mean()
    gap_odo = np.linalg.norm(c_odo[N_CIRCUIT:] - c_odo[:N_OVERLAP],
                             axis=1).mean()
    assert gap_loop < 0.6 * gap_odo, (
        f"closure did not close the loop: revisit gap {gap_loop:.3f} m "
        f"vs odometry {gap_odo:.3f} m")
    # And the global trajectory must not get WORSE than odometry.
    stamps = np.arange(n) / 30.0
    r_loop = ate.ate_rmse(res["stamps"], _centers(res), stamps, gt)
    r_odo = ate.ate_rmse(res_odo["stamps"], _centers(res_odo), stamps, gt)
    assert r_loop["rmse"] <= r_odo["rmse"] * 1.1 + 0.005, (
        f"closure hurt: {r_loop['rmse']:.3f} vs {r_odo['rmse']:.3f}")


def test_bank_relocalization_to_evicted_place(scene):
    """Track HALF the circuit (ring holds only its tail), go dark until
    LOST, then re-show an early view: the ring cannot know it — only a
    bank hit can relocalize, seeding the staged landmarks for tracking
    to resume on."""
    cfg, voc, frames, gt = scene
    n_half = N_CIRCUIT // 2
    rt = RealtimeSlam(cfg, BANK_LIM, vocabulary=voc, maintain_every=1)
    for i in range(n_half):
        rt.track(frames[i][0], frames[i][1], stamp=i / 30.0)
    black = np.zeros_like(frames[0][0])
    blackd = np.zeros_like(frames[0][1])
    for k in range(8):
        rt.track(black, blackd, stamp=(n_half + k) / 30.0)
    revisit = list(range(6, 16))
    for j, i in enumerate(revisit):
        rt.track(frames[i][0], frames[i][1],
                 stamp=(n_half + 8 + j) / 30.0)
    rt.block()
    res = rt.finish()

    assert res["n_bank_reloc"] >= 1, "no bank relocalization applied"
    c = _centers(res)
    ok = res["ok"]
    # Tracking must RESUME on the seeded landmarks...
    assert ok[-len(revisit):].sum() >= len(revisit) - 2
    # ...and land where this session itself placed the revisited frames
    # (same map frame — no alignment needed).
    err = np.linalg.norm(c[-len(revisit):] - c[revisit], axis=1)
    assert np.median(err) < 0.30, f"reloc pose off: {err}"
