"""In-graph loop closing + relocalization for the zero-sync realtime mode
(slam/maintenance.py): a drifted camera circuit must fire the device-side
loop pipeline — BoW detect, 3D RANSAC closure, Sim3 pose graph, point
remap — with NO host readback during the run, and measurably reduce ATE
(the reference's LoopClosing thread, LoopClosing.cc:58-777, in the
no-readback regime)."""
import numpy as np
import jax
import pytest

from coebslam_tpu.config import (CameraConfig, OrbConfig, SystemConfig,
                                 TrackingConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.slam import vocabulary as voc_mod
from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits
from coebslam_tpu.utils import synthetic

from test_loop_e2e import (DEPTH_BIAS, N_CIRCUIT, N_OVERLAP, circuit_poses,
                           six_wall_room)


def rt_config():
    return SystemConfig(
        camera=CameraConfig(),
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        tracking=TrackingConfig(max_frames_between_kf=4,
                                max_translation_per_frame=0.5),
        use_dynamic_filtering=False,
    )


@pytest.fixture(scope="module")
def rt_loop_run():
    cfg = rt_config()
    planes = six_wall_room()
    n = N_CIRCUIT + N_OVERLAP
    poses = circuit_poses(n)
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

    # The ring must span the whole circuit (~50 keyframes at this KF
    # rate) or the revisited place is evicted before the camera returns.
    lim = RTLimits(max_kf=64, spawn_per_kf=256, ba_window=6,
                   local_window=6, max_frames=256)
    rt = RealtimeSlam(cfg, lim, vocabulary=voc, maintain_every=1)
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    for i, pose in enumerate(poses):
        gray, depth = render(pose)
        rt.track(np.asarray(gray), np.asarray(depth) * DEPTH_BIAS,
                 stamp=i / 30.0)
    rt.block()
    res = rt.finish()
    return res, gt


@pytest.mark.slow
class TestRealtimeLoop:
    def test_loop_fires_in_graph(self, rt_loop_run):
        res, _ = rt_loop_run
        assert res["n_loops_closed"] >= 1, res["loop_events"]
        ev = [e for e in res["loop_events"] if e["applied"]]
        # The closure must connect the end of the circuit back to its
        # start (candidate among the earliest keyframes).
        assert ev and ev[0]["cand_lid"] <= 8, ev
        assert ev[0]["n_inliers"] >= 20, ev

    def test_false_candidates_rejected(self, rt_loop_run):
        """Mid-circuit BoW hits (opposite sides of the room can look
        alike) must die at the 3D RANSAC gate, not corrupt the map — the
        reference's Sim3 inlier gate (LoopClosing.cc:276-401)."""
        res, _ = rt_loop_run
        for e in res["loop_events"]:
            if e["applied"]:
                assert e["cand_lid"] <= 8, e       # true closure only
            else:
                assert e["n_inliers"] < 20, e      # rejected for a reason

    def test_loop_reduces_drift(self, rt_loop_run):
        """The final overlap frames (after correction) must land near
        ground truth despite the depth-bias drift accumulated over the
        circuit."""
        res, gt = rt_loop_run
        est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
        n = len(est)
        # Tail = frames after the closure re-aligned the map.
        tail = slice(n - 8, n)
        r_tail = ate.ate_rmse(res["stamps"][tail], est[tail],
                              res["stamps"][tail], gt[-len(est):][tail])
        # Mid-circuit drifted error for comparison (before any closure).
        mid = slice(n // 2 - 4, n // 2 + 4)
        r_mid = ate.ate_rmse(res["stamps"][mid], est[mid],
                             res["stamps"][mid], gt[-len(est):][mid])
        # Windowed ATE aligns each slice, so it measures local
        # consistency.  The residual full-trajectory error is dominated
        # by the DEPTH_BIAS scale component, which a fixed-scale RGB-D
        # pose graph (reference parity, Optimizer.cc:781 bFixScale)
        # cannot remove — the bound below is what closure + windowed BA
        # achieve on this drifted circuit (measured 7.3 cm).
        r_all = ate.ate_rmse(res["stamps"], est, res["stamps"], gt[-n:])
        assert res["n_loops_closed"] >= 1
        assert r_tail["rmse"] < 0.03, r_tail["rmse"]
        assert r_all["rmse"] < 0.12, (r_all["rmse"], r_mid["rmse"],
                                      r_tail["rmse"])

    def test_no_silent_saturation(self, rt_loop_run):
        """finish() must report ring occupancy honestly."""
        res, _ = rt_loop_run
        assert res["n_kf"] >= res["n_kf_live"]
        assert res["kf_evicted"] == max(0, res["n_kf"] - 64)
        assert res["frames_dropped"] == 0      # 110 frames < 256-ring


@pytest.mark.slow
class TestRealtimeReloc:
    """In-graph relocalization: after a kidnap (camera teleports to a
    previously-mapped place), the maintenance program must re-acquire the
    pose from BoW + 3D-3D RANSAC with no host involvement
    (Relocalization, Tracking.cc:1417-1580, in the no-readback regime)."""

    @pytest.fixture(scope="class")
    def kidnap_run(self):
        cfg = rt_config()
        planes = six_wall_room()
        poses = circuit_poses(N_CIRCUIT)
        render = jax.jit(
            lambda p: synthetic.render(cfg.camera, p, planes)[:2])

        from coebslam_tpu.ops import extractor
        descs = []
        ex = jax.jit(lambda g: extractor.extract(g, cfg.orb))
        for i in range(0, 50, 10):
            g, _ = render(poses[i])
            f = ex(g)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        voc = voc_mod.train(np.concatenate(descs)[:6000], branching=8,
                            depth=3, seed=0)

        lim = RTLimits(max_kf=64, spawn_per_kf=256, ba_window=6,
                       local_window=6, max_frames=256)
        rt = RealtimeSlam(cfg, lim, vocabulary=voc, maintain_every=2)
        # Map half the circuit, then teleport back to the start region.
        sched = list(range(0, 50)) + list(range(6, 16))
        for k, i in enumerate(sched):
            gray, depth = render(poses[i])
            rt.track(np.asarray(gray), np.asarray(depth), stamp=k / 30.0)
        rt.block()
        res = rt.finish()
        gt = np.asarray([-np.asarray(poses[i].R).T @ np.asarray(poses[i].t)
                         for i in sched])
        return res, gt

    def test_relocalizes(self, kidnap_run):
        res, _ = kidnap_run
        assert res["n_relocalizations"] >= 1
        # The final frames (post-reloc) must track again.
        assert res["ok"][-4:].all(), res["ok"][-12:]

    def test_pose_reacquired(self, kidnap_run):
        """Post-reloc poses must be consistent with the revisited
        segment's ground truth (windowed alignment)."""
        res, gt = kidnap_run
        est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
        tail = slice(len(est) - 5, len(est))
        r = ate.ate_rmse(res["stamps"][tail], est[tail],
                         res["stamps"][tail], gt[tail])
        assert r["rmse"] < 0.05, r["rmse"]
