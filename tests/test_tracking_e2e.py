"""End-to-end tracking MVP on a synthetic static scene (SURVEY §7.2 step 3
milestone gate: track, score ATE with the Horn pipeline)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                 SystemConfig, TrackingConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.slam.tracking import Tracker, OK
from coebslam_tpu.utils import synthetic


def small_config():
    """Realistic TUM-class intrinsics (640x480, fx 535): the angular
    resolution matters — a half-res wide-angle camera on a distant-wall
    scene has a rotation/translation ambiguity valley that destabilizes any
    RGB-D odometry (verified experimentally)."""
    return SystemConfig(
        camera=CameraConfig(),   # TUM fr3 defaults
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        map=MapConfig(max_keyframes=64, max_points=16384),
        tracking=TrackingConfig(max_frames_between_kf=10),
    )


def centers_from_traj(traj):
    out = []
    for stamp, R, t in traj:
        out.append(-R.T @ t)
    return np.asarray(out)


@pytest.fixture(scope="module")
def tracked():
    cfg = small_config()
    planes = synthetic.make_room(seed=0)
    n_frames = 30
    poses = synthetic.camera_trajectory(n_frames, radius=0.35)
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])

    from coebslam_tpu.slam.local_mapping import LocalMapper
    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe
    states = []
    for i, pose in enumerate(poses):
        gray, depth = render(pose)
        state, n = tracker.process_frame(gray, depth, stamp=i / 30.0)
        states.append((state, n))
    return cfg, tracker, poses, states


class TestTrackingE2E:
    def test_initializes_and_stays_ok(self, tracked):
        _, tracker, _, states = tracked
        assert states[0][0] == OK            # initialized on first frame
        ok_frames = sum(1 for s, _ in states[1:] if s == OK)
        assert ok_frames >= len(states) - 1, states

    def test_ate_below_threshold(self, tracked):
        _, tracker, poses, _ = tracked
        est = centers_from_traj(tracker.trajectory)
        gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
        stamps = np.arange(len(gt)) / 30.0
        res = ate.ate_rmse(stamps[:len(est)], est, stamps, gt)
        # Static synthetic room, exact depth: sub-centimetre.
        assert res["rmse"] < 0.02, res

    def test_map_grows(self, tracked):
        _, tracker, _, _ = tracked
        assert tracker.map.n_kf >= 2
        assert len(tracker.map.valid_points()) > 300

    def test_covisibility_connected(self, tracked):
        _, tracker, _, _ = tracked
        m = tracker.map
        if m.n_kf < 2:
            pytest.skip("single KF")
        # Every later *valid* KF shares points with some other KF (culled
        # KFs have zeroed covisibility rows).
        valid = m.valid_keyframes()
        for k in valid:
            if k == 0:
                continue
            assert m.covis[k, :m.n_kf].max() > 0, k
        # Spanning tree parents assigned.
        assert (m.kf_parent[valid[valid > 0]] >= 0).all()


class TestTrajectoryExport:
    """Loop-consistent trajectory export (System::SaveTrajectoryTUM,
    System.cc:331-401): frame poses are stored relative to their reference
    keyframe and composed at save time, so post-hoc pose corrections
    (pose graph / global BA) retroactively fix every earlier frame."""

    def test_export_close_to_live_and_accurate(self, tracked):
        """With no loop ever closed, export differs from the at-track-time
        record only by the local-BA refinement of the reference keyframes
        (small), and its ATE is as good as the live trajectory's."""
        _, tracker, poses, _ = tracked
        live = tracker.trajectory
        exported = tracker.export_trajectory()
        assert len(exported) == len(live)
        for (s1, R1, t1), (s2, R2, t2) in zip(live, exported):
            assert s1 == s2
            np.testing.assert_allclose(R1, R2, atol=2e-2)
            np.testing.assert_allclose(t1, t2, atol=2e-2)
        est = centers_from_traj(exported)
        gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
        stamps = np.arange(len(gt)) / 30.0
        res = ate.ate_rmse(stamps[:len(est)], est, stamps, gt)
        assert res["rmse"] < 0.02, res

    def test_export_reflects_post_hoc_correction(self, tracked):
        """Apply a rigid SE3 correction D to every keyframe (as a loop
        closure would); every exported frame pose must move by exactly D."""
        _, tracker, _, _ = tracked
        m = tracker.map
        saved_R, saved_t = m.kf_R.copy(), m.kf_t.copy()
        before = tracker.export_trajectory()
        # D: 10 deg yaw + 0.3 m shift, applied on the world side: T' = T @ D.
        c, s = np.cos(0.17), np.sin(0.17)
        Rd = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        td = np.array([0.3, -0.1, 0.2], np.float32)
        try:
            for k in m.valid_keyframes():
                m.kf_t[k] = m.kf_R[k] @ td + m.kf_t[k]
                m.kf_R[k] = m.kf_R[k] @ Rd
            after = tracker.export_trajectory()
            moved = 0
            for (_, R0, t0), (_, R1, t1), rec in zip(
                    before, after, tracker.traj_relative):
                if rec[1] < 0:
                    continue                    # no reference KF: absolute
                np.testing.assert_allclose(R1, R0 @ Rd, atol=1e-4)
                np.testing.assert_allclose(t1, R0 @ td + t0, atol=1e-4)
                moved += 1
            assert moved > len(after) * 0.9, moved
        finally:
            m.kf_R[:], m.kf_t[:] = saved_R, saved_t

    def test_freeze_trajectory_bakes_absolute(self, tracked):
        """Map reset path: freeze_trajectory converts records to absolute
        so a destroyed map cannot corrupt the saved history."""
        _, tracker, _, _ = tracked
        m = tracker.map
        saved_R, saved_t = m.kf_R.copy(), m.kf_t.copy()
        baseline = tracker.export_trajectory()
        tracker.freeze_trajectory()
        try:
            m.kf_t[m.valid_keyframes()] += 5.0   # simulated map destruction
            frozen = tracker.export_trajectory()
            for (_, _, t0), (_, _, t1) in zip(baseline, frozen):
                np.testing.assert_allclose(t1, t0, atol=1e-5)
        finally:
            m.kf_R[:], m.kf_t[:] = saved_R, saved_t


class TestAnchoredPose:
    def test_culled_reference_reanchors_to_parent(self):
        """remove_keyframe stores the mTcp relative pose (KeyFrame.cc:515);
        anchored_pose walks the cull chain exactly like the
        while(pKF->isBad()) loop in System.cc:351-360."""
        from coebslam_tpu.slam.map import MapArena
        cfg = small_config()
        m = MapArena(cfg)
        rng = np.random.RandomState(3)
        N = cfg.orb.max_keypoints
        blank = dict(uv=np.zeros((N, 2), np.float32),
                     level=np.zeros(N, np.int32),
                     angle=np.zeros(N, np.float32),
                     desc=np.zeros((N, 32), np.uint8),
                     depth=np.zeros(N, np.float32),
                     ur=np.full(N, -1, np.float32),
                     kp_valid=np.zeros(N, bool),
                     point_ids=np.full(N, -1, np.int32))
        poses = []
        for i in range(3):
            w = 0.1 * rng.randn(3)
            th = np.linalg.norm(w)
            K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                          [-w[1], w[0], 0]])
            R = (np.eye(3) + np.sin(th) / th * K
                 + (1 - np.cos(th)) / th**2 * (K @ K)).astype(np.float32)
            t = rng.randn(3).astype(np.float32)
            poses.append((R, t))
            m.add_keyframe(R, t, float(i), **blank)
        m.kf_parent[1] = 0
        m.kf_parent[2] = 1
        # Cull KF2 then KF1: anchored_pose(2) must chain 2 -> 1 -> 0.
        m.remove_keyframe(2)
        m.remove_keyframe(1)
        # Move the surviving parent: the culled poses must follow rigidly.
        R0n = poses[0][0] @ np.array(
            [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        t0n = poses[0][1] + np.float32([1, 2, 3])
        m.kf_R[0], m.kf_t[0] = R0n, t0n
        R2, t2, found = m.anchored_pose(2)
        assert found
        # T2' = (T2 T0^-1) T0': relative geometry to the anchor preserved.
        R2e, t2e = poses[2]
        R0, t0 = poses[0]
        R_rel = R2e @ R0.T
        t_rel = t2e - R_rel @ t0
        np.testing.assert_allclose(R2, R_rel @ R0n, atol=1e-5)
        np.testing.assert_allclose(t2, R_rel @ t0n + t_rel, atol=1e-5)
