"""Stereo pipeline + checkpoint/resume + metrics tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                 SystemConfig, TrackingConfig)
from coebslam_tpu.geometry.se3 import SE3
from coebslam_tpu.io import checkpoint
from coebslam_tpu.utils import synthetic


def stereo_config():
    return SystemConfig(
        camera=CameraConfig(),
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        map=MapConfig(max_keyframes=64, max_points=16384),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="stereo")


def render_stereo(cfg, pose, planes):
    """Left view + right view displaced by the baseline along camera +x."""
    gl, dl, _, _ = synthetic.render(cfg.camera, pose, planes)
    # Right camera: world pose shifted by baseline along the camera x-axis.
    b = cfg.camera.baseline
    t_r = np.asarray(pose.t) - np.asarray([b, 0.0, 0.0], np.float32)
    pose_r = SE3(pose.R, jnp.asarray(t_r))
    gr, _, _, _ = synthetic.render(cfg.camera, pose_r, planes)
    return gl, gr, dl


class TestStereoFrontend:
    def test_stereo_depth_matches_ground_truth(self):
        cfg = stereo_config()
        planes = synthetic.make_room(seed=0)
        pose = synthetic.camera_trajectory(30)[0]
        gl, gr, d_gt = render_stereo(cfg, pose, planes)

        from coebslam_tpu.slam import frame as frame_mod
        fd = jax.jit(lambda a, b: frame_mod.process_stereo(
            a, b, cfg.camera, cfg.orb))(gl, gr)
        valid = np.asarray(fd.feats.valid) & (np.asarray(fd.depth) > 0)
        assert valid.sum() > 200, valid.sum()
        uv = np.asarray(fd.feats.uv)[valid]
        z_est = np.asarray(fd.depth)[valid]
        z_gt = np.asarray(d_gt)[np.clip(uv[:, 1].round().astype(int), 0, 479),
                                np.clip(uv[:, 0].round().astype(int), 0, 639)]
        rel = np.abs(z_est - z_gt) / z_gt
        assert np.median(rel) < 0.05, np.median(rel)

    @pytest.mark.slow
    def test_stereo_tracking_e2e(self):
        from coebslam_tpu.slam.system import System
        cfg = stereo_config()
        planes = synthetic.make_room(seed=0)
        poses = synthetic.camera_trajectory(40, radius=0.35)[:12]
        sysm = System(cfg)
        states = []
        for i, pose in enumerate(poses):
            gl, gr, _ = render_stereo(cfg, pose, planes)
            state, n = sysm.track_stereo(gl, gr, stamp=i / 30.0)
            states.append(state)
        assert states[0] == "OK"
        assert states.count("OK") >= len(states) - 1, states


class TestCheckpoint:
    def test_roundtrip_and_localization(self, tmp_path):
        from coebslam_tpu.slam.system import System
        cfg = SystemConfig(
            camera=CameraConfig(),
            orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
            map=MapConfig(max_keyframes=64, max_points=16384),
            tracking=TrackingConfig(max_frames_between_kf=10))
        planes = synthetic.make_room(seed=0)
        poses = synthetic.camera_trajectory(40, radius=0.35)[:8]
        render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])
        sysm = System(cfg)
        for i, pose in enumerate(poses):
            g, d = render(pose)
            sysm.track_rgbd(g, d, stamp=i / 30.0)
        n_pts = len(sysm.map.valid_points())
        n_kfs = len(sysm.map.valid_keyframes())
        path = str(tmp_path / "map.npz")
        checkpoint.save_map(path, sysm.map, tracker_state=sysm.tracker.state)

        # Fresh system, restore, localization-only against the frozen map.
        sysm2 = System(cfg)
        sysm2.map = checkpoint.load_map(path, cfg)
        sysm2.tracker.map = sysm2.map
        sysm2.mapper.map = sysm2.map
        assert checkpoint.restore_tracker_pose(path, sysm2.tracker)
        assert len(sysm2.map.valid_points()) == n_pts
        assert len(sysm2.map.valid_keyframes()) == n_kfs

        sysm2.activate_localization_mode()
        sysm2.tracker.state.mode = "OK"
        sysm2.tracker.ref_kf = int(sysm2.map.valid_keyframes()[-1])
        # Seed last_frame associations from the last keyframe.
        ref = sysm2.tracker.ref_kf
        from coebslam_tpu.slam.tracking import FrameRecord
        m = sysm2.map
        sysm2.tracker.last_frame = FrameRecord(
            uv=m.kf_uv[ref], level=m.kf_level[ref], angle=m.kf_angle[ref],
            desc=m.kf_desc[ref], depth=m.kf_depth[ref], ur=m.kf_ur[ref],
            valid=m.kf_kp_valid[ref], point_ids=m.kf_obs_pt[ref])
        g, d = render(poses[7])
        state, n = sysm2.track_rgbd(g, d, stamp=99.0)
        assert state == "OK" and n > 100, (state, n)
        # Localization mode must not grow the map.
        assert len(sysm2.map.valid_keyframes()) == n_kfs

    def test_vocabulary_roundtrip(self, tmp_path):
        from coebslam_tpu.slam import vocabulary as voc_mod
        rng = np.random.RandomState(0)
        desc = rng.randint(0, 256, (500, 32), dtype=np.uint8)
        voc = voc_mod.train(desc, branching=5, depth=2)
        p = str(tmp_path / "voc.npz")
        checkpoint.save_vocabulary(p, voc)
        voc2 = checkpoint.load_vocabulary(p)
        w1, _ = voc_mod.transform_host(voc, desc[:50])
        w2, _ = voc_mod.transform_host(voc2, desc[:50])
        np.testing.assert_array_equal(w1, w2)


class TestMetrics:
    def test_collector(self):
        from coebslam_tpu.utils.metrics import MetricsCollector
        mc = MetricsCollector()
        with mc.stage("frontend"):
            pass
        mc.record(frame=0, stamp=0.0, state="OK", n_inliers=100, wall_ms=10.0)
        mc.record(frame=1, stamp=0.1, state="LOST", n_inliers=0, wall_ms=20.0)
        s = mc.summary()
        assert s["frames"] == 2
        assert s["lost_frames"] == 1
        assert abs(s["wall_ms_mean"] - 15.0) < 1e-6
        assert "frontend" in s["stage_ms_mean"]
