"""Keypoint undistortion in the live frame pipeline (Frame.cc:579
UndistortKeyPoints): geometry must use undistorted coordinates while image
lookups (depth) use the raw pixel position."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coebslam_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                 SystemConfig, TrackingConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.geometry import camera as cam_ops
from coebslam_tpu.ops import extractor
from coebslam_tpu.slam import frame as frame_mod
from coebslam_tpu.utils import synthetic

# fr1-class radial distortion (TUM1.yaml: k1=0.2624, k2=-0.9531, ...).
DIST = dict(k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026, k3=1.1633)


def distorted_config():
    return SystemConfig(
        camera=CameraConfig(**DIST),
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        map=MapConfig(max_keyframes=64, max_points=16384),
        tracking=TrackingConfig(max_frames_between_kf=10),
    )


class TestUndistortWiring:
    def test_process_rgbd_applies_undistortion(self):
        """fd.feats.uv must equal undistort(raw extraction uv)."""
        cfg = distorted_config()
        rng = np.random.RandomState(0)
        gray = jnp.asarray((rng.rand(480, 640) * 255).astype(np.float32))
        depth = jnp.full((480, 640), 2.0, jnp.float32)
        raw = extractor.extract(gray, cfg.orb)
        fd = frame_mod.process_rgbd(gray, depth, cfg.camera, cfg.orb)
        expect = cam_ops.undistort_points(cfg.camera, raw.uv)
        sel = np.asarray(raw.valid)
        np.testing.assert_allclose(np.asarray(fd.feats.uv)[sel],
                                   np.asarray(expect)[sel], atol=1e-3)
        # The shift is real for this distortion (corners move many px).
        shift = np.abs(np.asarray(expect)[sel] - np.asarray(raw.uv)[sel])
        assert shift.max() > 2.0

    def test_zero_distortion_is_identity(self):
        cfg = SystemConfig(orb=OrbConfig(max_keypoints=512, n_levels=3))
        rng = np.random.RandomState(1)
        gray = jnp.asarray((rng.rand(480, 640) * 255).astype(np.float32))
        depth = jnp.full((480, 640), 2.0, jnp.float32)
        raw = extractor.extract(gray, cfg.orb)
        fd = frame_mod.process_rgbd(gray, depth, cfg.camera, cfg.orb)
        sel = np.asarray(raw.valid) & np.asarray(fd.feats.valid)
        np.testing.assert_allclose(np.asarray(fd.feats.uv)[sel],
                                   np.asarray(raw.uv)[sel], atol=1e-5)


@pytest.mark.slow
@pytest.mark.slow
class TestDistortedTracking:
    def test_tracking_accuracy_under_distortion(self):
        """Render ideal pinhole frames, remap them through the distortion
        model (what a real distorted camera would deliver), and track with
        the distorted config: undistortion must recover the geometry."""
        from scipy.ndimage import map_coordinates

        from coebslam_tpu.slam.local_mapping import LocalMapper
        from coebslam_tpu.slam.tracking import Tracker

        cfg = distorted_config()
        ideal = CameraConfig()            # same intrinsics, no distortion
        planes = synthetic.make_room(seed=0)
        n_frames = 20
        poses = synthetic.camera_trajectory(n_frames, radius=0.35)
        render = jax.jit(lambda p: synthetic.render(ideal, p, planes)[:2])

        # A distorted image I_d(u) = I_ideal(undistort(u)): build the
        # sampling grid once.
        h, w = ideal.height, ideal.width
        uu, vv = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        grid = jnp.asarray(np.stack([uu, vv], -1).reshape(-1, 2))
        src = np.asarray(cam_ops.undistort_points(cfg.camera, grid))
        coords = np.stack([src[:, 1].reshape(h, w),
                           src[:, 0].reshape(h, w)])

        tracker = Tracker(cfg)
        mapper = LocalMapper(cfg, tracker.map)
        tracker.on_keyframe = mapper.process_keyframe
        states = []
        for i, pose in enumerate(poses):
            gray, depth = render(pose)
            g_d = map_coordinates(np.asarray(gray), coords, order=1,
                                  mode="nearest")
            d_d = map_coordinates(np.asarray(depth), coords, order=0,
                                  mode="nearest")
            state, _ = tracker.process_frame(
                jnp.asarray(g_d), jnp.asarray(d_d), stamp=i / 30.0)
            states.append(state)

        assert states.count("LOST") <= 1, states
        est = np.asarray([-R.T @ t for _, R, t in tracker.trajectory])
        gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
        stamps = np.arange(n_frames) / 30.0
        res = ate.ate_rmse(stamps[:len(est)], est, stamps, gt)
        assert res["rmse"] < 0.025, res
