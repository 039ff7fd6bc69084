"""Zero-sync realtime STEREO on a wide-baseline dynamic scene (r4
VERDICT weak #6: the row-band stereo path had only been scored on
narrow-baseline synthetic scenes).

Baseline here is 4x the TUM-class default (0.30 m, bf=160 — KITTI-class
geometry scaled to the indoor room: disparities run ~50-110 px), the
scene carries the walking-replica stressors (walker + a motion-blur
window), and depth comes ONLY from the in-graph row-band disparity
(frame.process_stereo, the reference's Frame::ComputeStereoMatches,
Frame.cc:644-818)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from coebslam_tpu.config import (CameraConfig, OrbConfig, SystemConfig,
                                 TrackingConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.geometry.se3 import SE3
from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits
from coebslam_tpu.utils import replica, synthetic


def test_wide_baseline_stereo_realtime():
    cfg = SystemConfig(
        camera=CameraConfig(bf=160.0),        # baseline 0.30 m
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="stereo")
    planes = synthetic.make_room(seed=0)
    walker = synthetic.make_walker(seed=1, start=(-1.0, -0.25, 1.8),
                                   velocity=(0.011, 0.004, 0.0),
                                   half_w=0.28, half_h=0.62)
    n = 120
    poses = replica.walking_trajectory(n, seed=3)
    b = cfg.camera.baseline

    render = jax.jit(lambda p, i: synthetic.render(
        cfg.camera, p, planes, walker, i)[:3])

    lim = RTLimits(max_kf=32, spawn_per_kf=256, ba_window=6,
                   local_window=6, max_frames=256)
    rt = RealtimeSlam(cfg, lim)
    for i, p in enumerate(poses):
        gl, _, box = render(p, jnp.asarray(i, jnp.float32))
        t_r = np.asarray(p.t) - np.asarray([b, 0.0, 0.0], np.float32)
        gr, _, _ = render(SE3(p.R, jnp.asarray(t_r)),
                          jnp.asarray(i, jnp.float32))
        gl = np.asarray(gl)
        gr = np.asarray(gr)
        if 40 <= i < 52:                       # motion-blur window
            gl = replica._box_blur(gl, 9)
            gr = replica._box_blur(gr, 9)
        boxes = np.asarray(box)[None]
        rt.track_stereo(gl.astype(np.float32), gr.astype(np.float32),
                        stamp=i / 30.0,
                        boxes=boxes if boxes[0, 0] >= 0 else None)
    rt.block()
    res = rt.finish()

    ok = res["ok"]
    assert ok.sum() >= n - 5, f"{int(ok.sum())}/{n} tracked"
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
    r = ate.ate_rmse(res["stamps"], est, np.arange(n) / 30.0, gt)
    assert r["rmse"] < 0.05, \
        f"wide-baseline stereo ATE {r['rmse']*100:.2f} cm"
