"""Zero-sync realtime mode: end-to-end correctness on the synthetic room.

The realtime pipeline (slam/realtime.py) runs tracking + keyframing +
point spawning + windowed BA as one device program with no host
readbacks; this drives it over rendered RGB-D frames and checks the
trajectory against ground truth (the same acceptance shape as the
reference's dataset-replay validation, SURVEY §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from coebslam_tpu.config import SystemConfig
from coebslam_tpu.eval import ate
from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits
from coebslam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def frames():
    cfg = SystemConfig()
    planes = synthetic.make_room(seed=0)
    poses = synthetic.camera_trajectory(40, radius=0.35)
    out = []
    for i, p in enumerate(poses):
        g, d, b, _ = synthetic.render(cfg.camera, p, planes, None, i)
        out.append((np.asarray(g), np.asarray(d)))
    centers = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t)
                          for p in poses])
    return out, centers


@pytest.mark.slow
def test_realtime_tracks_and_maps(frames):
    seq, gt = frames
    cfg = SystemConfig()
    rt = RealtimeSlam(cfg, RTLimits(max_kf=16))
    for i, (g, d) in enumerate(seq):
        rt.track(g, d, stamp=i / 30.0)
    rt.block()
    res = rt.finish()

    assert res["ok"].all(), "every frame should track"
    assert res["n_kf"] >= 2
    assert res["pt_valid"].sum() > 200

    est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
    stamps = np.arange(len(seq)) / 30.0
    r = ate.ate_rmse(stamps, est, stamps, gt)
    assert r["rmse"] < 0.02, f"ATE {r['rmse']*100:.1f} cm"


@pytest.mark.slow
def test_realtime_dynamic_boxes_gate_spawn(frames):
    """Keypoints inside detector boxes must not become map points."""
    seq, _ = frames
    cfg = SystemConfig()
    rt = RealtimeSlam(cfg, RTLimits(max_kf=16))
    box = np.asarray([[200.0, 100.0, 400.0, 380.0]], np.float32)
    for i, (g, d) in enumerate(seq[:12]):
        rt.track(g, d, stamp=i / 30.0, boxes=box)
    rt.block()
    res = rt.finish()
    # Project valid points into frame 0 (identity pose): none inside box.
    cam = cfg.camera
    pts = res["pt_pos"][res["pt_valid"]]
    u = cam.fx * pts[:, 0] / np.maximum(pts[:, 2], 1e-6) + cam.cx
    v = cam.fy * pts[:, 1] / np.maximum(pts[:, 2], 1e-6) + cam.cy
    inside = ((u > box[0, 0] + 2) & (u < box[0, 2] - 2)
              & (v > box[0, 1] + 2) & (v < box[0, 3] - 2))
    frac = inside.mean() if len(pts) else 0.0
    assert frac < 0.02, f"{frac:.1%} of landmarks inside the box"


@pytest.mark.slow
def test_realtime_stereo_tracks():
    """Zero-sync STEREO: the reference's (fork-disabled) stereo pipeline
    at realtime speed — left/right pairs in, row-band disparity depth
    in-graph, same ring arenas (Frame.cc:644-818 semantics)."""
    import dataclasses
    from coebslam_tpu.geometry.se3 import SE3

    cfg = dataclasses.replace(SystemConfig(), sensor="stereo")
    planes = synthetic.make_room(seed=0)
    poses = synthetic.camera_trajectory(24, radius=0.3)
    b = cfg.camera.baseline

    rt = RealtimeSlam(cfg, RTLimits(max_kf=16, local_window=6, ba_window=6,
                                    max_frames=64))
    centers = []
    for i, p in enumerate(poses):
        gl = np.asarray(synthetic.render(cfg.camera, p, planes, None, i)[0])
        t_r = np.asarray(p.t) - np.asarray([b, 0.0, 0.0], np.float32)
        pose_r = SE3(p.R, jnp.asarray(t_r))
        gr = np.asarray(synthetic.render(cfg.camera, pose_r, planes,
                                         None, i)[0])
        rt.track_stereo(gl, gr, stamp=i / 30.0)
        centers.append(-np.asarray(p.R).T @ np.asarray(p.t))
    rt.block()
    res = rt.finish()
    assert res["ok"].all(), f"{int(res['ok'].sum())}/24"
    assert res["pt_valid"].sum() > 150
    est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
    stamps = np.arange(24) / 30.0
    r = ate.ate_rmse(stamps, est, stamps, np.asarray(centers))
    assert r["rmse"] < 0.03, f"stereo realtime ATE {r['rmse']*100:.1f} cm"
