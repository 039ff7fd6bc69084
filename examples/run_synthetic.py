#!/usr/bin/env python
"""End-to-end demo: track a synthetic RGB-D sequence, print per-frame state,
score ATE against ground truth, save the trajectory in TUM format.

This restores (dataset-free) what the reference's broken offline driver was
meant to do (rgbd_tum.cc — its TrackRGBD call was removed, SURVEY §2.5).

Usage: python examples/run_synthetic.py [n_frames] [--cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from coebslam_tpu.config import SystemConfig
from coebslam_tpu.eval import ate
from coebslam_tpu.io import trajectory
from coebslam_tpu.slam.local_mapping import LocalMapper
from coebslam_tpu.slam.tracking import Tracker
from coebslam_tpu.utils import synthetic


def main():
    n_frames = 30
    for a in sys.argv[1:]:
        if a.isdigit():
            n_frames = int(a)

    cfg = SystemConfig()
    planes = synthetic.make_room(seed=0)
    poses = synthetic.camera_trajectory(n_frames, radius=0.35)
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])

    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe

    for i, pose in enumerate(poses):
        gray, depth = render(pose)
        state, n = tracker.process_frame(gray, depth, stamp=i / 30.0)
        print(f"frame {i:3d}  {state:16s} inliers={n:4d} "
              f"kfs={len(tracker.map.valid_keyframes()):3d} "
              f"points={len(tracker.map.valid_points()):5d} "
              f"budget={tracker.state.budget}")

    # ATE vs ground truth (world = first camera frame).
    R0, t0 = np.asarray(poses[0].R), np.asarray(poses[0].t)
    gt = []
    for p in poses:
        R = np.asarray(p.R) @ R0.T
        t = np.asarray(p.t) - R @ t0
        gt.append(-R.T @ t)
    est = [-R.T @ t for _, R, t in tracker.trajectory]
    stamps = np.arange(n_frames) / 30.0
    res = ate.ate_rmse(stamps[:len(est)], np.asarray(est), stamps,
                       np.asarray(gt))
    print(f"\nATE RMSE: {res['rmse']*100:.2f} cm  "
          f"(median {res['median']*100:.2f} cm over {res['pairs']} poses)")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "CameraTrajectory.txt")
    trajectory.save_tum(out, [s for s, _, _ in tracker.trajectory],
                        [(R, t) for _, R, t in tracker.trajectory])
    print(f"trajectory saved to {out}")


if __name__ == "__main__":
    main()
