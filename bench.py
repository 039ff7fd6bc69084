#!/usr/bin/env python
"""Benchmark: end-to-end RGB-D SLAM tracking throughput on one chip.

Renders a synthetic textured room (no dataset dependency), runs the full
tracking pipeline — feature extraction, MXU Hamming matching, robust pose
GN, keyframe insertion with Schur-complement local BA — and reports
steady-state frames/s.

Baseline: the reference (COEB-SLAM / ORB-SLAM2) targets real-time tracking
at ~30 frames/s on a desktop CPU (SURVEY §6: per-frame "TrackRGBD all time"
instrumentation against 30 Hz TUM input; upstream ORB-SLAM2 paper reports
~30 Hz).  vs_baseline = fps / 30.

Prints exactly one JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.slam.local_mapping import LocalMapper
    from coebslam_tpu.slam.tracking import Tracker
    from coebslam_tpu.utils import synthetic

    cfg = SystemConfig()          # full TUM VGA: 640x480, 8 levels, 1000 feat
    planes = synthetic.make_room(seed=0)
    n_frames = 40
    poses = synthetic.camera_trajectory(n_frames, radius=0.35)
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])

    # Pre-render all frames to host so rendering isn't in the timed loop.
    frames = []
    for p in poses:
        g, d = render(p)
        frames.append((np.asarray(g), np.asarray(d)))

    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe

    # Warmup: first frames trigger every compile (frontend, both track-step
    # shapes, local BA).
    n_warm = 6
    for i in range(n_warm):
        tracker.process_frame(frames[i][0], frames[i][1], stamp=i / 30.0)

    t0 = time.perf_counter()
    n_timed = 0
    for i in range(n_warm, n_frames):
        tracker.process_frame(frames[i][0], frames[i][1], stamp=i / 30.0)
        n_timed += 1
    elapsed = time.perf_counter() - t0

    fps = n_timed / elapsed
    print(json.dumps({
        "metric": "rgbd_tracking_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
