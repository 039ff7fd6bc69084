#!/usr/bin/env python
"""Offline stereo driver for KITTI / EuRoC sequences.

Parity with the reference's stereo example targets (CMakeLists.txt:96-104:
stereo_kitti, stereo_euroc): loads rectified left/right pairs, feeds
System.track_stereo (row-band stereo matching, slam/frame.py), exports
KITTI- and TUM-format trajectories.

Usage:
  python examples/run_stereo.py kitti SEQUENCE_DIR [--settings F] [options]
  python examples/run_stereo.py euroc SEQUENCE_DIR [--timestamps F] [options]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["kitti", "euroc"])
    ap.add_argument("sequence")
    ap.add_argument("--settings")
    ap.add_argument("--timestamps", help="EuRoC timestamp file")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--out")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from coebslam_tpu.config import SystemConfig, load_config
    from coebslam_tpu.slam.system import System

    cfg = load_config(args.settings) if args.settings else SystemConfig()
    cfg = cfg.replace(sensor="stereo")

    if args.dataset == "kitti":
        from coebslam_tpu.io import kitti
        seq = kitti.load_kitti_sequence(args.sequence)
        if seq.right_files is None:
            sys.exit(f"{args.sequence}/image_1 not found — not a stereo "
                     "sequence")
        pairs = seq.load_stereo
    else:
        from coebslam_tpu.io import euroc
        from PIL import Image
        import numpy as np
        seq = euroc.load_euroc_sequence(args.sequence, args.timestamps)
        if seq.cam1_files is None:
            sys.exit(f"{args.sequence}/mav0/cam1 not found — not a stereo "
                     "sequence")

        def pairs(i):
            stamp, gl = seq.load_frame(i)
            gr = np.asarray(Image.open(seq.cam1_files[i])).astype(np.float32)
            if gr.ndim == 3:
                gr = 0.299 * gr[..., 0] + 0.587 * gr[..., 1] \
                    + 0.114 * gr[..., 2]
            return stamp, gl, gr

    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    system = System(cfg)
    for i in range(n):
        stamp, gl, gr = pairs(i)
        t0 = time.perf_counter()
        state, inl = system.track_stereo(gl, gr, stamp)
        if i % 25 == 0 or state != "OK":
            print(f"frame {i:4d}  {state:16s} inliers={inl:4d} "
                  f"kfs={len(system.map.valid_keyframes()):3d} "
                  f"pts={len(system.map.valid_points()):5d} "
                  f"{(time.perf_counter()-t0)*1e3:6.1f} ms")

    out_dir = args.out or "."
    os.makedirs(out_dir, exist_ok=True)
    system.save_keyframe_trajectory_tum(
        os.path.join(out_dir, "KeyFrameTrajectory.txt"))
    system.save_trajectory_kitti(
        os.path.join(out_dir, "CameraTrajectoryKITTI.txt"))
    system.save_trajectory_tum(os.path.join(out_dir, "CameraTrajectory.txt"))
    print(f"trajectories saved to {out_dir}")


if __name__ == "__main__":
    main()
