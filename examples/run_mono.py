#!/usr/bin/env python
"""Offline monocular driver for TUM / KITTI / EuRoC sequences.

Restores the monocular pipeline the reference fork broke (SURVEY §2.5: mono
extraction commented out at Frame.cc:268 makes mono_tum/mono_kitti/mono_euroc
dead) — two-view H/F initialization, tracking, triangulation-only map growth.

Usage:
  python examples/run_mono.py tum   SEQUENCE_DIR [options]
  python examples/run_mono.py kitti SEQUENCE_DIR [options]
  python examples/run_mono.py euroc SEQUENCE_DIR [options]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["tum", "kitti", "euroc"])
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
    cfg = cfg.replace(sensor="monocular")

    if args.dataset == "tum":
        from coebslam_tpu.io import tum
        seq = tum.load_tum_sequence(args.sequence)
        frames = lambda i: seq.load_frame(i)[:2]   # (stamp, gray)
    elif args.dataset == "kitti":
        from coebslam_tpu.io import kitti
        seq = kitti.load_kitti_sequence(args.sequence)
        frames = seq.load_frame
    else:
        from coebslam_tpu.io import euroc
        seq = euroc.load_euroc_sequence(args.sequence, args.timestamps)
        frames = seq.load_frame

    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    system = System(cfg)
    for i in range(n):
        stamp, gray = frames(i)
        t0 = time.perf_counter()
        state, inl = system.track_monocular(gray, stamp)
        if i % 25 == 0 or state != "OK":
            print(f"frame {i:4d}  {state:16s} inliers={inl:4d} "
                  f"kfs={len(system.map.valid_keyframes()):3d} "
                  f"pts={len(system.map.valid_points()):5d} "
                  f"{(time.perf_counter()-t0)*1e3:6.1f} ms")

    out_dir = args.out or "."
    os.makedirs(out_dir, exist_ok=True)
    system.save_keyframe_trajectory_tum(
        os.path.join(out_dir, "KeyFrameTrajectory.txt"))
    if args.dataset == "kitti":
        system.save_trajectory_kitti(
            os.path.join(out_dir, "CameraTrajectoryKITTI.txt"))
    else:
        system.save_trajectory_tum(
            os.path.join(out_dir, "CameraTrajectory.txt"))
    print(f"trajectories saved to {out_dir}")


if __name__ == "__main__":
    main()
