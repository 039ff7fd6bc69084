#!/usr/bin/env python
"""Generate the TUM-format replica benchmark sequence.

The real TUM fr3 dynamic sequences are not fetchable here (zero egress);
this renders a deterministic stand-in with the same wire format, the fr3
calibration, a walking person, motion-blur windows and a camera-shake
segment (see coebslam_tpu.utils.replica).  The committed regression gate
(tests/test_tum_replica.py) pins the ATE achieved on this sequence.

Usage:
  python tools/make_tum_replica.py OUT_DIR [--frames 400] [--seed 0]
                                   [--walkers 1]
Then:
  python examples/run_tum_rgbd.py OUT_DIR --boxes OUT_DIR/boxes.txt
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--walkers", type=int, default=1)
    args = ap.parse_args()

    # The renderer is scaffolding, not the benchmarked system — keep it off
    # the TPU (its gather-heavy HLO compiles pathologically there).
    import jax
    jax.config.update("jax_platforms", "cpu")

    from coebslam_tpu.utils import replica

    t0 = time.perf_counter()
    replica.generate(args.out, n_frames=args.frames, seed=args.seed,
                     walkers=args.walkers, progress=True)
    print(f"wrote {args.frames} frames to {args.out} "
          f"in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
