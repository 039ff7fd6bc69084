#!/usr/bin/env python
"""Measure the cost of GBA's per-point observation truncation (VERDICT r3
weak #8): run the loop-circuit scene end-to-end with the global-BA
observation cap at 16 vs 32 and compare post-loop ATE + dropped-obs
counts.  The result is recorded in slam/global_ba.GlobalBA.__init__'s
docstring; re-run this after changing triangulation/fuse behavior.

Usage: python tools/measure_gba_obs.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def run(max_obs: int):
    from test_loop_e2e import (DEPTH_BIAS, N_CIRCUIT, N_OVERLAP,
                               circuit_poses, loop_config, six_wall_room)
    from coebslam_tpu.eval import ate
    from coebslam_tpu.ops import extractor
    from coebslam_tpu.slam import vocabulary as voc_mod
    from coebslam_tpu.slam.global_ba import GlobalBA
    from coebslam_tpu.slam.system import System
    from coebslam_tpu.utils import synthetic

    cfg = loop_config()
    planes = six_wall_room()
    n = N_CIRCUIT + N_OVERLAP
    poses = circuit_poses(n)
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])

    descs = []
    ex = jax.jit(lambda g: extractor.extract(g, cfg.orb))
    for i in range(0, N_CIRCUIT, 12):
        g, _ = render(poses[i])
        f = ex(g)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = voc_mod.train(np.concatenate(descs)[:6000], branching=8, depth=3,
                        seed=0)

    sysm = System(cfg, vocabulary=voc)
    sysm.loop_closer._global_ba = GlobalBA(cfg, max_obs=max_obs)
    for i, pose in enumerate(poses):
        gray, depth = render(pose)
        sysm.track_rgbd(gray, np.asarray(depth) * DEPTH_BIAS, stamp=i / 30.0)
    sysm.shutdown()
    exported = sysm.tracker.export_trajectory()
    est = np.asarray([-R.T @ t for _, R, t in exported])
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    m = min(len(est), len(gt))
    stamps = np.arange(m) / 30.0
    rmse = ate.ate_rmse(stamps, est[:m], stamps, gt[:m])["rmse"]
    return (rmse, sysm.loop_closer.n_loops_closed,
            sysm.loop_closer._global_ba.truncated_obs)


def main():
    for m in (16, 32):
        rmse, loops, dropped = run(m)
        print(f"GBA max_obs={m:3d}: post-loop ATE {rmse*100:6.2f} cm, "
              f"loops={loops}, dropped_obs={dropped}", flush=True)


if __name__ == "__main__":
    main()
