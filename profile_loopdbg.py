#!/usr/bin/env python
"""Debug harness: where do keyframe poses go NaN during loop correction?"""
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from test_loop_e2e import (loop_config, six_wall_room, circuit_poses,
                           N_CIRCUIT, N_OVERLAP, DEPTH_BIAS)
from coebslam_tpu.slam import vocabulary as voc_mod
from coebslam_tpu.slam.system import System
from coebslam_tpu.slam.loop_closing import LoopCloser
from coebslam_tpu.utils import synthetic
from coebslam_tpu.ops import extractor


def nan_report(m, tag):
    kfs = m.valid_keyframes()
    rn = np.isnan(m.kf_R[kfs]).any()
    tn = np.isnan(m.kf_t[kfs]).any()
    pn = np.isnan(m.pt_pos[m.valid_points()]).any()
    print(f"[{tag}] kfR NaN={rn} kft NaN={tn} pt NaN={pn}", flush=True)
    return rn or tn or pn


orig_correct = LoopCloser.correct
orig_pg = LoopCloser.run_pose_graph
orig_saf = LoopCloser._search_and_fuse


def correct(self, kf_id, cand, S_corr):
    m = self.map
    import jax.numpy as jnp
    from coebslam_tpu.geometry.sim3 import Sim3
    print("S_corr s,R,t:", np.asarray(S_corr.s), flush=True)
    nan_report(m, "pre-correct")
    orig_correct(self, kf_id, cand, S_corr)
    nan_report(m, "post-correct-all")


def run_pose_graph(self, fixed_kf):
    nan_report(self.map, "pre-posegraph")
    orig_pg(self, fixed_kf)
    nan_report(self.map, "post-posegraph")


def saf(self, group_ids):
    nan_report(self.map, "pre-saf")
    orig_saf(self, group_ids)
    nan_report(self.map, "post-saf")


LoopCloser.correct = correct
LoopCloser.run_pose_graph = run_pose_graph
LoopCloser._search_and_fuse = saf

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
voc = voc_mod.train(np.concatenate(descs)[:6000], branching=8, depth=3, seed=0)
sysm = System(cfg, vocabulary=voc)

# hook GBA
def wrap_gba(sysm):
    lc = sysm.loop_closer
    class GBAWrap:
        def __init__(self, inner): self.inner = inner
        def run(self, m, fixed_kf):
            nan_report(m, "pre-gba")
            self.inner.run(m, fixed_kf)
            nan_report(m, "post-gba")
    from coebslam_tpu.slam.global_ba import GlobalBA
    lc._global_ba = GBAWrap(GlobalBA(cfg))

wrap_gba(sysm)

for i, pose in enumerate(poses):
    gray, depth = render(pose)
    sysm.track_rgbd(gray, np.asarray(depth) * DEPTH_BIAS, stamp=i / 30.0)
    if sysm.loop_closer.n_loops_closed > 0:
        break
sysm.shutdown()
print("done; loops:", sysm.loop_closer.n_loops_closed)
