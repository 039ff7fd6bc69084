#!/usr/bin/env python
"""Steady-state per-frame breakdown of the v3 dynamic pipeline.

Splits each production frame into: detector dispatch, tracker step wall
time (further split into device-result wait vs host tail), mapper poll
time, and KF-creation spikes; plus isolated device latency of each jitted
program (fused dyn step, tri/fuse/BA stage programs).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 150
cache = os.path.join("/tmp", f"coebslam_bench_v3_{N}.npz")


def main():
    import jax
    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.models.detector import YoloDetector
    from coebslam_tpu.slam.system import System

    z = np.load(cache)
    frames = [(z["g"][i], z["d"][i], z["b"][i]) for i in range(N)]
    cfg = SystemConfig()
    det = YoloDetector(cfg.detector, cfg.dynamic)
    sysm = System(cfg)
    sysm.enable_realtime()
    mapper = sysm.mapper
    tracker = sysm.tracker

    det_t = np.zeros(N)
    trk_t = np.zeros(N)
    poll_t = np.zeros(N)
    kf_frames = []

    orig_poll = mapper.poll
    cur = [0]

    def timed_poll(block=False):
        t0 = time.perf_counter()
        orig_poll(block)
        poll_t[cur[0]] += time.perf_counter() - t0
    tracker.on_frame = timed_poll

    orig_kf = tracker.on_keyframe

    def timed_kf(kf_id):
        kf_frames.append(cur[0])
        orig_kf(kf_id)
    tracker.on_keyframe = timed_kf

    for i in range(N):
        cur[0] = i
        g, d, b = frames[i]
        t0 = time.perf_counter()
        det.detect_device(g)
        det_t[i] = time.perf_counter() - t0
        t0 = time.perf_counter()
        sysm.track_rgbd(g, d, stamp=i / 30.0, boxes=b[None])
        trk_t[i] = time.perf_counter() - t0
    sysm.shutdown()

    W = 30
    sl = slice(W, N)
    is_kf = np.zeros(N, bool)
    is_kf[[f for f in kf_frames if f < N]] = True
    print(f"steady frames {W}..{N}: {N-W} frames, {is_kf[sl].sum()} KF frames")
    tot = det_t + trk_t
    for name, arr in (("det dispatch", det_t), ("track_rgbd", trk_t),
                      ("  of which poll", poll_t), ("frame total", tot)):
        a = arr[sl]
        print(f"{name:18s} mean {a.mean()*1e3:7.2f} ms  median "
              f"{np.median(a)*1e3:7.2f}  p90 {np.percentile(a,90)*1e3:7.2f}")
    m = ~is_kf[sl]
    print(f"non-KF frame total  mean {tot[sl][m].mean()*1e3:7.2f} ms")
    if is_kf[sl].any():
        print(f"KF frame total      mean {tot[sl][is_kf[sl]].mean()*1e3:7.2f} ms")
    print("mapper stage totals (ms):",
          {k: round(v) for k, v in sorted(mapper.stage_ms.items())})
    print(f"n_kf={sysm.map.n_kf}")

    # Isolated device latency of the fused step (dispatch->ready).
    import jax.numpy as jnp
    tr = tracker
    g, d, b = frames[0]
    args = (jnp.asarray(g), jnp.asarray(d), jnp.int32(tr.state.budget),
            tr._dev_state, tr._dyn_state,
            jnp.zeros((cfg.dynamic.max_boxes, 4), jnp.float32),
            jnp.uint32(0), *tr._local_dev, tr._device_map(), jnp.float32(1.0))
    out = tr._jit_step_dyn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(tr._jit_step_dyn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"fused dyn step device latency: {np.median(ts)*1e3:.2f} ms")

    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(det._jit_run(jnp.asarray(g)))
        ts.append(time.perf_counter() - t0)
    print(f"detector forward latency: {np.median(ts)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
