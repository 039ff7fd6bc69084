#!/usr/bin/env python
"""Device-time breakdown of the realtime per-frame program + a committed
jax.profiler trace (SURVEY §5.1 rebuild note; VERDICT r3 #8).

Round 3's MFU figure was XLA-cost-model FLOPs x fps — not a measured
profile.  This runs on the real chip and reports where a frame's device
time actually goes, by timing jitted sub-programs on the same inputs the
fused step consumes (block_until_ready protocol, NO readbacks before the
timed section — docs/TPU_BACKEND_NOTES.md):

  frontend      pyramid + FAST(+Pallas) + top-k + BRIEF + depth assoc
  dynamic       descriptor-flow F-RANSAC + box classify + cull
  tracking      4-stage match/solve scan (fused_step) incl. Hamming MXU
  windowed BA   the keyframe-branch LocalBundleAdjustment
  rt_step       the whole fused program (median = non-KF frame,
                p95/max ~ KF frame with BA)
  maintenance   BoW + detect (no-event dispatch)

A jax.profiler trace of ~40 steady-state steps is saved under
artifacts/trace_rt/ for offline inspection (tensorboard or xprof).

Usage:  python tools/profile_trace.py [--frames 60] [--no-trace]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=20, warm=3):
    import jax
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.ops import brief, matching as matching_ops
    from coebslam_tpu.slam import dynamic as dynamic_mod
    from coebslam_tpu.slam import frame as frame_mod
    from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits, rt_step
    from coebslam_tpu.slam.tracking import fused_step

    print("backend:", jax.default_backend(), file=sys.stderr)
    cfg = SystemConfig()
    lim = RTLimits()
    cache = "/tmp/coebslam_bench_v3_150.npz"
    if not os.path.exists(cache):
        import bench
        bench._render_frames(cache)
    z = np.load(cache)
    G, D, B = z["g"], z["d"], z["b"]

    rt = RealtimeSlam(cfg, lim)
    for i in range(args.frames):
        rt.track(G[i], D[i], stamp=i / 30.0, boxes=B[i][None])
    rt.block()
    st = rt.state

    g = jnp.asarray(G[40])
    d = jnp.asarray(D[40]).astype(jnp.float32) / cfg.camera.depth_map_factor
    boxes = jnp.asarray(
        np.pad(B[40][None], ((0, cfg.dynamic.max_boxes - 1), (0, 0)),
               constant_values=-1.0))

    rows = {}

    # ---- frontend
    fe = jax.jit(lambda g, d, n: frame_mod.process_rgbd(
        g, d, cfg.camera, cfg.orb, n_features=n))
    rows["frontend"] = timed(fe, g, d, st.budget)
    fd = fe(g, d, st.budget)

    # ---- dynamic front-end
    dyn = jax.jit(lambda fd, g, ds, b, k: dynamic_mod.dynamic_step(
        fd, g, ds, b, k, cfg))
    key = jax.random.PRNGKey(0)
    rows["dynamic"] = timed(dyn, fd, g, st.dyn, boxes, key)

    # ---- tracking stages (fused_step) on the live state/arena
    S = lim.spawn_per_kf
    L = (lim.local_window + lim.reuse_chunks) * S
    k_new = jnp.maximum(st.n_kf - 1, 0)
    lstart = jnp.maximum((k_new - lim.local_window + 1), 0) * S
    local_ids = (lstart + jnp.arange(L)) % (lim.max_kf * S)
    local_valid = (lstart + jnp.arange(L)) < st.n_kf * S

    def track_only(fd, track, ids, idv, pt_desc):
        sd = brief.to_signed(brief.unpack_bits(pt_desc))
        arena = (st.pt_pos, sd, st.pt_valid, st.pt_angle, st.pt_normal,
                 st.pt_mind, st.pt_maxd)
        return fused_step(fd, track, ids, idv, arena,
                          jnp.float32(1.0), cfg)

    tr = jax.jit(track_only)
    track_in = st.track._replace(pids=jnp.where(
        st.track.pids >= 0, st.track.pids % (lim.max_kf * S), -1))
    rows["tracking(4-stage)"] = timed(tr, fd, track_in, local_ids,
                                      local_valid, st.pt_desc)

    # ---- Hamming matmul alone (the MXU core of one stage)
    sd_f = fd.feats.signed_desc()
    sd_a = brief.to_signed(brief.unpack_bits(st.pt_desc[local_ids]))
    ham = jax.jit(matching_ops.hamming_matrix)
    rows["hamming[2048xL]"] = timed(ham, sd_f, sd_a)

    # ---- windowed BA (the KF branch)
    from coebslam_tpu.slam.realtime import _windowed_ba
    ba = jax.jit(lambda s: _windowed_ba(s, cfg, lim))
    rows["windowed BA"] = timed(ba, st, n=10)

    # ---- full step.  NOTE: a block-per-dispatch loop measures relay
    # round-trip + (in a many-program client like this one) executable
    # re-shipping, NOT device time — measured 109 ms/step serialized vs
    # 1.3 ms/frame pipelined in a clean client.  Report both.
    full = jax.jit(lambda g, d, b, s, stt: rt_step(g, d, b, s, stt, cfg,
                                                   lim))
    ts = []
    cur = st
    for k in range(40):
        t0 = time.perf_counter()
        cur = full(g, d, boxes, jnp.uint32(1000 + k), cur)
        jax.block_until_ready(cur.frame_idx)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.asarray(ts[3:])
    rows["rt_step serialized (dispatch+relay)"] = float(np.median(ts))
    cur = st
    for k in range(8):                       # fill the pipe
        cur = full(g, d, boxes, jnp.uint32(3000 + k), cur)
    jax.block_until_ready(cur.frame_idx)
    t0 = time.perf_counter()
    for k in range(64):
        cur = full(g, d, boxes, jnp.uint32(3100 + k), cur)
        if k % 8 == 7:
            jax.block_until_ready(cur.frame_idx)
    jax.block_until_ready(cur.frame_idx)
    rows["rt_step pipelined"] = (time.perf_counter() - t0) / 64 * 1e3

    print("\ndevice-time breakdown (ms):", file=sys.stderr)
    for k, v in rows.items():
        print(f"  {k:20s} {v:8.3f}", file=sys.stderr)

    if not args.no_trace:
        # Full traces are ~100 MB — written to /tmp; the committed
        # artifact is the op-level digest (artifacts/trace_rt_summary.md).
        out = "/tmp/coebslam_trace_rt"
        os.makedirs(out, exist_ok=True)
        with jax.profiler.trace(out):
            cur2 = st
            for k in range(40):
                cur2 = full(g, d, boxes, jnp.uint32(2000 + k), cur2)
            jax.block_until_ready(cur2.frame_idx)
        print(f"trace saved to {out}", file=sys.stderr)

    import json
    print(json.dumps({k: round(v, 3) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
