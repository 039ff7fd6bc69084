#!/usr/bin/env python
"""Phase-level timing inside the pipelined tracking loop on the TPU."""
import os, sys, tempfile, time
import numpy as np

N = 150
cache = os.path.join(tempfile.gettempdir(), f"coebslam_bench_v2_{N}.npz")


def main():
    import jax
    import jax.numpy as jnp
    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.slam.tracking import Tracker

    z = np.load(cache)
    g = np.ascontiguousarray(z["g"])
    d = np.ascontiguousarray(z["d"])
    cfg = SystemConfig()
    tracker = Tracker(cfg)
    tracker.pipelined = True

    # Instrument: wrap _dispatch and _finalize with timers.
    times = {"dispatch": [], "finalize": [], "upload": [], "total": []}
    orig_dispatch = tracker._dispatch
    orig_finalize = tracker._finalize

    def timed_dispatch(*a, **k):
        t0 = time.perf_counter()
        r = orig_dispatch(*a, **k)
        times["dispatch"].append(time.perf_counter() - t0)
        return r

    def timed_finalize(ctx):
        t0 = time.perf_counter()
        r = orig_finalize(ctx)
        times["finalize"].append(time.perf_counter() - t0)
        return r

    tracker._dispatch = timed_dispatch
    tracker._finalize = timed_finalize

    for i in range(120):
        t0 = time.perf_counter()
        gi = jax.device_put(g[i])
        di = jax.device_put(d[i])
        jax.block_until_ready((gi, di))
        times["upload"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        tracker.process_frame(gi, di, stamp=i / 30.0)
        times["total"].append(time.perf_counter() - t0)
    tracker.flush()

    for k in ("upload", "dispatch", "finalize", "total"):
        v = np.asarray(times[k][40:]) * 1e3
        print(f"{k:9s}: mean {v.mean():6.1f} ms  median {np.median(v):6.1f}"
              f"  p90 {np.percentile(v, 90):6.1f}", flush=True)


main()
