#!/usr/bin/env python
"""Per-frame breakdown profiler: tracking-step time vs mapper-poll time,
KF vs non-KF frames, per-stage steady-state cost (compiles excluded)."""
import os, subprocess, sys, tempfile, time
import numpy as np

N = 150
cache = os.path.join(tempfile.gettempdir(), f"coebslam_bench_v2_{N}.npz")
if not os.path.exists(cache):
    subprocess.run([sys.executable, "bench.py"], timeout=120)  # render only


def main():
    import jax
    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.slam.local_mapping import LocalMapper
    from coebslam_tpu.slam.tracking import Tracker

    z = np.load(cache)
    cfg = SystemConfig()
    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe
    tracker.pipelined = True
    mapper.async_mode = True
    poll_t = [0.0]

    def timed_poll():
        t0 = time.perf_counter()
        mapper.poll()
        poll_t[0] += time.perf_counter() - t0

    tracker.on_frame = timed_poll
    tracker.mapper_idle_fn = mapper.idle

    per, polls, kf_flags, stage_snap = [], [], [], []
    prev_stage = {}
    for i in range(N):
        poll_t[0] = 0.0
        n_kf0 = tracker.map.n_kf
        s0 = dict(mapper.stage_ms)
        t0 = time.perf_counter()
        tracker.process_frame(z["g"][i], z["d"][i], stamp=i / 30.0)
        dt = time.perf_counter() - t0
        per.append(dt)
        polls.append(poll_t[0])
        kf_flags.append(tracker.map.n_kf > n_kf0)
        stage_snap.append({k: mapper.stage_ms.get(k, 0) - s0.get(k, 0)
                           for k in mapper.stage_ms})
    tracker.flush()

    per = np.asarray(per); polls = np.asarray(polls)
    kf_flags = np.asarray(kf_flags)
    sl = slice(40, N)   # steady state
    p, q, kfm = per[sl], polls[sl], kf_flags[sl]
    print(f"steady frames {sl.start}..{N}: mean {p.mean()*1e3:.1f} ms "
          f"({1/p.mean():.1f} fps), median {np.median(p)*1e3:.1f} ms")
    print(f"  track-only (total - poll): mean {(p-q).mean()*1e3:.1f} ms, "
          f"median {np.median(p-q)*1e3:.1f} ms")
    print(f"  mapper poll: mean {q.mean()*1e3:.1f} ms, "
          f"median {np.median(q)*1e3:.1f} ms, max {q.max()*1e3:.1f} ms")
    print(f"  KF frames: {kfm.sum()}/{len(p)}; "
          f"mean on KF frames {p[kfm].mean()*1e3 if kfm.any() else 0:.1f} ms; "
          f"non-KF {p[~kfm].mean()*1e3:.1f} ms")
    # Steady-state per-stage cost: sum over steady frames / occurrences.
    agg = {}
    for s in stage_snap[sl.start:]:
        for k, v in s.items():
            if v > 0.01:
                agg.setdefault(k, []).append(v)
    for k, vals in sorted(agg.items()):
        print(f"  stage {k}: n={len(vals)} mean={np.mean(vals):.1f} ms "
              f"max={np.max(vals):.1f} ms total={np.sum(vals):.0f} ms")
    # Percentiles of frame time
    for pc in (50, 75, 90, 99):
        print(f"  p{pc}: {np.percentile(p, pc)*1e3:.1f} ms")


main()
