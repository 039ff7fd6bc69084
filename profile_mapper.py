#!/usr/bin/env python
"""Micro-profile the mapper stage programs: device time vs transfer RTT vs
map_device.sync upload cost, measured on a live map built by tracking."""
import os, sys, tempfile, time
import numpy as np

N = 150
cache = os.path.join(tempfile.gettempdir(), f"coebslam_bench_v2_{N}.npz")


def t(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return 1e3 * np.median(ts)


def main():
    import jax
    import jax.numpy as jnp
    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.slam.local_mapping import LocalMapper
    from coebslam_tpu.slam.tracking import Tracker
    from coebslam_tpu.slam import map_device

    z = np.load(cache)
    g = np.ascontiguousarray(z["g"])     # materialize once
    d = np.ascontiguousarray(z["d"])
    cfg = SystemConfig()
    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe
    tracker.pipelined = True
    mapper.async_mode = True
    tracker.on_frame = mapper.poll
    tracker.mapper_idle_fn = mapper.idle

    # RTT of a trivial round trip.
    one = jnp.ones(())
    print(f"tiny device_get RTT: {t(lambda: jax.device_get(one)):.1f} ms",
          flush=True)
    big = jnp.ones((1000, 256))
    print(f"1MB device_get: {t(lambda: jax.device_get(big)):.1f} ms",
          flush=True)
    f = jax.jit(lambda x: x + 1)
    _ = f(one)
    print(f"tiny dispatch+get: {t(lambda: jax.device_get(f(one))):.1f} ms",
          flush=True)

    for i in range(70):
        tracker.process_frame(g[i], d[i], stamp=i / 30.0)
    tracker.flush(); mapper.flush()
    kf = int(np.nonzero(tracker.map.kf_valid)[0][-1])
    m = tracker.map
    print(f"map: n_kf={m.n_kf}, pts={len(m.valid_points())}", flush=True)

    # Per-frame tracking step alone (no mapper interference).
    mapper.async_mode = False
    tracker.on_keyframe = lambda k: None
    tracker.on_frame = None
    ts = []
    for i in range(70, 120):
        t0 = time.perf_counter()
        tracker.process_frame(g[i], d[i], stamp=i / 30.0)
        ts.append(time.perf_counter() - t0)
    tracker.flush()
    ts = np.asarray(ts[5:])
    print(f"track-only per frame: mean {ts.mean()*1e3:.1f} ms, "
          f"median {np.median(ts)*1e3:.1f} ms", flush=True)

    # Stage timing: dispatch (host) + device wait + writeback, separated.
    def stage(name, dispatch, writeback):
        # warm (compiled already from the run above)
        td0 = time.perf_counter()
        p = dispatch(kf)
        td = time.perf_counter() - td0
        if p is None:
            print(f"{name}: skipped (no work)")
            return
        leaves = [x for x in jax.tree_util.tree_leaves(p)
                  if hasattr(x, 'block_until_ready')]
        tw0 = time.perf_counter()
        for x in leaves:
            x.block_until_ready()
        tw = time.perf_counter() - tw0
        tg0 = time.perf_counter()
        writeback(kf, p)
        tg = time.perf_counter() - tg0
        print(f"{name}: dispatch {td*1e3:.1f} ms, device-wait {tw*1e3:.1f} ms,"
              f" writeback(incl get) {tg*1e3:.1f} ms", flush=True)

    # sync cost when clean vs after dirtying one KF row
    dm = map_device.sync(m, cfg)
    print(f"sync clean: {t(lambda: map_device.sync(m, cfg)):.2f} ms",
          flush=True)
    def dirty_sync():
        m._dirty_kf[kf] = True
        map_device.sync(m, cfg)
    print(f"sync 1 dirty KF: {t(dirty_sync):.1f} ms", flush=True)
    def dirty_pts_sync():
        m._dirty_pt[np.nonzero(m.pt_valid)[0][:500]] = True
        map_device.sync(m, cfg)
    print(f"sync 500 dirty pts: {t(dirty_pts_sync):.1f} ms", flush=True)

    for nm, disp, wb in [
            ("triangulate", mapper._tri_dispatch, mapper._tri_writeback),
            ("fuse", mapper._fuse_dispatch, mapper._fuse_writeback),
            ("local_ba", mapper._ba_dispatch, mapper._ba_writeback)]:
        stage(nm, disp, wb)
        stage(nm + " (again)", disp, wb)


main()
