#!/usr/bin/env python
"""Time the fused frame step's components on the real TPU: extraction
front-end vs matching+GN tail, plus the relay dispatch floor."""
import os, sys, tempfile, time
import numpy as np

N = 150
cache = os.path.join(tempfile.gettempdir(), f"coebslam_bench_v2_{N}.npz")


def t(fn, n=8):
    fn()                                 # compile / warm
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
    from coebslam_tpu.ops import matching, extractor
    from coebslam_tpu.slam import frame as frame_mod

    z = np.load(cache)
    g = np.ascontiguousarray(z["g"])
    d = np.ascontiguousarray(z["d"])
    cfg = SystemConfig()

    # Relay floor.
    f = jax.jit(lambda x: x + 1)
    one = jnp.ones(())
    _ = f(one)
    print(f"dispatch floor: {t(lambda: jax.device_get(f(one))):.1f} ms",
          flush=True)

    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe
    for i in range(40):
        tracker.process_frame(g[i], d[i], stamp=i / 30.0)
    tracker.flush()
    print(f"map: n_kf={tracker.map.n_kf}", flush=True)

    gi = g[41]; di = d[41]
    budget = jnp.int32(tracker.state.budget)

    # 1. frontend alone (pyramid+FAST+BRIEF+stereo depth).
    def frontend():
        fd = tracker._jit_frontend(gi, di, budget)
        fd.feats.uv.block_until_ready()
    print(f"frontend(extract) total: {t(frontend):.1f} ms", flush=True)

    # 1b. extraction sub-parts.
    gf = jnp.asarray(gi, jnp.float32)
    ex = jax.jit(lambda x: extractor.extract(x, cfg.orb))
    def ex_only():
        f = ex(gf)
        f.uv.block_until_ready()
    print(f"  extract(orb) only: {t(ex_only):.1f} ms", flush=True)

    # 2. fused step total.
    tracker._ensure_state()
    lids, lval = tracker._refresh_local_map()
    arena = tracker._device_map()
    gate = tracker._gate_scale()
    st = tracker._dev_state
    def step():
        out = tracker._jit_step(gi, di, budget, st, lids, lval, arena, gate)
        out.scalars.vec.block_until_ready()
    print(f"fused step total: {t(step):.1f} ms", flush=True)

    # 3. hamming 1024x4096 alone (the matching core).
    sd1 = jnp.asarray(np.random.randint(0, 2, (1024, 256)).astype(np.float32) * 2 - 1)
    sd2 = jnp.asarray(np.random.randint(0, 2, (4096, 256)).astype(np.float32) * 2 - 1)
    hm = jax.jit(lambda a, b: matching.hamming_matrix(a, b))
    def ham():
        hm(sd1, sd2).block_until_ready()
    print(f"hamming 1024x4096: {t(ham):.1f} ms", flush=True)

    # 4. per-level cost: run extract at smaller budget to see scaling.
    # pose GN alone
    from coebslam_tpu.optim import pose_gn
    from coebslam_tpu.geometry.se3 import SE3
    X = jnp.asarray(np.random.randn(1024, 3) + np.asarray([0, 0, 3.0]),
                    jnp.float32)
    obs = jnp.asarray(np.random.rand(1024, 3) * 400, jnp.float32)
    w = jnp.ones(1024, jnp.float32)
    v = jnp.ones(1024, bool)
    pg = jax.jit(lambda p, X, o, w, v: pose_gn.optimize_pose(
        p, X, o, w, v, cfg.camera, cfg.optimizer))
    pose0 = SE3(jnp.eye(3), jnp.zeros(3))
    def gn():
        r = pg(pose0, X, obs, w, v)
        r.pose.t.block_until_ready()
    print(f"pose GN alone: {t(gn):.1f} ms", flush=True)


main()
