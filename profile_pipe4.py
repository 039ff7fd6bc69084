#!/usr/bin/env python
"""Pipelined tracking on a slower 120-frame orbit, u8/u16 input."""
import os, subprocess, sys, tempfile, time
import numpy as np

N = 120
cache = os.path.join(tempfile.gettempdir(), f"coebslam_bench_slow_{N}.npz")
if not os.path.exists(cache):
    helper = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "from coebslam_tpu.config import SystemConfig\n"
        "from coebslam_tpu.utils import synthetic\n"
        "cfg = SystemConfig()\n"
        "planes = synthetic.make_room(seed=0)\n"
        f"poses = synthetic.camera_trajectory({N}, radius=0.35)\n"
        "render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])\n"
        "gs, ds = [], []\n"
        "for p in poses:\n"
        "    g, d = render(p)\n"
        "    gs.append(np.asarray(g)); ds.append(np.asarray(d))\n"
        "g = np.clip(np.stack(gs), 0, 255).astype(np.uint8)\n"
        "d = (np.stack(ds) * cfg.camera.depth_map_factor).astype(np.uint16)\n"
        f"np.savez({cache!r}, g=g, d=d)\n")
    subprocess.run([sys.executable, "-c", helper], check=True, timeout=1800)

def main():
    import jax
    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.slam.local_mapping import LocalMapper
    from coebslam_tpu.slam.tracking import Tracker
    from coebslam_tpu.eval import ate
    from coebslam_tpu.utils import synthetic
    z = np.load(cache)
    cfg = SystemConfig()
    poses = synthetic.camera_trajectory(N, radius=0.35)
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    stamps = np.arange(N) / 30.0

    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe
    tracker.pipelined = True
    mapper.async_mode = True
    tracker.on_frame = mapper.poll
    tracker.mapper_idle_fn = mapper.idle
    per = []
    for i in range(N):
        t0 = time.perf_counter()
        tracker.process_frame(z["g"][i], z["d"][i], stamp=stamps[i])
        per.append(time.perf_counter() - t0)
    tracker.flush()
    per = np.asarray(per[20:])
    est = np.asarray([-R.T @ t for _, R, t in tracker.trajectory])
    res = ate.ate_rmse(stamps, est, stamps, gt)
    kf_frames = (per > 0.2).sum()
    print(f"n_kf={tracker.map.n_kf} ATE={res['rmse']:.4f}")
    print(f"steady mean {per.mean()*1e3:.1f} ms -> {1/per.mean():.1f} fps; "
          f"median {np.median(per)*1e3:.1f} ms; frames>200ms: {kf_frames}/{len(per)}")
    print("mapper stages:", {k: round(v) for k, v in mapper.stage_ms.items()})

main()
