#!/usr/bin/env python
"""Benchmark: end-to-end RGB-D SLAM tracking throughput on one chip.

Renders a synthetic textured room (no dataset dependency) at TUM-like
motion (one slow orbit over 150 frames at 30 Hz input), runs the full
production pipeline — pipelined fused tracking step (extraction, MXU
Hamming matching, robust pose GN, in-graph state chaining) with the
asynchronous mapping stage machine (triangulation, fuse, Schur-complement
local BA) — and reports steady-state frames/s.

Input is fed in real sensor formats (uint8 gray + uint16 depth, the TUM
wire format) so host->device traffic matches production.

Baseline: the reference (COEB-SLAM / ORB-SLAM2) targets real-time tracking
at ~30 frames/s on a desktop CPU (SURVEY §6; upstream ORB-SLAM2 paper
reports ~30 Hz).  vs_baseline = fps / 30.

Prints exactly one JSON line; diagnostics (ATE sanity, mapper stage times,
COEB dynamic-path throughput) go to stderr.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

N_FRAMES = 150
N_WARM = 30


def _render_frames(cache: str) -> None:
    """Pre-render all frames in a CPU-forced child process: the ray-caster
    is test scaffolding (not the benchmarked system), its gather-heavy HLO
    is pathological for the TPU compiler, and the TPU claim is exclusive —
    the child must never initialize the TPU backend."""
    helper = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "from coebslam_tpu.config import SystemConfig\n"
        "from coebslam_tpu.utils import synthetic\n"
        "cfg = SystemConfig()\n"
        "planes = synthetic.make_room(seed=0)\n"
        f"poses = synthetic.camera_trajectory({N_FRAMES}, radius=0.35)\n"
        "render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])\n"
        "gs, ds = [], []\n"
        "for p in poses:\n"
        "    g, d = render(p)\n"
        "    gs.append(np.asarray(g)); ds.append(np.asarray(d))\n"
        "g = np.clip(np.stack(gs), 0, 255).astype(np.uint8)\n"
        "d = (np.stack(ds) * cfg.camera.depth_map_factor).astype(np.uint16)\n"
        f"np.savez({cache!r}, g=g, d=d)\n")
    subprocess.run([sys.executable, "-c", helper], check=True, timeout=1800)


def bench_tracking(frames, cfg):
    """Steady-state fps of the production RGB-D pipeline."""
    from coebslam_tpu.eval import ate
    from coebslam_tpu.slam.local_mapping import LocalMapper
    from coebslam_tpu.slam.tracking import Tracker
    from coebslam_tpu.utils import synthetic

    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe
    tracker.pipelined = True
    mapper.async_mode = True
    tracker.on_frame = mapper.poll
    tracker.mapper_idle_fn = mapper.idle

    for i in range(N_WARM):
        t0 = time.perf_counter()
        tracker.process_frame(frames[i][0], frames[i][1], stamp=i / 30.0)
        dt = time.perf_counter() - t0
        if dt > 1.0:
            print(f"warmup {i}: {dt:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    n_timed = 0
    for i in range(N_WARM, N_FRAMES):
        tracker.process_frame(frames[i][0], frames[i][1], stamp=i / 30.0)
        n_timed += 1
    elapsed = time.perf_counter() - t0
    tracker.flush()
    mapper.flush()
    fps = n_timed / elapsed

    # Accuracy sanity: the fps number is only meaningful if tracking works.
    poses = synthetic.camera_trajectory(N_FRAMES, radius=0.35)
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    est = np.asarray([-R.T @ t for _, R, t in tracker.trajectory])
    stamps = np.arange(N_FRAMES) / 30.0
    res = ate.ate_rmse(stamps[:len(est)], est, stamps, gt)
    print(f"tracking: {fps:.2f} fps over {n_timed} frames; "
          f"ATE {res['rmse']*100:.1f} cm; n_kf={tracker.map.n_kf}; "
          f"mapper stages (ms): "
          + ", ".join(f"{k}={v:.0f}" for k, v in sorted(mapper.stage_ms.items())),
          file=sys.stderr, flush=True)
    return fps, float(res["rmse"]), tracker.map.n_kf


def bench_dynamic(frames, cfg):
    """COEB dynamic-path throughput: YOLOv5s forward (random weights — the
    timing is weight-independent) + LK-flow epipolar motion check + blur
    gate + masked extraction, per frame on the same stream (the reference's
    actual per-frame workload, SURVEY §3.1)."""
    import jax
    import jax.numpy as jnp
    from coebslam_tpu.models.detector import YoloDetector
    from coebslam_tpu.slam import dynamic as dynamic_mod

    det = YoloDetector(cfg.detector, cfg.dynamic)
    jit_dyn = jax.jit(lambda pg, g, b, k: dynamic_mod.dynamic_frontend(
        pg, g, b, k, cfg))
    rng = jax.random.PRNGKey(0)

    def one(prev_g, g):
        boxes = det.detect(g)
        # Fixed-shape pad (as System._pad_boxes): a varying box count must
        # never retrace the jitted front-end.
        padded = np.full((cfg.dynamic.max_boxes, 4), -1.0, np.float32)
        b = np.asarray(boxes, np.float32).reshape(-1, 4)
        n = min(len(b), cfg.dynamic.max_boxes)
        padded[:n] = b[:n]
        dres = jit_dyn(prev_g.astype(jnp.float32), g.astype(jnp.float32),
                       jnp.asarray(padded), rng)
        return dres.mask

    gs = [jax.device_put(f[0]) for f in frames[:24]]
    one(gs[0], gs[1])                      # compile
    t0 = time.perf_counter()
    n = 0
    for i in range(2, 22):
        m = one(gs[i - 1], gs[i])
        n += 1
    m.block_until_ready()
    fps = n / (time.perf_counter() - t0)
    print(f"dynamic front-end (detector+flow+blur): {fps:.2f} fps",
          file=sys.stderr, flush=True)
    return fps


def main():
    from coebslam_tpu.config import SystemConfig

    cfg = SystemConfig()          # full TUM VGA: 640x480, 8 levels, 1000 feat
    cache = os.path.join(tempfile.gettempdir(),
                         f"coebslam_bench_v2_{N_FRAMES}.npz")
    if not os.path.exists(cache):
        _render_frames(cache)
    z = np.load(cache)
    frames = [(z["g"][i], z["d"][i]) for i in range(N_FRAMES)]

    fps, ate_m, n_kf = bench_tracking(frames, cfg)
    try:
        dyn_fps = bench_dynamic(frames, cfg)
    except Exception as e:                      # pragma: no cover
        print(f"dynamic bench failed: {e!r}", file=sys.stderr)
        dyn_fps = None

    print(json.dumps({
        "metric": "rgbd_tracking_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": {
            "ate_m": round(ate_m, 4),
            "n_keyframes": n_kf,
            "coeb_dynamic_frontend_fps": (round(dyn_fps, 2)
                                          if dyn_fps else None),
        },
    }))


if __name__ == "__main__":
    main()
