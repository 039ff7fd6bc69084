#!/usr/bin/env python
"""Benchmark: end-to-end COEB dynamic RGB-D SLAM throughput on one chip.

Headline metric = the configuration users actually run: dynamic filtering
ON.  A synthetic textured room with a person-sized moving quad ("walker")
is tracked at TUM-like motion; every frame runs the full COEB workload —
YOLOv5s detector forward (in-stream device dispatch), the fused per-frame
device program (extraction masked by the sticky dynamic mask, in-graph
epipolar motion check + two-tier box classification + keypoint culling,
MXU Hamming matching, robust pose GN, in-graph state chaining), and the
asynchronous mapping stage machine (triangulation, fuse, Schur local BA).

Input is fed in real sensor formats (uint8 gray + uint16 depth, the TUM
wire format) so host->device traffic matches production.

Baseline: the reference (COEB-SLAM / ORB-SLAM2) targets real-time tracking
at ~30 frames/s on a desktop CPU with the detector in the loop (SURVEY §6).
vs_baseline = fps / 30.

Prints exactly one JSON line; diagnostics (ATE sanity, mapper stage times,
static-scene fps, MFU estimate) go to stderr.
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

# Peak dense throughput of one TPU v5e chip (bf16 MXU), for the MFU
# estimate.  SLAM is not FLOP-dense — the estimate mainly tracks whether
# the hot program keeps the MXU busy at all.
PEAK_FLOPS = 197e12


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
        "import jax.numpy as jnp\n"
        "cfg = SystemConfig()\n"
        "planes = synthetic.make_room(seed=0)\n"
        "walker = synthetic.make_walker(start=(-0.9, -0.2, 1.8),\n"
        "                               velocity=(0.012, 0.004, 0.0),\n"
        "                               half_w=0.3, half_h=0.65)\n"
        f"poses = synthetic.camera_trajectory({N_FRAMES}, radius=0.35)\n"
        "render = jax.jit(lambda p, i: synthetic.render(\n"
        "    cfg.camera, p, planes, walker, i)[:3])\n"
        "gs, ds, bs = [], [], []\n"
        "for i, p in enumerate(poses):\n"
        "    g, d, b = render(p, jnp.asarray(i, jnp.float32))\n"
        "    gs.append(np.asarray(g)); ds.append(np.asarray(d))\n"
        "    bs.append(np.asarray(b))\n"
        "g = np.clip(np.stack(gs), 0, 255).astype(np.uint8)\n"
        "d = (np.stack(ds) * cfg.camera.depth_map_factor).astype(np.uint16)\n"
        "b = np.stack(bs).astype(np.float32)\n"
        f"np.savez({cache!r}, g=g, d=d, b=b)\n")
    subprocess.run([sys.executable, "-c", helper], check=True, timeout=1800)


def _gt_centers(n):
    from coebslam_tpu.utils import synthetic
    poses = synthetic.camera_trajectory(n, radius=0.35)
    return np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])


def bench_dynamic_slam(frames, cfg):
    """Steady-state fps of the production pipeline, dynamic filtering ON."""
    import jax
    from coebslam_tpu.eval import ate
    from coebslam_tpu.models.detector import YoloDetector
    from coebslam_tpu.slam.system import System

    # Random weights: the walker is masked via the ground-truth boxes the
    # renderer provides (standing in for a trained detector's output), but
    # the detector FORWARD still runs in-stream every frame so its device
    # time is paid exactly as in production.
    det = YoloDetector(cfg.detector, cfg.dynamic)
    sysm = System(cfg)
    sysm.enable_realtime()

    def step(i):
        g, d, b = frames[i]
        det.detect_device(g)                    # in-stream, never fetched
        sysm.track_rgbd(g, d, stamp=i / 30.0, boxes=b[None])

    for i in range(N_WARM):
        t0 = time.perf_counter()
        step(i)
        dt = time.perf_counter() - t0
        if dt > 1.0:
            print(f"warmup {i}: {dt:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for i in range(N_WARM, N_FRAMES):
        step(i)
    elapsed = time.perf_counter() - t0
    sysm.shutdown()
    fps = (N_FRAMES - N_WARM) / elapsed

    gt = _gt_centers(N_FRAMES)
    est = np.asarray([-R.T @ t for _, R, t in sysm.tracker.trajectory])
    stamps = np.arange(N_FRAMES) / 30.0
    res = ate.ate_rmse(stamps[:len(est)], est, stamps, gt)
    mapper = sysm.mapper
    print(f"dynamic SLAM: {fps:.2f} fps over {N_FRAMES - N_WARM} frames; "
          f"ATE {res['rmse']*100:.1f} cm; n_kf={sysm.map.n_kf}; "
          f"mapper stages (ms): "
          + ", ".join(f"{k}={v:.0f}" for k, v in sorted(mapper.stage_ms.items())),
          file=sys.stderr, flush=True)

    mfu = _mfu_estimate(sysm, frames, fps)
    return fps, float(res["rmse"]), sysm.map.n_kf, mfu


def _mfu_estimate(sysm, frames, fps):
    """FLOPs of the fused per-frame program (XLA cost model) x achieved
    frame rate / chip peak."""
    try:
        import jax
        import jax.numpy as jnp
        tr = sysm.tracker
        g, d, b = frames[0]
        lowered = tr._jit_step_dyn.lower(
            jnp.asarray(g), jnp.asarray(d), jnp.int32(tr.state.budget),
            tr._dev_state, tr._dyn_state,
            jnp.zeros((sysm.cfg.dynamic.max_boxes, 4), jnp.float32),
            jnp.uint32(0), *tr._local_dev, tr._device_map(),
            jnp.float32(1.0))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        mfu = flops * fps / PEAK_FLOPS
        print(f"fused step: {flops/1e9:.2f} GFLOP -> "
              f"MFU estimate {mfu*100:.3f}% of bf16 peak",
              file=sys.stderr, flush=True)
        return mfu
    except Exception as e:                      # pragma: no cover
        print(f"MFU estimate failed: {e!r}", file=sys.stderr)
        return None


def bench_static(frames, cfg):
    """Static-path fps (dynamic filtering off) — secondary diagnostic."""
    from coebslam_tpu.slam.local_mapping import LocalMapper
    from coebslam_tpu.slam.tracking import Tracker

    cfg = cfg.replace(use_dynamic_filtering=False)
    tracker = Tracker(cfg)
    mapper = LocalMapper(cfg, tracker.map)
    tracker.on_keyframe = mapper.process_keyframe
    tracker.pipelined = True
    mapper.async_mode = True
    tracker.on_frame = mapper.poll
    tracker.mapper_idle_fn = mapper.idle

    for i in range(N_WARM):
        tracker.process_frame(frames[i][0], frames[i][1], stamp=i / 30.0)
    t0 = time.perf_counter()
    for i in range(N_WARM, N_FRAMES):
        tracker.process_frame(frames[i][0], frames[i][1], stamp=i / 30.0)
    elapsed = time.perf_counter() - t0
    tracker.flush()
    mapper.flush()
    fps = (N_FRAMES - N_WARM) / elapsed
    print(f"static path (filtering off): {fps:.2f} fps",
          file=sys.stderr, flush=True)
    return fps


def main():
    from coebslam_tpu.config import SystemConfig

    t_start = time.perf_counter()
    cfg = SystemConfig()          # full TUM VGA, dynamic filtering ON
    cache = os.path.join(tempfile.gettempdir(),
                         f"coebslam_bench_v3_{N_FRAMES}.npz")
    if not os.path.exists(cache):
        _render_frames(cache)
    z = np.load(cache)
    frames = [(z["g"][i], z["d"][i], z["b"][i]) for i in range(N_FRAMES)]

    fps, ate_m, n_kf, mfu = bench_dynamic_slam(frames, cfg)
    try:
        static_fps = bench_static(frames, cfg)
    except Exception as e:                      # pragma: no cover
        print(f"static bench failed: {e!r}", file=sys.stderr)
        static_fps = None

    print(json.dumps({
        "metric": "coeb_dynamic_rgbd_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": {
            "ate_m": round(ate_m, 4),
            "n_keyframes": n_kf,
            "static_path_fps": (round(static_fps, 2) if static_fps else None),
            "mfu_estimate": (round(mfu, 5) if mfu else None),
            "total_wall_s": round(time.perf_counter() - t_start, 1),
        },
    }))


if __name__ == "__main__":
    main()
