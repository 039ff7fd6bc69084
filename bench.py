#!/usr/bin/env python
"""Benchmark: end-to-end COEB dynamic RGB-D SLAM throughput on one chip.

Headline = the zero-sync realtime pipeline (slam/realtime.py): the full
COEB workload — ORB extraction masked by the sticky dynamic mask,
in-graph epipolar motion check + two-tier box classification + keypoint
culling, MXU Hamming matching, robust pose GN, in-graph keyframe policy
+ creation + RGB-D point spawning, windowed local BA — as ONE device
program per frame, PLUS the in-graph maintenance program (BoW loop
closing + relocalization, slam/maintenance.py) dispatched every few
frames, still with zero device->host readbacks.  The YOLOv5s detector
forward runs continuously in a SIBLING process sharing the chip (the
reference's process topology, yolo_v5.py over ROS), so its device time
contends with SLAM exactly as in production; the boxes the SLAM side
consumes are the renderer's ground-truth walker boxes, standing in for
the detection stream (see _spawn_detector_process / bench_realtime
docstrings).  The host loop uploads sensor frames and dispatches;
nothing reads back until the run ends.

Scenes:
  * synthetic textured room + person-sized moving walker at TUM-like
    motion (throughput headline; real sensor formats: uint8 gray +
    uint16 depth, the TUM wire format);
  * the 400-frame TUM-wire-format fr3_walking replica
    (tools/make_tum_replica.py: walker + motion-blur windows + camera
    shake) — the dataset-scale ATE the reference's evaluate_ate.py
    validation measures (evaluate_ate.py:190; in-tree scores
    Frame.cc:174-177, ~0.34 m walking_rpy class).

Secondary: the host-orchestrated System pipeline (covisibility mapper +
loops/reloc-capable production path) on the same frames, with the BoW
vocabulary attached.

Baseline: the reference (COEB-SLAM / ORB-SLAM2) targets real-time
tracking at ~30 frames/s on a desktop CPU with the detector in the loop
(SURVEY §6).  vs_baseline = fps / 30.

Prints exactly one JSON line; diagnostics go to stderr.
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
DETECT_HZ = 3.0      # detector-process rate (reference: CPU YOLOv5s over
                     # ROS reaches a few Hz; ApproximateTime tolerates it)
REPLICA_FRAMES = 400
CLOSURE_FRAMES = 300        # revisiting (out-and-back) replica variant
REPLICA_HOST_FRAMES = 60    # host pipeline replays a short prefix
                            # (it pays ~0.5 s/frame of relay tax — see
                            # docs/TPU_BACKEND_NOTES.md §11 — and the
                            # driver's bench budget is ~10 min total)

# Peak dense throughput of one TPU v5e chip (bf16 MXU), for the MFU
# estimate.  SLAM is not FLOP-dense — the estimate mainly tracks whether
# the hot program keeps the MXU busy at all.
PEAK_FLOPS = 197e12

ROOT = os.path.dirname(os.path.abspath(__file__))
VOCAB_PATH = os.path.join(ROOT, "artifacts", "vocab_1e5.npz")
DET_PATH = os.path.join(ROOT, "artifacts", "detector_walker.npz")


def _render_frames(cache: str) -> None:
    """Pre-render all frames in a CPU-forced child process: the ray-caster
    is test scaffolding (not the benchmarked system), its gather-heavy HLO
    is pathological for the TPU compiler, and the TPU claim is exclusive —
    the child must never initialize the TPU backend."""
    helper = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, sys\n"
        f"sys.path.insert(0, {ROOT!r})\n"
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


def _ensure_replica(root: str, n_frames: int = REPLICA_FRAMES,
                    closure: bool = False) -> None:
    """Render the TUM-format replica in a CPU child (same rationale)."""
    if os.path.exists(os.path.join(root, "groundtruth.txt")):
        return
    helper = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        f"import sys; sys.path.insert(0, {ROOT!r})\n"
        "from coebslam_tpu.utils import replica\n"
        f"replica.generate({root!r}, n_frames={n_frames}, seed=0, "
        f"closure={closure})\n")
    subprocess.run([sys.executable, "-c", helper], check=True, timeout=1800)


def _render_circuit(cache: str) -> None:
    """Loop-circuit frames (tests/test_loop_e2e scene) in a CPU child."""
    helper = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        f"import sys; sys.path.insert(0, {ROOT!r})\n"
        f"sys.path.insert(0, {os.path.join(ROOT, 'tests')!r})\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from test_loop_e2e import (N_CIRCUIT, N_OVERLAP, circuit_poses,\n"
        "                           six_wall_room)\n"
        "from test_realtime_loop import rt_config\n"
        "from coebslam_tpu.utils import synthetic\n"
        "cfg = rt_config()\n"
        "planes = six_wall_room()\n"
        "poses = circuit_poses(N_CIRCUIT + N_OVERLAP)\n"
        "render = jax.jit(lambda p: synthetic.render(\n"
        "    cfg.camera, p, planes)[:2])\n"
        "gs, ds = [], []\n"
        "for p in poses:\n"
        "    g, d = render(p)\n"
        "    gs.append(np.asarray(g)); ds.append(np.asarray(d))\n"
        "c = np.stack([np.asarray(\n"
        "    -np.asarray(p.R).T @ np.asarray(p.t)) for p in poses])\n"
        f"np.savez({cache!r}, g=np.stack(gs), d=np.stack(ds), c=c)\n")
    subprocess.run([sys.executable, "-c", helper], check=True, timeout=1800)


def run_loop_event(cfg, voc):
    """On-chip loop-closure measurement (the reference's LoopClosing
    thread latency, LoopClosing.cc:58-777): drive the drifted circuit
    scene through the realtime mode with per-dispatch block-timed
    maintenance.  The dispatch that applies the closure (BoW detect +
    3D RANSAC + Sim3 pose graph + point remap, one program) is the MAX
    timed dispatch.  NO readback here; scoring in main."""
    import jax
    from coebslam_tpu.config import (CameraConfig, OrbConfig, SystemConfig,
                                     TrackingConfig)
    from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits

    cache = os.path.join(tempfile.gettempdir(), "coebslam_circuit_v1.npz")
    if not os.path.exists(cache):
        _render_circuit(cache)
    z = np.load(cache)
    G, D, C = z["g"], z["d"], z["c"]

    ccfg = SystemConfig(
        camera=CameraConfig(),
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        tracking=TrackingConfig(max_frames_between_kf=4,
                                max_translation_per_frame=0.5),
        use_dynamic_filtering=False)
    lim = RTLimits(max_kf=64, spawn_per_kf=256, ba_window=6,
                   local_window=6, max_frames=256)
    rt = RealtimeSlam(ccfg, lim, vocabulary=voc, maintain_every=1)
    times = []
    orig = rt.maint.step

    def timed(st, ms, seed):
        t0 = time.perf_counter()
        out = orig(st, ms, seed)
        jax.block_until_ready(out[1].bow_next)
        times.append((time.perf_counter() - t0) * 1e3)
        return out

    rt.maint.step = timed
    for i in range(len(G)):
        rt.track(G[i], D[i] * 1.06, stamp=i / 30.0)   # depth-bias drift
    rt.block()
    return rt, times, C


def score_loop_event(rt, times, C):
    from coebslam_tpu.eval import ate
    res = rt.finish()
    est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
    n = len(est)
    r = ate.ate_rmse(res["stamps"], est, np.arange(len(C)) / 30.0, C)
    steady = times[3:] or times
    out = {
        "loop_scene_loops_closed": res.get("n_loops_closed"),
        "loop_scene_events": res.get("n_loop_events"),
        "loop_scene_ate_m": round(float(r["rmse"]), 4),
        "loop_closure_dispatch_ms": round(float(np.max(steady)), 1),
        "loop_maint_ms_median": round(float(np.median(steady)), 2),
    }
    try:
        from coebslam_tpu.config import (CameraConfig, OrbConfig,
                                         SystemConfig, TrackingConfig)
        from coebslam_tpu.slam import handoff
        ccfg = SystemConfig(
            camera=CameraConfig(),
            orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
            tracking=TrackingConfig(max_frames_between_kf=4,
                                    max_translation_per_frame=0.5),
            use_dynamic_filtering=False)
        m, kf_ids, _ = handoff.refine(res, ccfg)
        traj2 = handoff.refined_trajectory(res, m, kf_ids)
        est2 = np.asarray([-P[:, :3].T @ P[:, 3] for P in traj2])
        r2 = ate.ate_rmse(res["stamps"], est2, np.arange(len(C)) / 30.0, C)
        out["loop_scene_refined_ate_m"] = round(float(r2["rmse"]), 4)
    except Exception as e:                      # pragma: no cover
        print(f"loop refine scoring failed: {e!r}", file=sys.stderr)
    print(f"loop scene: {out['loop_scene_loops_closed']} closed "
          f"({out['loop_scene_events']} candidates), ATE "
          f"{out['loop_scene_ate_m']*100:.2f} cm, closure dispatch "
          f"{out['loop_closure_dispatch_ms']} ms "
          f"(no-event median {out['loop_maint_ms_median']} ms)",
          file=sys.stderr, flush=True)
    return out


def _load_vocab():
    from coebslam_tpu.slam import vocabulary as voc_mod
    if os.path.exists(VOCAB_PATH):
        return voc_mod.load(VOCAB_PATH)
    print(f"WARNING: {VOCAB_PATH} missing — maintenance/loops disabled",
          file=sys.stderr)
    return None


def _gt_centers(n):
    """Ground-truth centres of the first n replayed frames (the closed
    orbit tiles past N_FRAMES — a two-pass replay revisits it exactly).

    The orbit is parameterized by the TOTAL frame count
    (camera_trajectory(N) puts frame i at angle 2*pi*i/N), so the poses
    must always be generated at N_FRAMES and sliced/tiled — generating
    at n yields a DIFFERENT trajectory for the same frame indices.
    Round-3's 20.6 cm "host-pipeline ATE" was exactly this scoring
    artifact: the host bench replayed 90 frames and was scored against
    camera_trajectory(90); the true figure was ~0.4 cm."""
    from coebslam_tpu.utils import synthetic
    poses = synthetic.camera_trajectory(N_FRAMES, radius=0.35)
    c = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    # Pin the tiling assumption: the orbit must actually CLOSE (frame
    # N_FRAMES ≡ frame 0), or the second replay pass is scored against
    # the wrong ground truth.  The wrap step |c[0]-c[-1]| must look like
    # one more orbit step; a non-periodic trajectory (forward != 0, or a
    # reparameterized generator) fails loudly here instead of silently
    # repeating the round-3 scoring bug.
    step = np.linalg.norm(np.diff(c, axis=0), axis=1)
    wrap = np.linalg.norm(c[0] - c[-1])
    assert wrap <= 3.0 * np.median(step) + 1e-6, (
        f"camera_trajectory no longer closes: wrap step {wrap:.4f} vs "
        f"median step {np.median(step):.4f} — tiled ground truth invalid")
    reps = (n + N_FRAMES - 1) // N_FRAMES
    return np.tile(c, (reps, 1))[:n]


def _score(stamps, R, t, n):
    from coebslam_tpu.eval import ate
    gt = _gt_centers(n)
    est = np.asarray([-Ri.T @ ti for Ri, ti in zip(R, t)])
    gstamps = np.arange(n) / 30.0
    return ate.ate_rmse(np.asarray(stamps), est, gstamps, gt)


def _spawn_detector_process(cache: str):
    """YOLOv5s in a SEPARATE process sharing the chip — the reference's
    topology exactly (its detector is a separate ROS process,
    yolo_v5.py; ApproximateTime sync tolerates the stale boxes).  A
    second PJRT client keeps its own executable retention, so the 87 MB
    detector program cannot evict the SLAM program (in-process it does —
    docs/TPU_BACKEND_NOTES.md §2).  Its device time IS paid: both
    clients contend for the same chip."""
    code = (
        "import sys, time\n"
        f"sys.path.insert(0, {ROOT!r})\n"
        "import numpy as np, jax\n"
        "from coebslam_tpu.config import SystemConfig\n"
        "from coebslam_tpu.models.detector import YoloDetector\n"
        "cfg = SystemConfig()\n"
        f"G = np.load({cache!r})['g']\n"
        "det = YoloDetector(cfg.detector, cfg.dynamic)\n"
        "out = det._jit_run(jax.numpy.asarray(G[0]))\n"
        "jax.block_until_ready(out)\n"
        "print('det ready', flush=True)\n"
        "i = 0\n"
        "while True:\n"
        "    out = det._jit_run(jax.numpy.asarray(G[i % len(G)]))\n"
        "    jax.block_until_ready(out)\n"
        "    i += 1\n"
        f"    time.sleep(1.0 / {DETECT_HZ})\n")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    line = proc.stdout.readline()
    if "det ready" not in line:
        proc.kill()
        raise RuntimeError(f"detector process failed: {line!r}")
    return proc


def run_realtime(G, D, B, cfg, voc):
    """Zero-sync realtime run on the synthetic scene — NO readback here
    (finish()/scoring happen in main AFTER every realtime run, because
    the first readback permanently degrades the client,
    docs/TPU_BACKEND_NOTES.md §1).  Detector live in a sibling process.

    Random detector weights: the walker is masked via the ground-truth
    boxes the renderer provides (standing in for the trained detector's
    output stream), but the detector FORWARD runs continuously on the
    same chip so its device time is paid exactly as in production."""
    from coebslam_tpu.slam.realtime import RealtimeSlam

    rt = RealtimeSlam(cfg, vocabulary=voc, maintain_every=8)

    # Warm pass: the full sequence once (compiles + relay pipeline warm;
    # the first ~100 dispatches through a fresh client run ~2x slower
    # than steady state — measured 460-530 vs 1000 fps).  The orbit is
    # closed, so pass 2 continues the SAME trajectory and ATE is scored
    # over both passes against the tiled ground truth.
    for i in range(N_FRAMES):
        t0 = time.perf_counter()
        rt.track(G[i], D[i], stamp=i / 30.0, boxes=B[i][None])
        dt = time.perf_counter() - t0
        if dt > 1.0:
            print(f"warmup {i}: {dt:.1f}s", file=sys.stderr, flush=True)
    rt.block()
    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        rt.track(G[i], D[i], stamp=(N_FRAMES + i) / 30.0, boxes=B[i][None])
    rt.block()
    fps = N_FRAMES / (time.perf_counter() - t0)

    # Maintenance-dispatch cost (no-event steady state), timed AFTER the
    # fps window so timing never perturbs it (block is not a readback).
    maint_ms = None
    if rt.maint is not None:
        import jax
        ts = []
        for k in range(3):
            t0 = time.perf_counter()
            rt.state, rt.mstate = rt.maint.step(rt.state, rt.mstate,
                                                np.uint32(10_000 + k))
            jax.block_until_ready(rt.mstate.bow_next)
            ts.append((time.perf_counter() - t0) * 1e3)
        maint_ms = float(np.median(ts))
        print(f"maintenance dispatch (no event): {maint_ms:.1f} ms",
              file=sys.stderr, flush=True)
    return rt, fps, maint_ms


def _own_detector(cfg):
    """The synthetic-trained reduced-width YOLOv5 (tools/train_detector.py
    checkpoint) — None when the artifact is absent."""
    if not os.path.exists(DET_PATH):
        return None, None
    from coebslam_tpu.config import DetectorConfig
    from coebslam_tpu.models.detector import YoloDetector, load_variables_npz
    vars_, meta = load_variables_npz(DET_PATH)
    width = float(meta.get("width", 0.125))
    dcfg = DetectorConfig(width_multiple=width, num_classes=1,
                          input_size=320, conf_threshold=0.4)
    return YoloDetector(dcfg, cfg.dynamic, variables=vars_,
                        dilate=0.25), meta


def run_realtime_selfdetect(G, D, cfg):
    """Realtime run driven by the detector's OWN decoded boxes (no GT):
    the full detect->NMS->sticky-mask->ATE chain the reference runs live
    (yolo_v5.py:104-127 -> ORBextractor.cc:1116-1207).  NO readback."""
    from coebslam_tpu.slam.realtime import RealtimeSlam

    det, meta = _own_detector(cfg)
    if det is None:
        return None
    rt = RealtimeSlam(cfg, detector=det, detect_every=3)
    for i in range(N_FRAMES):                       # warm pass
        rt.track(G[i], D[i], stamp=i / 30.0)
    rt.block()
    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        rt.track(G[i], D[i], stamp=(N_FRAMES + i) / 30.0)
    rt.block()
    fps = N_FRAMES / (time.perf_counter() - t0)
    return rt, fps, det, meta


def score_selfdetect(sd_run, G, B, gt_ate_m):
    """Readback phase: ATE of the self-detect run + decoded-box IoU vs
    the renderer's GT walker boxes."""
    rt, fps, det, meta = sd_run
    res = rt.finish()
    n = len(res["stamps"])
    r = _score(res["stamps"], res["R"], res["t"], n)
    ious = []
    for i in range(0, N_FRAMES, 10):
        boxes = np.asarray(det.detect(G[i]))
        g = B[i]
        best = 0.0
        for b in boxes:
            lt = np.maximum(b[:2], g[:2])
            rb = np.minimum(b[2:], g[2:])
            inter = np.prod(np.maximum(rb - lt, 0))
            ua = np.prod(b[2:] - b[:2]) + np.prod(g[2:] - g[:2]) - inter
            best = max(best, float(inter / max(ua, 1e-9)))
        ious.append(best)
    out = {
        "selfdetect_ate_m": round(float(r["rmse"]), 4),
        "selfdetect_fps": round(fps, 1),
        "selfdetect_box_iou": round(float(np.mean(ious)), 3),
        "selfdetect_trained_iou": round(float(meta.get("miou", 0.0)), 3),
    }
    print(f"self-detect: ATE {r['rmse']*100:.2f} cm ({fps:.0f} fps, "
          f"box IoU {out['selfdetect_box_iou']}) vs GT-box ATE "
          f"{gt_ate_m*100:.2f} cm", file=sys.stderr, flush=True)
    return out


def _mfu_estimate(rt, g, d, fps):
    """FLOPs of the fused per-frame program (XLA cost model) x achieved
    frame rate / chip peak."""
    try:
        import jax.numpy as jnp
        lowered = rt._step.lower(jnp.asarray(g), jnp.asarray(d),
                                 rt._no_boxes, jnp.uint32(0), rt.state)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        mfu = flops * fps / PEAK_FLOPS
        print(f"rt step: {flops/1e9:.2f} GFLOP -> "
              f"MFU estimate {mfu*100:.2f}% of bf16 peak",
              file=sys.stderr, flush=True)
        return mfu
    except Exception as e:                      # pragma: no cover
        print(f"MFU estimate failed: {e!r}", file=sys.stderr)
        return None


def _load_replica(cfg):
    from coebslam_tpu.io import tum
    from coebslam_tpu.utils import replica as replica_mod

    root = os.path.join(tempfile.gettempdir(),
                        f"coebslam_replica{REPLICA_FRAMES}_s0")
    _ensure_replica(root)
    seq = tum.load_tum_sequence(root)
    bstamps, bboxes = replica_mod.load_boxes(
        os.path.join(root, "boxes.txt"), max_boxes=cfg.dynamic.max_boxes)

    def boxes_of(stamp):
        if len(bstamps) == 0:
            return None
        j = int(np.argmin(np.abs(bstamps - stamp)))
        return bboxes[j] if abs(bstamps[j] - stamp) < 0.03 else None

    # RAW wire dtypes (uint8 gray + uint16 depth): 3 bytes/px on the
    # wire and the SAME executable as the synthetic feed — a float32
    # depth feed would compile a second ~35 MB program and thrash the
    # executable-retention budget (measured: 9 fps instead of wire rate).
    frames = [seq.load_frame_raw(i) for i in range(len(seq))]
    return seq, frames, boxes_of


def _load_closure_replica(cfg):
    from coebslam_tpu.io import tum
    from coebslam_tpu.utils import replica as replica_mod

    root = os.path.join(tempfile.gettempdir(),
                        f"coebslam_replica_cl{CLOSURE_FRAMES}_s0")
    _ensure_replica(root, n_frames=CLOSURE_FRAMES, closure=True)
    seq = tum.load_tum_sequence(root)
    bstamps, bboxes = replica_mod.load_boxes(
        os.path.join(root, "boxes.txt"), max_boxes=cfg.dynamic.max_boxes)

    def boxes_of(stamp):
        if len(bstamps) == 0:
            return None
        j = int(np.argmin(np.abs(bstamps - stamp)))
        return bboxes[j] if abs(bstamps[j] - stamp) < 0.03 else None

    frames = [seq.load_frame_raw(i) for i in range(len(seq))]
    return seq, frames, boxes_of


CLOSURE_DEPTH_BIAS = 1.05   # miscalibrated-sensor drift stressor (same
                            # role as the loop-circuit scene's bias)


def run_realtime_closure(cfg, voc, frames, boxes_of):
    """Revisiting-replica realtime run (out-and-back trajectory + walker
    + blur + a systematic depth-scale error so real drift accumulates):
    the dataset-wire loop-closure validation — NO readback."""
    from coebslam_tpu.slam.realtime import RealtimeSlam

    rt = RealtimeSlam(cfg, vocabulary=voc, maintain_every=4)
    t0 = time.perf_counter()
    for stamp, gray, depth in frames:
        depth = (depth.astype(np.float32)
                 * CLOSURE_DEPTH_BIAS).astype(depth.dtype)
        rt.track(gray, depth, stamp=stamp, boxes=boxes_of(stamp))
    rt.block()
    return rt, time.perf_counter() - t0


def score_closure(rt, wall, seq, n):
    from coebslam_tpu.eval import ate
    res = rt.finish()
    est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
    r = ate.ate_rmse(res["stamps"], est, seq.gt_stamps,
                     seq.gt_poses[:, :3])
    out = {
        "closure_rt_ate_m": round(float(r["rmse"]), 4),
        "closure_rt_fps": round(n / wall, 1),
        "closure_loops_closed": res.get("n_loops_closed"),
        "closure_loop_events": res.get("n_loop_events"),
    }
    print(f"closure replica: ATE {r['rmse']*100:.2f} cm; "
          f"{out['closure_rt_fps']} fps; "
          f"loops={out['closure_loops_closed']}/"
          f"{out['closure_loop_events']} events",
          file=sys.stderr, flush=True)
    return out


def run_realtime_replica(cfg, voc, frames, boxes_of):
    """Dataset-scale realtime run (400-frame TUM-wire replica: walker +
    blur + shake) — shares the compiled step with the synthetic run
    (realtime._cached_step), still NO readback.

    Maintenance dispatches are individually block-timed: with a closure
    in the log the MAX dispatch is the on-chip loop-closure latency
    (detect+solve+pose-graph+remap in one program); without one it
    bounds the no-event cost."""
    import jax
    from coebslam_tpu.slam.realtime import RealtimeSlam

    rt = RealtimeSlam(cfg, vocabulary=voc, maintain_every=8)
    maint_times = []
    if rt.maint is not None:
        orig_step = rt.maint.step

        def timed_step(st, ms, seed):
            t0 = time.perf_counter()
            out = orig_step(st, ms, seed)
            jax.block_until_ready(out[1].bow_next)
            maint_times.append((time.perf_counter() - t0) * 1e3)
            return out

        rt.maint.step = timed_step
    t0 = time.perf_counter()
    for stamp, gray, depth in frames:
        rt.track(gray, depth, stamp=stamp, boxes=boxes_of(stamp))
    rt.block()
    wall = time.perf_counter() - t0
    return rt, wall, maint_times


def score_replica_rt(rt, wall, maint_times, seq, n):
    """Readback + scoring of the replica realtime run (call only after
    every realtime run has completed)."""
    from coebslam_tpu.eval import ate

    res = rt.finish()
    est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
    r_rt = ate.ate_rmse(res["stamps"], est, seq.gt_stamps,
                        seq.gt_poses[:, :3])
    out = {
        "replica_rt_ate_m": round(float(r_rt["rmse"]), 4),
        "replica_rt_fps": round(n / wall, 1),
        "replica_rt_ok": int(res["ok"].sum()),
        "replica_frames": n,
        "replica_loops_closed": res.get("n_loops_closed"),
        "replica_reloc": res.get("n_relocalizations"),
    }
    # Offline refinement of the SAME session (handoff + global BA — the
    # reference's detached-GBA role, LoopClosing.cc:646-750): the
    # "zero-sync front-end + offline polish" accuracy claim, measured.
    try:
        from coebslam_tpu.config import SystemConfig
        from coebslam_tpu.slam import handoff
        t0 = time.perf_counter()
        m, kf_ids, n_opt = handoff.refine(res, SystemConfig())
        traj2 = handoff.refined_trajectory(res, m, kf_ids)
        est2 = np.asarray([-P[:, :3].T @ P[:, 3] for P in traj2])
        r_ref = ate.ate_rmse(res["stamps"], est2, seq.gt_stamps,
                             seq.gt_poses[:, :3])
        out["replica_rt_refined_ate_m"] = round(float(r_ref["rmse"]), 4)
        out["refine_wall_s"] = round(time.perf_counter() - t0, 1)
        print(f"replica realtime+refine: ATE {r_ref['rmse']*100:.2f} cm "
              f"({n_opt} KFs refined in {out['refine_wall_s']}s)",
              file=sys.stderr, flush=True)
    except Exception as e:                      # pragma: no cover
        print(f"refine scoring failed: {e!r}", file=sys.stderr)
    if maint_times:
        steady = maint_times[2:] or maint_times   # first ones compile
        out["maint_ms_median"] = round(float(np.median(steady)), 1)
        out["loop_dispatch_ms_max"] = round(float(np.max(steady)), 1)
    print(f"replica realtime: ATE {r_rt['rmse']*100:.2f} cm; "
          f"{out['replica_rt_fps']} fps; ok {out['replica_rt_ok']}/{n}; "
          f"loops={out['replica_loops_closed']} "
          f"reloc={out['replica_reloc']}", file=sys.stderr, flush=True)
    return out


def bench_replica_host(cfg, voc, seq, frames, boxes_of):
    """Host pipeline over a replica prefix (runs last: it reads back per
    frame, so it lives with the degraded-client tax either way)."""
    from coebslam_tpu.eval import ate
    from coebslam_tpu.slam.system import System

    sysm = System(cfg, vocabulary=voc)
    sysm.enable_realtime()
    m = min(REPLICA_HOST_FRAMES, len(frames))
    t0 = time.perf_counter()
    for stamp, gray, depth in frames[:m]:
        sysm.track_rgbd(gray, depth, stamp=stamp, boxes=boxes_of(stamp))
    sysm.shutdown()
    host_wall = time.perf_counter() - t0
    traj = sysm.tracker.export_trajectory()
    est = np.asarray([-R.T @ t for _, R, t in traj])
    stamps = np.asarray([s for s, _, _ in traj])
    r_h = ate.ate_rmse(stamps, est, seq.gt_stamps, seq.gt_poses[:, :3])
    out = {"replica_host_ate_m": round(float(r_h["rmse"]), 4),
           "replica_host_fps": round(m / host_wall, 2)}
    print(f"replica host: ATE {r_h['rmse']*100:.2f} cm; "
          f"{out['replica_host_fps']} fps over {m} frames",
          file=sys.stderr, flush=True)
    return out


def bench_host_pipeline(G, D, B, cfg, voc, n=90):
    """Host-orchestrated System (covisibility mapper + loops/reloc path,
    vocabulary attached) — secondary.  The detector's device cost is
    paid by the sibling process (same topology as the realtime bench);
    boxes come from the renderer's ground truth, so no in-process
    per-frame detector dispatch (round-3 bench paid an ~87 MB executable
    re-ship per frame doing that — the exact thrashing
    docs/TPU_BACKEND_NOTES.md §2 forbids)."""
    from coebslam_tpu.slam.system import System

    sysm = System(cfg, vocabulary=voc)
    sysm.enable_realtime()
    warm = min(N_WARM, n // 3)
    for i in range(warm):
        sysm.track_rgbd(G[i], D[i], stamp=i / 30.0, boxes=B[i][None])
    t0 = time.perf_counter()
    for i in range(warm, n):
        sysm.track_rgbd(G[i], D[i], stamp=i / 30.0, boxes=B[i][None])
    fps = (n - warm) / (time.perf_counter() - t0)
    sysm.shutdown()
    stamps = [s for s, _, _ in sysm.tracker.trajectory]
    R = [Ri for _, Ri, _ in sysm.tracker.trajectory]
    t = [ti for _, _, ti in sysm.tracker.trajectory]
    r = _score(stamps, R, t, n)
    print(f"host pipeline: {fps:.2f} fps; ATE {r['rmse']*100:.2f} cm",
          file=sys.stderr, flush=True)
    return fps, float(r["rmse"])


def _run_loop_stage():
    """--stage loop: the loop-circuit scene in its OWN process.  Late in
    the main bench process the accumulated executables push the client
    past its retention budget and every dispatch pays ~100 ms of
    re-shipping (docs §2) — measured 101 ms median vs 0.33 ms on a
    fresh client.  A child process gives the scene clean numbers."""
    from coebslam_tpu.config import SystemConfig
    voc = _load_vocab()
    out = {}
    if voc is not None:
        out = score_loop_event(*run_loop_event(SystemConfig(), voc))
    print("LOOPJSON:" + json.dumps(out))


def main():
    from coebslam_tpu.config import SystemConfig

    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
        assert stage == "loop", stage
        _run_loop_stage()
        return

    t_start = time.perf_counter()
    cfg = SystemConfig()          # full TUM VGA, dynamic filtering ON
    cache = os.path.join(tempfile.gettempdir(),
                         f"coebslam_bench_v3_{N_FRAMES}.npz")
    if not os.path.exists(cache):
        _render_frames(cache)
    z = np.load(cache)
    G, D, B = z["g"], z["d"], z["b"]      # materialize ONCE (npz members
    #                                       re-decompress on every access)
    voc = _load_vocab()

    # Phase order matters (docs/TPU_BACKEND_NOTES.md §1): BOTH realtime
    # runs execute before the first finish() readback — the two sessions
    # share one compiled executable (realtime._cached_step), and the
    # degraded-transfer mode only ever taxes the host benches, which pay
    # per-frame readbacks by design anyway.
    seq = frames = boxes_of = None
    try:
        seq, frames, boxes_of = _load_replica(cfg)
    except Exception as e:                      # pragma: no cover
        print(f"replica load failed: {e!r}", file=sys.stderr)
    cseq = cframes = cboxes_of = None
    try:
        cseq, cframes, cboxes_of = _load_closure_replica(cfg)
    except Exception as e:                      # pragma: no cover
        print(f"closure replica load failed: {e!r}", file=sys.stderr)

    det_proc = None
    try:
        det_proc = _spawn_detector_process(cache)
    except Exception as e:                      # pragma: no cover
        print(f"detector process failed ({e!r}); SLAM-only bench",
              file=sys.stderr)
    replica_extra = {}
    loop_run = None
    cl_run = None
    rep_run = None
    sd_run = None
    try:
        rt1, fps, maint_ms = run_realtime(G, D, B, cfg, voc)
        rep_run = None
        if frames is not None:
            try:
                rep_run = run_realtime_replica(cfg, voc, frames, boxes_of)
            except Exception as e:              # pragma: no cover
                print(f"replica realtime failed: {e!r}", file=sys.stderr)
        cl_run = None
        if cframes is not None and voc is not None:
            try:
                cl_run = run_realtime_closure(cfg, voc, cframes, cboxes_of)
            except Exception as e:              # pragma: no cover
                print(f"closure realtime failed: {e!r}", file=sys.stderr)
        sd_run = None
        try:
            sd_run = run_realtime_selfdetect(G, D, cfg)
        except Exception as e:                  # pragma: no cover
            print(f"self-detect bench failed: {e!r}", file=sys.stderr)
    finally:
        if det_proc is not None:
            det_proc.kill()

    # ---- readbacks + scoring (client may degrade from here on)
    mfu = _mfu_estimate(rt1, G[0], D[0], fps)
    res1 = rt1.finish()
    n_scored = len(res1["stamps"])            # two passes over the orbit
    r1 = _score(res1["stamps"], res1["R"], res1["t"], n_scored)
    ate_m, n_kf = float(r1["rmse"]), res1["n_kf"]
    print(f"realtime: {fps:.1f} fps; ATE {ate_m*100:.2f} cm; "
          f"n_kf={n_kf}; ok={int(res1['ok'].sum())}/{n_scored}; "
          f"detector process at {DETECT_HZ} Hz", file=sys.stderr, flush=True)
    if rep_run is not None:
        try:
            replica_extra = score_replica_rt(rep_run[0], rep_run[1],
                                             rep_run[2], seq,
                                             len(frames))
        except Exception as e:                  # pragma: no cover
            print(f"replica scoring failed: {e!r}", file=sys.stderr)
    if sd_run is not None:
        try:
            replica_extra.update(score_selfdetect(sd_run, G, B, ate_m))
        except Exception as e:                  # pragma: no cover
            print(f"self-detect scoring failed: {e!r}", file=sys.stderr)
    if cl_run is not None:
        try:
            replica_extra.update(
                score_closure(cl_run[0], cl_run[1], cseq, len(cframes)))
        except Exception as e:                  # pragma: no cover
            print(f"closure scoring failed: {e!r}", file=sys.stderr)
    # Loop-circuit scene in a CHILD process (fresh client — see
    # _run_loop_stage); the parent's TPU work is done by now.
    try:
        cp = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", "loop"],
            capture_output=True, text=True, timeout=900)
        for line in (cp.stdout + cp.stderr).splitlines():
            if line.startswith("LOOPJSON:"):
                replica_extra.update(json.loads(line[len("LOOPJSON:"):]))
                break
        else:
            print(f"loop stage child gave no JSON (rc {cp.returncode}): "
                  f"{cp.stderr[-400:]}", file=sys.stderr)
    except Exception as e:                      # pragma: no cover
        print(f"loop-event stage failed: {e!r}", file=sys.stderr)

    try:
        host_fps, host_ate = bench_host_pipeline(G, D, B, cfg, voc)
    except Exception as e:                      # pragma: no cover
        print(f"host pipeline bench failed: {e!r}", file=sys.stderr)
        host_fps = host_ate = None
    if frames is not None:
        try:
            replica_extra.update(
                bench_replica_host(cfg, voc, seq, frames, boxes_of))
        except Exception as e:                  # pragma: no cover
            print(f"replica host bench failed: {e!r}", file=sys.stderr)

    extra = {
        "ate_m": round(ate_m, 4),
        "n_keyframes": n_kf,
        "loops_closed": res1.get("n_loops_closed"),
        "relocalizations": res1.get("n_relocalizations"),
        "detector_process_hz": DETECT_HZ,
        "vocabulary_words": (voc.n_words if voc is not None else 0),
        "maint_ms": maint_ms,
        "host_pipeline_fps": (round(host_fps, 2) if host_fps else None),
        "host_pipeline_ate_m": (round(host_ate, 4) if host_ate else None),
        "mfu_estimate": (round(mfu, 5) if mfu else None),
    }
    extra.update(replica_extra)
    extra["total_wall_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps({
        "metric": "coeb_realtime_rgbd_fps_1chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
