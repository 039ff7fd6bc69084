#!/usr/bin/env python
"""Offline TUM RGB-D driver — restores the path the reference fork broke.

The reference's `rgbd_tum.cc` compiles but its TrackRGBD call was deleted
(rgbd_tum.cc:103, SURVEY §2.5) because the API grew a boxes argument only the
ROS pipeline supplied.  Here the detector runs in-process (in-graph YOLOv5
when weights are given, otherwise no dynamic gating), so the offline path is
first-class again.

Usage:
  python examples/run_tum_rgbd.py SEQUENCE_DIR [options]

Options:
  --assoc FILE       precomputed association file (stamp rgb stamp depth)
  --settings FILE    settings YAML (reference cv::FileStorage style or
                     native); default = built-in TUM fr3 intrinsics
  --yolo WEIGHTS.pt  torch YOLOv5s checkpoint -> in-graph detector
  --boxes FILE       precomputed detector boxes (stamp xmin ymin xmax ymax
                     per line) -> deterministic detector stand-in
  --vocab FILE       ORB vocabulary (ORBvoc.txt or .npz) -> BoW reloc + loops
  --max-frames N     limit frame count
  --out DIR          output directory (default: SEQUENCE_DIR)
  --viz              also write map.ply + topdown.png + sample overlays
  --cpu              force the CPU backend
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--assoc")
    ap.add_argument("--settings")
    ap.add_argument("--yolo")
    ap.add_argument("--boxes")
    ap.add_argument("--vocab")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--out")
    ap.add_argument("--viz", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--realtime", action="store_true",
                    help="zero-sync realtime mode (slam/realtime.py): the "
                    "whole pipeline as device programs, no per-frame host "
                    "round trips; with --vocab the in-graph loop closer / "
                    "relocalizer runs too")
    ap.add_argument("--refine", action="store_true",
                    help="with --realtime: hand the finished session's "
                    "arenas to the host toolchain and run global BA "
                    "(slam/handoff.py), then export the refined keyframe "
                    "trajectory")
    ap.add_argument("--hybrid-gba", action="store_true",
                    help="with --realtime: after the handoff, run the "
                    "segment-sharded global BA over a hybrid (dcn, ici) "
                    "device mesh on the real map "
                    "(parallel/multihost.py, SURVEY §5.8)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from coebslam_tpu.config import SystemConfig, load_config
    from coebslam_tpu.eval import ate
    from coebslam_tpu.io import tum
    from coebslam_tpu.slam.system import System

    cfg = load_config(args.settings) if args.settings else SystemConfig()

    detector = None
    if args.yolo:
        import torch
        from coebslam_tpu.models import yolov5
        from coebslam_tpu.models.detector import YoloDetector
        ckpt = torch.load(args.yolo, map_location="cpu", weights_only=False)
        sd = ckpt["model"].float().state_dict() if "model" in ckpt else ckpt
        variables = yolov5.port_torch_weights(sd, cfg.detector.num_classes)
        detector = YoloDetector(cfg.detector, cfg.dynamic, variables)

    vocab = None
    if args.vocab:
        from coebslam_tpu.slam import vocabulary as voc_mod
        vocab = (voc_mod.load(args.vocab) if args.vocab.endswith(".npz")
                 else voc_mod.load_orbvoc_text(args.vocab))

    box_lookup = None
    if args.boxes:
        import numpy as np
        from coebslam_tpu.utils import replica
        bstamps, bboxes = replica.load_boxes(
            args.boxes, max_boxes=cfg.dynamic.max_boxes)

        def box_lookup(stamp):
            if len(bstamps) == 0:
                return None
            j = int(np.argmin(np.abs(bstamps - stamp)))
            if abs(bstamps[j] - stamp) > 0.03:
                return None
            return bboxes[j]

    seq = (tum.load_association_file(args.sequence, args.assoc) if args.assoc
           else tum.load_tum_sequence(args.sequence))
    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    print(f"sequence: {args.sequence}  frames: {n}  "
          f"detector: {'yolo' if detector else 'none'}  "
          f"vocab: {'yes' if vocab else 'no'}  "
          f"mode: {'realtime' if args.realtime else 'host'}")

    if args.realtime:
        return _run_realtime(args, cfg, seq, n, box_lookup, detector, vocab)

    system = System(cfg, detector=detector, vocabulary=vocab)
    times = []
    for i in range(n):
        stamp, gray, depth = seq.load_frame(
            i, depth_factor=cfg.camera.depth_map_factor)
        t0 = time.perf_counter()
        boxes = box_lookup(stamp) if box_lookup else None
        state, inl = system.track_rgbd(gray, depth, stamp, boxes=boxes)
        dt = time.perf_counter() - t0
        times.append(dt)
        if i % 25 == 0 or state != "OK":
            print(f"frame {i:4d}  {state:16s} inliers={inl:4d} "
                  f"kfs={len(system.map.valid_keyframes()):3d} "
                  f"pts={len(system.map.valid_points()):5d} "
                  f"{dt*1e3:6.1f} ms")

    out_dir = args.out or args.sequence
    os.makedirs(out_dir, exist_ok=True)
    traj_path = os.path.join(out_dir, "CameraTrajectory.txt")
    system.save_trajectory_tum(traj_path)
    system.save_keyframe_trajectory_tum(
        os.path.join(out_dir, "KeyFrameTrajectory.txt"))
    med = sorted(times)[len(times) // 2]
    print(f"\nmedian track time {med*1e3:.1f} ms "
          f"({1.0/med:.1f} fps steady-state)")
    print(f"trajectory saved to {traj_path}")

    if seq.gt_stamps is not None:
        est_stamps = [s for s, _, _ in system.tracker.trajectory]
        import numpy as np
        est = np.asarray([-R.T @ t for _, R, t in system.tracker.trajectory])
        res = ate.ate_rmse(np.asarray(est_stamps), est,
                           seq.gt_stamps, seq.gt_poses[:, :3])
        print(f"ATE RMSE: {res['rmse']*100:.2f} cm  "
              f"(median {res['median']*100:.2f} cm, {res['pairs']} pairs)")

    if args.viz:
        import numpy as np
        from coebslam_tpu.utils import viz
        m = system.map
        viz.save_ply(os.path.join(out_dir, "map.ply"),
                     m.pt_pos[m.valid_points()],
                     keyframe_positions=_kf_centers(m))
        traj = np.asarray([-R.T @ t for _, R, t in system.tracker.trajectory])
        img = viz.render_map_topdown(m.pt_pos, m.pt_valid,
                                     kf_t=m.kf_t[m.valid_keyframes()],
                                     kf_R=m.kf_R[m.valid_keyframes()],
                                     trajectory=traj)
        viz.save_png(os.path.join(out_dir, "map_topdown.png"), img)
        print(f"viz artifacts in {out_dir}")


def _run_realtime(args, cfg, seq, n, box_lookup, detector, vocab):
    """Zero-sync realtime replay: upload + dispatch only; ONE readback at
    the end (finish()), then standard scoring/export."""
    import numpy as np
    import time
    from coebslam_tpu.eval import ate
    from coebslam_tpu.io import trajectory
    from coebslam_tpu.slam.realtime import RealtimeSlam

    rt = RealtimeSlam(cfg, detector=detector, vocabulary=vocab)
    t0 = time.perf_counter()
    for i in range(n):
        stamp, gray, depth = seq.load_frame_raw(i)
        boxes = box_lookup(stamp) if box_lookup else None
        rt.track(gray, depth, stamp=stamp, boxes=boxes)
        if i == 0:
            rt.block()
            print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
            t0 = time.perf_counter()
    rt.block()
    fps = (n - 1) / (time.perf_counter() - t0)
    res = rt.finish()

    out_dir = args.out or args.sequence
    os.makedirs(out_dir, exist_ok=True)
    traj_path = os.path.join(out_dir, "CameraTrajectory.txt")
    trajectory.save_tum(traj_path, res["stamps"],
                        list(zip(res["R"], res["t"])))
    print(f"\n{fps:.1f} fps steady-state; ok {int(res['ok'].sum())}/{n}; "
          f"keyframes {res['n_kf']} (evicted {res['kf_evicted']}); "
          f"loops {res.get('n_loops_closed', 'n/a')}; "
          f"reloc {res.get('n_relocalizations', 'n/a')}")
    print(f"trajectory saved to {traj_path}")
    if seq.gt_stamps is not None:
        est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
        r = ate.ate_rmse(res["stamps"], est, seq.gt_stamps,
                         seq.gt_poses[:, :3])
        print(f"ATE RMSE: {r['rmse']*100:.2f} cm  "
              f"(median {r['median']*100:.2f} cm, {r['pairs']} pairs)")

    if args.refine or args.hybrid_gba:
        from coebslam_tpu.slam import handoff
        m, kf_ids, n_opt = handoff.refine(res, cfg)
        trajectory.save_tum(
            os.path.join(out_dir, "KeyFrameTrajectory.txt"),
            m.kf_stamp[kf_ids],
            [(m.kf_R[k], m.kf_t[k]) for k in kf_ids])
        print(f"offline refinement: global BA over {n_opt} keyframes; "
              f"KeyFrameTrajectory.txt written")
        traj2 = handoff.refined_trajectory(res, m, kf_ids)
        if seq.gt_stamps is not None:
            est2 = np.asarray([-P[:, :3].T @ P[:, 3] for P in traj2])
            r2 = ate.ate_rmse(res["stamps"], est2, seq.gt_stamps,
                              seq.gt_poses[:, :3])
            print(f"refined ATE RMSE: {r2['rmse']*100:.2f} cm")

    if args.hybrid_gba:
        # Segment-sharded global BA of the REAL handed-off map over the
        # hybrid (dcn, ici) mesh — the SURVEY §5.8 scale-out path on
        # real data (use XLA_FLAGS=--xla_force_host_platform_device_count
        # + --cpu to exercise a virtual mesh on one host).
        import jax
        from coebslam_tpu.parallel import multihost, sharded_ba
        hmesh = multihost.make_hybrid_mesh(
            dcn_size=max(2, len(jax.devices()) // 4)
            if len(jax.devices()) > 1 else 1)
        n_seg = max(1, hmesh.devices.shape[0])
        # Pad to mesh_size * n_blocks_per_device so both the shard split
        # and each device's chunked Schur scan divide evenly.
        prob, kfs, pts, seg = multihost.arena_to_ba_problem(
            m, cfg, n_segments=n_seg,
            pad_points_to=hmesh.devices.size * 2)
        res_h = sharded_ba.optimize_global_sharded(
            prob, cfg.camera, cfg.optimizer, hmesh,
            axis=(multihost.DCN_AXIS, multihost.ICI_AXIS))
        import numpy as _np
        assert _np.isfinite(_np.asarray(res_h.kf_t)).all()
        counts = [int((seg == s).sum()) for s in range(n_seg)]
        print(f"hybrid-mesh GBA: {len(kfs)} KFs / {len(pts)} points over "
              f"mesh {hmesh.devices.shape} (dcn,ici); segment point "
              f"counts {counts}")


def _kf_centers(m):
    import numpy as np
    kfs = m.valid_keyframes()
    return -np.einsum("kji,kj->ki", m.kf_R[kfs], m.kf_t[kfs])


if __name__ == "__main__":
    main()
