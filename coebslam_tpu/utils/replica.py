"""TUM-format replica benchmark generator.

The acceptance metric for this framework is ATE on TUM fr3 dynamic
sequences via Horn-aligned RMSE (reference `evaluate_ate.py:190`,
BASELINE.md).  The real dataset is not fetchable in this environment
(zero egress), so this module renders a deterministic *replica* with the
same wire format, intrinsics and failure modes and commits its score as
the regression gate:

  * TUM fr3 calibration (fx 535.4 fy 539.2 cx 320.1 cy 247.6, the
    reference's shipped `Examples/RGB-D/tum_bag.yaml`), 640x480 @ 30 Hz,
    16-bit depth PNGs at DepthMapFactor 5000 — byte-compatible with
    `io.tum.load_tum_sequence` and with the reference's LoadImages
    (`rgbd_tum.cc`).
  * A textured room with a person-sized quad walking through the view
    (the fr3_walking "dynamic object" stressor the COEB front-end
    exists for, SURVEY §2.1 Frame).
  * Motion-blur events: windows of frames convolved with a box kernel,
    the failure mode the reference's Laplacian blur gate targets
    (Frame.cc:171-202, threshold 4.2).
  * A camera-shake segment with enlarged inter-frame rotation (the
    tracking-loss stressor behind the COEB adaptive feature budget,
    Tracking.cc:423-466).

Output tree (TUM layout):
  root/rgb/<stamp>.png        8-bit grayscale
  root/depth/<stamp>.png      16-bit, metres * 5000
  root/rgb.txt, depth.txt     "stamp filename" lists
  root/groundtruth.txt        "stamp tx ty tz qx qy qz qw" (Twc)
  root/boxes.txt              "stamp xmin ymin xmax ymax" per walker box
                              (deterministic detector stand-in; feed with
                              run_tum_rgbd.py --boxes)
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..config import CameraConfig
from ..geometry import so3
from ..geometry.se3 import SE3
from . import synthetic

DEPTH_FACTOR = 5000.0


def walking_trajectory(n_frames: int, seed: int = 3) -> List[SE3]:
    """Handheld fr3_walking_xyz-like camera path: multi-frequency sway in
    x/y/z plus gentle yaw/pitch, bounded so the room stays in view.
    Returns world-to-camera SE3 poses (Tcw)."""
    rng = np.random.RandomState(seed)
    ph = rng.uniform(0, 2 * np.pi, size=8)
    poses = []
    for i in range(n_frames):
        s = i / 30.0                      # seconds
        c = np.array([
            0.35 * np.sin(0.55 * s + ph[0]) + 0.12 * np.sin(1.3 * s + ph[1]),
            0.15 * np.sin(0.75 * s + ph[2]) + 0.05 * np.sin(1.7 * s + ph[3]),
            -1.2 + 0.25 * np.sin(0.4 * s + ph[4]),
        ], np.float32)
        yaw = 0.10 * np.sin(0.6 * s + ph[5]) + 0.04 * np.sin(1.9 * s + ph[6])
        pitch = 0.05 * np.sin(0.8 * s + ph[7])
        Rwc = (synthetic._rot_y(yaw) @ synthetic._rot_x(pitch)).astype(
            np.float32)
        Rcw = Rwc.T
        poses.append(SE3(Rcw, (-Rcw @ c).astype(np.float32)))
    return poses


def closure_trajectory(n_frames: int, seed: int = 3) -> List[SE3]:
    """Out-and-back revisiting path: the camera pans (~46 deg) and
    translates (~0.9 m) away from its start view and RETURNS to it over
    the final frames — a genuine revisit for loop-closure validation
    (the role of the reference's fr3 loop-rich sequences in its
    evaluate_ate.py scoring), with a small handheld sway on top so
    tracking still sees the walking-class motion.  Returns Tcw poses."""
    rng = np.random.RandomState(seed)
    ph = rng.uniform(0, 2 * np.pi, size=4)
    poses = []
    for i in range(n_frames):
        u = i / max(n_frames - 1, 1)
        e = 0.5 * (1.0 - np.cos(2.0 * np.pi * u))     # 0 -> 1 -> 0 smooth
        s = i / 30.0
        c = np.array([
            0.9 * e + 0.05 * np.sin(1.3 * s + ph[0]),
            0.04 * np.sin(0.9 * s + ph[1]),
            -1.2 + 0.25 * e,
        ], np.float32)
        yaw = 0.8 * e + 0.03 * np.sin(1.1 * s + ph[2])
        pitch = 0.02 * np.sin(0.7 * s + ph[3])
        Rwc = (synthetic._rot_y(yaw) @ synthetic._rot_x(pitch)).astype(
            np.float32)
        Rcw = Rwc.T
        poses.append(SE3(Rcw, (-Rcw @ c).astype(np.float32)))
    return poses


def _box_blur(img: np.ndarray, k: int) -> np.ndarray:
    """Separable box blur (motion-blur stand-in), reflect-padded."""
    if k <= 1:
        return img
    pad = k // 2
    x = np.pad(img, ((0, 0), (pad, pad)), mode="edge")
    c = np.cumsum(x, axis=1, dtype=np.float64)
    x = (np.concatenate([c[:, k - 1:k], c[:, k:] - c[:, :-k]], axis=1)) / k
    x = np.pad(x, ((pad, pad), (0, 0)), mode="edge")
    c = np.cumsum(x, axis=0, dtype=np.float64)
    x = (np.concatenate([c[k - 1:k, :], c[k:, :] - c[:-k, :]], axis=0)) / k
    return x.astype(np.float32)


def generate(root: str, n_frames: int = 400, seed: int = 0,
             cam: Optional[CameraConfig] = None,
             blur_windows: Tuple[Tuple[int, int, int], ...] = (),
             shake_window: Optional[Tuple[int, int]] = None,
             walkers: int = 1, closure: bool = False,
             progress: bool = False) -> dict:
    """Render the replica sequence to ``root``.  Deterministic in
    (n_frames, seed, options).

    blur_windows: (start, end, kernel) frame windows convolved with a box
      blur — by default two windows are placed at 1/3 and 2/3 of the run.
    shake_window: frame range with doubled camera sway (default: around
      55% of the run).
    closure: use the out-and-back `closure_trajectory` (a genuine
      revisit at the end of the run) instead of the non-revisiting sway.
    Returns {"stamps", "poses", "boxes"} for callers that keep going.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    if cam is None:
        cam = CameraConfig()
    if not blur_windows:
        a, b = int(n_frames * 0.33), int(n_frames * 0.66)
        blur_windows = ((a, a + max(8, n_frames // 25), 9),
                        (b, b + max(8, n_frames // 25), 13))
    if shake_window is None:
        s = int(n_frames * 0.55)
        shake_window = (s, s + max(10, n_frames // 20))

    planes = synthetic.make_room(seed=seed)
    quads = []
    for wi in range(walkers):
        quads.append(synthetic.make_walker(
            seed=seed + 17 * wi + 1,
            start=(-1.1 + 0.8 * wi, -0.25 + 0.1 * wi, 1.9 + 0.3 * wi),
            velocity=(0.011 + 0.003 * wi, 0.004 * (1 - wi), 0.0),
            half_w=0.28, half_h=0.62))
    poses = (closure_trajectory(n_frames, seed=seed + 3) if closure
             else walking_trajectory(n_frames, seed=seed + 3))

    # Camera shake: amplify the pose delta inside the window.
    if shake_window is not None:
        s0, s1 = shake_window
        rng = np.random.RandomState(seed + 7)
        for i in range(max(s0, 1), min(s1, n_frames)):
            jyaw = 0.035 * rng.randn()
            jpitch = 0.02 * rng.randn()
            J = (synthetic._rot_y(jyaw) @ synthetic._rot_x(jpitch)).astype(
                np.float32)
            R = np.asarray(poses[i].R) @ J
            poses[i] = SE3(R, poses[i].t)

    render = jax.jit(lambda p, i, q: synthetic.render(
        cam, p, planes, q, i)[:3])

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines, box_lines = [], [], [], []
    stamps = np.arange(n_frames) / cam.fps
    all_boxes = []

    for i, pose in enumerate(poses):
        frame_boxes = []
        gray = depth = None
        for q in quads:
            g, d, b = render(pose, jnp.asarray(i, jnp.float32), q)
            b = np.asarray(b)
            if gray is None:
                gray, depth = np.asarray(g), np.asarray(d)
            else:
                # Later walkers overwrite where closer (depth==0 is "no
                # return" in TUM convention, keep the other).
                dn = np.asarray(d)
                closer = (dn > 0) & ((depth <= 0) | (dn < depth))
                gray = np.where(closer, np.asarray(g), gray)
                depth = np.where(closer, dn, depth)
            if b[0] >= 0:
                frame_boxes.append(b)
        all_boxes.append(frame_boxes)

        for (b0, b1, k) in blur_windows:
            if b0 <= i < b1:
                gray = _box_blur(gray, k)
                break

        stamp = stamps[i]
        name = f"{stamp:.6f}.png"
        g8 = np.clip(gray, 0, 255).astype(np.uint8)
        d16 = np.clip(depth * DEPTH_FACTOR, 0, 65535).astype(np.uint16)
        Image.fromarray(g8).save(os.path.join(root, "rgb", name))
        Image.fromarray(d16).save(os.path.join(root, "depth", name))
        rgb_lines.append(f"{stamp:.6f} rgb/{name}")
        depth_lines.append(f"{stamp:.6f} depth/{name}")

        R_cw, t_cw = np.asarray(pose.R), np.asarray(pose.t)
        R_wc = R_cw.T
        c = -R_wc @ t_cw
        qw, qx, qy, qz = np.asarray(so3.matrix_to_quat(R_wc))
        gt_lines.append(f"{stamp:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                        f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
        for b in frame_boxes:
            box_lines.append(f"{stamp:.6f} {b[0]:.1f} {b[1]:.1f} "
                             f"{b[2]:.1f} {b[3]:.1f}")
        if progress and i % 50 == 0:
            print(f"  rendered {i}/{n_frames}", flush=True)

    hdr = "# replica of TUM RGB-D wire format (coebslam_tpu)\n"
    for fname, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                         ("groundtruth.txt", gt_lines),
                         ("boxes.txt", box_lines)):
        with open(os.path.join(root, fname), "w") as f:
            f.write(hdr + "\n".join(lines) + "\n")
    return {"stamps": stamps, "poses": poses, "boxes": all_boxes}


def load_boxes(path: str, max_boxes: int = 8):
    """Read boxes.txt -> (stamps [N], boxes [N, max_boxes, 4]) grouped by
    stamp, padded with -1 (the deterministic-detector boundary of
    SURVEY §4: boxes are just a float array at the API surface,
    System.h:73)."""
    groups = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            groups.setdefault(float(parts[0]), []).append(
                [float(x) for x in parts[1:5]])
    stamps = np.asarray(sorted(groups))
    out = np.full((len(stamps), max_boxes, 4), -1.0, np.float32)
    for i, s in enumerate(stamps):
        for j, b in enumerate(groups[s][:max_boxes]):
            out[i, j] = b
    return stamps, out
