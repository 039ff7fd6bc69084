"""TUM RGB-D dataset loading + association.

Replaces the reference's `associate.py` (timestamp pairing, max_difference
0.02) and the Examples/RGB-D driver's file loading (rgbd_tum.cc LoadImages)
with one loader that also restores the offline RGB-D path the fork broke
(SURVEY §2.5: rgbd_tum.cc:103's TrackRGBD call was removed; here the offline
path is first-class).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..eval.ate import associate


@dataclass
class TumSequence:
    root: str
    rgb_stamps: np.ndarray       # [N]
    rgb_files: List[str]
    depth_stamps: np.ndarray     # [N]
    depth_files: List[str]
    gt_stamps: Optional[np.ndarray] = None       # [M]
    gt_poses: Optional[np.ndarray] = None        # [M, 7] tx ty tz qx qy qz qw

    def __len__(self):
        return len(self.rgb_files)

    def load_frame(self, i: int, depth_factor: float = 5000.0
                   ) -> Tuple[float, np.ndarray, np.ndarray]:
        """Returns (timestamp, gray [H,W] float32 0..255, depth [H,W] float32
        metres)."""
        from PIL import Image
        rgb = np.asarray(Image.open(os.path.join(self.root, self.rgb_files[i])))
        if rgb.ndim == 3:
            gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                    + 0.114 * rgb[..., 2]).astype(np.float32)
        else:
            gray = rgb.astype(np.float32)
        depth_raw = np.asarray(Image.open(
            os.path.join(self.root, self.depth_files[i])))
        depth = depth_raw.astype(np.float32) / depth_factor
        return float(self.rgb_stamps[i]), gray, depth

    def load_frame_raw(self, i: int
                       ) -> Tuple[float, np.ndarray, np.ndarray]:
        """Returns (timestamp, gray uint8, depth uint16) — the sensor
        WIRE dtypes.  The realtime pipeline casts/scales in-graph
        (rt_step), so feeding raw frames (a) ships 3 bytes/px to the
        device instead of 8 and (b) keeps the executable IDENTICAL to
        other uint8/uint16 feeds — a float32 feed would compile a second
        ~35 MB program and can push the client past its retention budget
        (docs/TPU_BACKEND_NOTES.md §2)."""
        from PIL import Image
        rgb = np.asarray(Image.open(os.path.join(self.root,
                                                 self.rgb_files[i])))
        if rgb.ndim == 3:
            gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                    + 0.114 * rgb[..., 2]).astype(np.uint8)
        else:
            gray = rgb.astype(np.uint8)
        depth = np.asarray(Image.open(
            os.path.join(self.root, self.depth_files[i])))
        return float(self.rgb_stamps[i]), gray, depth.astype(np.uint16)


def _read_file_list(path: str) -> Tuple[np.ndarray, List[str]]:
    stamps, files = [], []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            stamps.append(float(parts[0]))
            files.append(parts[1])
    return np.asarray(stamps), files


def load_tum_sequence(root: str, max_difference: float = 0.02) -> TumSequence:
    """Load + associate a TUM sequence directory (rgb.txt / depth.txt /
    groundtruth.txt).  Association is the greedy closest-stamp pairing of
    associate.py."""
    rgb_stamps, rgb_files = _read_file_list(os.path.join(root, "rgb.txt"))
    dep_stamps, dep_files = _read_file_list(os.path.join(root, "depth.txt"))
    pairs = associate(rgb_stamps, dep_stamps, max_difference)
    ri = [p[0] for p in pairs]
    di = [p[1] for p in pairs]

    gt_stamps = gt_poses = None
    gt_path = os.path.join(root, "groundtruth.txt")
    if os.path.exists(gt_path):
        rows = []
        with open(gt_path) as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                rows.append([float(x) for x in line.split()])
        arr = np.asarray(rows)
        gt_stamps, gt_poses = arr[:, 0], arr[:, 1:8]

    return TumSequence(
        root=root,
        rgb_stamps=rgb_stamps[ri], rgb_files=[rgb_files[i] for i in ri],
        depth_stamps=dep_stamps[di], depth_files=[dep_files[i] for i in di],
        gt_stamps=gt_stamps, gt_poses=gt_poses)


def load_association_file(root: str, assoc_path: str) -> TumSequence:
    """Load a sequence using a precomputed association file (the
    Examples/RGB-D/associations/*.txt format: stamp rgb stamp depth)."""
    rs, rf, ds, df = [], [], [], []
    with open(assoc_path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            p = line.split()
            rs.append(float(p[0])); rf.append(p[1])
            ds.append(float(p[2])); df.append(p[3])
    return TumSequence(root=root, rgb_stamps=np.asarray(rs), rgb_files=rf,
                       depth_stamps=np.asarray(ds), depth_files=df)
