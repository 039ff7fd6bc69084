"""EuRoC MAV dataset loading.

Parity with the reference's `mono_euroc.cc` LoadImages (Examples/Monocular/
mono_euroc.cc: reads a timestamp list and ``mav0/cam0/data/<stamp>.png``).
Ground truth comes from ``mav0/state_groundtruth_estimate0/data.csv``.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class EurocSequence:
    root: str
    stamps: np.ndarray           # [N] seconds
    cam0_files: List[str]
    cam1_files: Optional[List[str]] = None
    gt_stamps: Optional[np.ndarray] = None
    gt_poses: Optional[np.ndarray] = None     # [M, 7] tx ty tz qw qx qy qz

    def __len__(self):
        return len(self.cam0_files)

    def load_frame(self, i: int) -> Tuple[float, np.ndarray]:
        from PIL import Image
        img = np.asarray(Image.open(self.cam0_files[i])).astype(np.float32)
        if img.ndim == 3:
            img = 0.299 * img[..., 0] + 0.587 * img[..., 1] \
                + 0.114 * img[..., 2]
        return float(self.stamps[i]), img


def load_euroc_sequence(root: str,
                        timestamp_file: Optional[str] = None
                        ) -> EurocSequence:
    """Load an EuRoC sequence root (the directory containing ``mav0/``).

    ``timestamp_file``: optional explicit list of nanosecond stamps (the
    reference ships EuRoC_TimeStamps/*.txt); default uses cam0's data.csv.
    """
    cam0 = os.path.join(root, "mav0", "cam0", "data")
    cam1 = os.path.join(root, "mav0", "cam1", "data")

    if timestamp_file:
        with open(timestamp_file) as f:
            ns = [line.strip() for line in f if line.strip()]
    else:
        csv = os.path.join(root, "mav0", "cam0", "data.csv")
        ns = []
        with open(csv) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ns.append(line.split(",")[0])

    stamps = np.asarray([int(s) * 1e-9 for s in ns])
    files0 = [os.path.join(cam0, f"{s}.png") for s in ns]
    keep = [i for i, p in enumerate(files0) if os.path.exists(p)]
    stamps = stamps[keep]
    files0 = [files0[i] for i in keep]
    files1 = None
    if os.path.isdir(cam1):
        files1 = [os.path.join(cam1, os.path.basename(p)) for p in files0]

    gt_stamps = gt_poses = None
    gt_csv = os.path.join(root, "mav0", "state_groundtruth_estimate0",
                          "data.csv")
    if os.path.exists(gt_csv):
        rows = []
        with open(gt_csv) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                vals = line.split(",")
                rows.append([float(v) for v in vals[:8]])
        arr = np.asarray(rows)
        gt_stamps = arr[:, 0] * 1e-9
        gt_poses = arr[:, 1:8]          # tx ty tz qw qx qy qz

    return EurocSequence(root=root, stamps=stamps, cam0_files=files0,
                         cam1_files=files1, gt_stamps=gt_stamps,
                         gt_poses=gt_poses)
