"""Trajectory writers/readers — TUM and KITTI formats.

Replaces `System::SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM /
SaveTrajectoryKITTI` (System.cc:331-493) — without the reference's hardcoded
output paths (System.cc:358,416).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..geometry import so3


def save_tum(path: str, stamps: Sequence[float], poses_cw) -> None:
    """Write TUM format: ``stamp tx ty tz qx qy qz qw`` with camera-to-world
    poses (the reference inverts Tcw before writing, System.cc:372-385).

    Args:
      poses_cw: iterable of (R_cw [3,3], t_cw [3]) world-to-camera poses.
    """
    lines = []
    for stamp, (R_cw, t_cw) in zip(stamps, poses_cw):
        R_cw = np.asarray(R_cw, np.float64)
        t_cw = np.asarray(t_cw, np.float64)
        R_wc = R_cw.T
        t_wc = -R_wc @ t_cw
        q = np.asarray(so3.matrix_to_quat(R_wc))  # (w, x, y, z)
        lines.append("%.6f %.7f %.7f %.7f %.7f %.7f %.7f %.7f" % (
            stamp, t_wc[0], t_wc[1], t_wc[2], q[1], q[2], q[3], q[0]))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_tum(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read TUM format -> (stamps [N], xyz+quat [N, 7])."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            rows.append([float(x) for x in line.split()])
    arr = np.asarray(rows)
    return arr[:, 0], arr[:, 1:8]


def save_kitti(path: str, poses_cw) -> None:
    """Write KITTI format: rows of the 3x4 camera-to-world matrix
    (System.cc:445-493 semantics)."""
    lines = []
    for R_cw, t_cw in poses_cw:
        R_cw = np.asarray(R_cw, np.float64)
        t_cw = np.asarray(t_cw, np.float64)
        R_wc = R_cw.T
        t_wc = -R_wc @ t_cw
        M = np.hstack([R_wc, t_wc[:, None]])
        lines.append(" ".join("%.9e" % x for x in M.ravel()))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def tum_to_matrices(xyzq: np.ndarray) -> np.ndarray:
    """[N, 7] tx ty tz qx qy qz qw -> [N, 4, 4] camera-to-world matrices."""
    out = np.tile(np.eye(4), (len(xyzq), 1, 1))
    for i, row in enumerate(xyzq):
        q = np.array([row[6], row[3], row[4], row[5]])  # -> (w, x, y, z)
        out[i, :3, :3] = np.asarray(so3.quat_to_matrix(q))
        out[i, :3, 3] = row[:3]
    return out
