"""Device-mesh helpers for the distributed solvers.

The reference has no multi-device story at all (SURVEY §2.6: a 4-thread
process + ROS); scaling here is mesh-native: map arenas and BA observation
tables shard over a 1-D (or 2-D) `jax.sharding.Mesh`, and the reduced camera
system is assembled with `psum` over ICI (SURVEY §5.8 cost model).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


POINT_AXIS = "pts"      # data-parallel axis over map points / observations
FRAME_AXIS = "frames"   # data-parallel axis over camera frames


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = POINT_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
