"""Multi-host (multi-slice) deployment glue: jax.distributed + 2-D meshes
with an ICI-inner / DCN-outer axis layout.

The reference is a single 4-thread process (SURVEY §2.6); the scale-out
design here (SURVEY §5.8) splits communication by physical fabric:

  * ``ici`` axis (inner, fast): point/observation shards of the Schur
    assembly — one psum of the reduced camera system per GN iteration
    (parallel.sharded_ba).  Covisibility is spatially local, so these
    reductions stay within a slice.
  * ``dcn`` axis (outer, slow): trajectory-SEGMENT data parallelism —
    each host (or slice) owns a contiguous keyframe segment and its
    points; only the pose-graph normal system ([K,K,7,7] blocks, a few
    MB) and segment-boundary camera blocks cross DCN, once per solve,
    not per iteration.  optimize_pose_graph_sharded's edge shards map
    onto this axis directly: intra-segment edges live on their segment's
    devices; the handful of cross-segment + loop edges land wherever
    their shard falls, and the psum moves block-sums, not edges.

On a single host this degrades gracefully to a 1-D ICI mesh, which is
how the CPU-mesh tests exercise the same code paths
(xla_force_host_platform_device_count emulation, SURVEY §4).

Environment contract: call :func:`initialize` once per process before
any backend use.  Under a real multi-host runtime (GKE/TPU-VM pods) the
coordinator address / process ids come from the launcher environment and
``jax.distributed.initialize()`` auto-discovers them; explicit arguments
are for bring-your-own launchers.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

ICI_AXIS = "ici"     # fast intra-slice axis (point shards, psum-heavy)
DCN_AXIS = "dcn"     # slow cross-slice axis (segment DP, rare collectives)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-process runtime (no-op for a single process).

    Mirrors `jax.distributed.initialize` but tolerates single-host runs
    so drivers can call it unconditionally."""
    if num_processes in (None, 1) and coordinator_address is None:
        return                          # single-process: nothing to join
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_hybrid_mesh(dcn_size: Optional[int] = None) -> Mesh:
    """2-D (dcn, ici) mesh over all visible devices.

    ``dcn_size`` defaults to the process (host) count: devices of one
    process form the ICI-inner axis, so psum-per-iteration collectives
    (sharded BA) never cross DCN.  With one process the dcn axis has
    size 1 and every solver behaves exactly like the 1-D path."""
    devs = np.asarray(jax.devices())
    n = dcn_size if dcn_size is not None else jax.process_count()
    n = max(1, min(n, len(devs)))
    while len(devs) % n != 0:           # tolerate ragged layouts
        n -= 1
    return Mesh(devs.reshape(n, len(devs) // n), (DCN_AXIS, ICI_AXIS))


def segment_of_keyframe(kf_id: int, n_segments: int,
                        max_keyframes: int) -> int:
    """Trajectory-segment owner of a keyframe: contiguous blocks, so
    covisibility edges (temporally local) stay intra-segment and the
    Schur assembly's cross-DCN traffic is only the segment boundaries
    (SURVEY §5.8 collective cost model)."""
    seg = kf_id * n_segments // max(max_keyframes, 1)
    return min(seg, n_segments - 1)
