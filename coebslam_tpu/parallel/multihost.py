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


def arena_to_ba_problem(m, cfg, max_obs: int = 16, n_segments: int = 1,
                        pad_points_to: int = 1):
    """REAL-map bridge: a host `MapArena` (the realtime handoff product,
    slam/handoff.to_arena) as a `local_ba.BAProblem` with its points
    ORDERED BY TRAJECTORY SEGMENT, ready for the segment-sharded solvers
    (parallel.sharded_ba over a `make_hybrid_mesh`).

    With points grouped by their anchor keyframe's segment
    (`segment_of_keyframe` of the FIRST observer), a
    `PartitionSpec((DCN_AXIS, ICI_AXIS))` shard of the point axis places
    each segment's points on its own DCN group — the Schur partials a
    segment contributes are computed where its data lives, and only the
    psum'd [K,6x6] reduced system crosses DCN (SURVEY §5.8).

    Returns (problem, kfs, pts, segment_of_point).
    """
    import jax.numpy as jnp
    from ..optim.local_ba import BAProblem

    kfs = np.asarray(m.valid_keyframes())
    pts = np.asarray(m.valid_points())
    n_k, n_p = len(kfs), len(pts)
    win_of_kf = np.full(m.kf_R.shape[0] + 1, -1, np.int32)
    win_of_kf[kfs] = np.arange(n_k)

    # Segment of a point = segment of its first live observer.
    okf = m.pt_obs_kf[pts]                     # [n_p, MAX_OBS]
    live = okf >= 0
    first_kf = okf[np.arange(n_p), np.argmax(live, axis=1)]
    seg_of_kf = np.asarray([segment_of_keyframe(int(w), n_segments, n_k)
                            for w in win_of_kf[kfs]])
    seg_of_pt = seg_of_kf[np.clip(win_of_kf[first_kf], 0, n_k - 1)]
    order = np.argsort(seg_of_pt, kind="stable")
    pts = pts[order]
    seg_of_pt = seg_of_pt[order]

    okf = m.pt_obs_kf[pts]
    oslot = m.pt_obs_slot[pts]
    live = okf >= 0
    sel_order = np.argsort(~live, axis=1, kind="stable")[:, :max_obs]
    sel = np.take_along_axis(live, sel_order, 1)
    gkf = np.take_along_axis(okf, sel_order, 1)
    gslot = np.take_along_axis(oslot, sel_order, 1)
    gkf_c = np.clip(gkf, 0, None)
    gslot_c = np.clip(gslot, 0, None)
    uv = m.kf_uv[gkf_c, gslot_c]               # [n_p, M, 2]
    ur = m.kf_ur[gkf_c, gslot_c]
    lvl = m.kf_level[gkf_c, gslot_c].astype(np.float32)
    sf2 = float(cfg.orb.scale_factor) ** 2
    obs_kf = np.where(sel, win_of_kf[gkf_c], -1).astype(np.int32)

    # Pad the point axis up to a shard-divisible size (invalid rows).
    P = -(-n_p // pad_points_to) * pad_points_to
    pad = P - n_p

    def padp(a, fill=0):
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]) if pad else a

    kf_fixed = np.zeros(n_k, bool)
    kf_fixed[0] = True
    prob = BAProblem(
        kf_R=jnp.asarray(m.kf_R[kfs]), kf_t=jnp.asarray(m.kf_t[kfs]),
        kf_fixed=jnp.asarray(kf_fixed), kf_valid=jnp.ones(n_k, bool),
        pt_pos=jnp.asarray(padp(m.pt_pos[pts])),
        pt_valid=jnp.asarray(padp(np.ones(n_p, bool), False)),
        obs_kf=jnp.asarray(padp(obs_kf, -1)),
        obs_uvr=jnp.asarray(
            padp(np.concatenate([uv, ur[..., None]], axis=-1))),
        obs_w=jnp.asarray(padp((1.0 / sf2 ** lvl).astype(np.float32))),
        obs_valid=jnp.asarray(padp(sel & (obs_kf >= 0), False)))
    return prob, kfs, pts, seg_of_pt
