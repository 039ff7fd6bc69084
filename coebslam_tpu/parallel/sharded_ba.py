"""Distributed bundle adjustment over a device mesh.

The scaling design of SURVEY §5.8/§7.1: observations (grouped by map point)
are data-parallel over the mesh's point axis; each device assembles its
partial Schur-reduced camera system from its local point shard, one ``psum``
per GN iteration merges the [K,6,6]-block system over ICI, and the tiny
dense solve runs replicated.  Point back-substitution is fully local —
no communication.  Communication per iteration is exactly one
``psum(K*K*36 + K*6 floats)`` regardless of how many points/observations
each device holds, which is why covisibility-local problems scale linearly.

The reference has no distributed story (its LocalBundleAdjustment is a
single-threaded g2o solve with a mutexed map, Optimizer.cc:453); this module
is the from-scratch replacement, reusing the exact same per-iteration math
as the single-chip path (optim/local_ba.py) so shard-invariance is testable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

try:  # JAX >= 0.6 moved shard_map to the top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_rep=False)

from ..config import CameraConfig, OptimizerConfig
from ..optim import local_ba
from ..optim.local_ba import BAProblem, BAResult
from .mesh import POINT_AXIS


def optimize_sharded(prob: BAProblem, cam: CameraConfig,
                     cfg: OptimizerConfig, mesh: Mesh,
                     axis: str = POINT_AXIS) -> BAResult:
    """Run the full local-BA schedule with the point dimension sharded.

    ``prob``'s point-indexed arrays ([P, ...]) must have P divisible by the
    mesh size along ``axis``.  Keyframe arrays are replicated.
    """
    rep = PartitionSpec()
    shard = PartitionSpec(axis)
    in_specs = (BAProblem(
        kf_R=rep, kf_t=rep, kf_fixed=rep, kf_valid=rep,
        pt_pos=shard, pt_valid=shard, obs_kf=shard, obs_uvr=shard,
        obs_w=shard, obs_valid=shard),)
    out_specs = BAResult(kf_R=rep, kf_t=rep, pt_pos=shard,
                         obs_valid=shard, chi2=shard)

    def device_fn(p: BAProblem) -> BAResult:
        reduce_fn = lambda S, b: (jax.lax.psum(S, axis),
                                  jax.lax.psum(b, axis))
        return local_ba.optimize_local_ba(p, cam, cfg, reduce_fn=reduce_fn)

    return shard_map(device_fn, mesh, in_specs, out_specs)(prob)


def optimize_global_sharded(prob: BAProblem, cam: CameraConfig,
                            cfg: OptimizerConfig, mesh: Mesh,
                            axis: str = POINT_AXIS,
                            n_blocks_per_device: int = 2) -> BAResult:
    """Distributed GLOBAL bundle adjustment (Optimizer.cc:41-237 at map
    scale, SURVEY §5.8): the point axis is sharded over the mesh; each
    device streams its shard through the chunked Schur assembly
    (lax.scan, HBM-bounded) and one psum per GN iteration merges the
    [K,6,6]-block reduced camera system over ICI.  Point back-
    substitution is device-local.  This is exactly where one chip runs
    out of map: communication stays one psum per iteration no matter how
    many points each device holds."""
    rep = PartitionSpec()
    shard = PartitionSpec(axis)
    in_specs = (BAProblem(
        kf_R=rep, kf_t=rep, kf_fixed=rep, kf_valid=rep,
        pt_pos=shard, pt_valid=shard, obs_kf=shard, obs_uvr=shard,
        obs_w=shard, obs_valid=shard),)
    out_specs = BAResult(kf_R=rep, kf_t=rep, pt_pos=shard,
                         obs_valid=shard, chi2=shard)

    def device_fn(p: BAProblem) -> BAResult:
        reduce_fn = lambda S, b: (jax.lax.psum(S, axis),
                                  jax.lax.psum(b, axis))
        return local_ba.optimize_global_ba(
            p, cam, cfg, n_blocks=n_blocks_per_device, reduce_fn=reduce_fn)

    return shard_map(device_fn, mesh, in_specs, out_specs)(prob)


def optimize_pose_graph_sharded(prob, cfg: OptimizerConfig, mesh: Mesh,
                                axis: str = POINT_AXIS,
                                fix_scale: bool = False):
    """Distributed essential-graph solve (Optimizer.cc:781-1044, SURVEY
    §5.8): EDGES are sharded over the mesh (nodes are few, edges scale
    with covisibility + loop density); each device scatter-adds its edge
    shard's 7x7 Jacobian blocks into a local [K,K,7,7] normal system and
    one psum per GN iteration merges it.  The tiny dense solve runs
    replicated, so every device ends with identical corrected poses."""
    from ..optim import pose_graph as pg

    rep = PartitionSpec()
    shard = PartitionSpec(axis)
    in_specs = (pg.PoseGraphProblem(
        s=rep, R=rep, t=rep, fixed=rep, valid=rep,
        edge_i=shard, edge_j=shard, edge_s=shard, edge_R=shard,
        edge_t=shard, edge_valid=shard, edge_weight=shard),)
    out_specs = pg.PoseGraphProblem(
        s=rep, R=rep, t=rep, fixed=rep, valid=rep,
        edge_i=shard, edge_j=shard, edge_s=shard, edge_R=shard,
        edge_t=shard, edge_valid=shard, edge_weight=shard)

    def device_fn(p):
        reduce_fn = lambda H, b: (jax.lax.psum(H, axis),
                                  jax.lax.psum(b, axis))
        return pg.optimize_pose_graph(p, cfg, fix_scale=fix_scale,
                                      reduce_fn=reduce_fn)

    return shard_map(device_fn, mesh, in_specs, out_specs)(prob)
