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
