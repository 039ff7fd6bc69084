"""Essential-graph optimization: Gauss-Newton over Sim3 keyframe poses.

Replaces `Optimizer::OptimizeEssentialGraph` (Optimizer.cc:781-1044): nodes
are keyframe Sim3 poses (scale 1 for RGB-D/stereo), edges are relative-pose
constraints from the spanning tree, strong covisibility (weight >= 100) and
loop closures; the loop keyframe is fixed.  After convergence poses recover
as [R | t/s] (geometry/sim3.to_se3_matrix) and map points re-map through
their reference keyframe's correction — exactly the reference's recovery
step (Optimizer.cc:1020-1044), done here by the caller (slam/loop_closing).

Structure: fixed-shape edge arrays; per-edge 7x7 Jacobian blocks from
forward-mode autodiff of the Sim3 log-residual (vmapped — the graph is tiny
next to BA, and this runs once per loop event), scatter-added into a dense
[7K, 7K] normal system.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimizerConfig
from ..geometry import sim3
from ..geometry.sim3 import Sim3


class PoseGraphProblem(NamedTuple):
    # Nodes.
    s: jnp.ndarray             # [K]
    R: jnp.ndarray             # [K, 3, 3]
    t: jnp.ndarray             # [K, 3]
    fixed: jnp.ndarray         # [K] bool
    valid: jnp.ndarray         # [K] bool
    # Edges: measured relative Sim3  S_ij = S_i * S_j^-1  (i observed from j).
    edge_i: jnp.ndarray        # [E] int32
    edge_j: jnp.ndarray        # [E] int32
    edge_s: jnp.ndarray        # [E]
    edge_R: jnp.ndarray        # [E, 3, 3]
    edge_t: jnp.ndarray        # [E, 3]
    edge_valid: jnp.ndarray    # [E] bool
    edge_weight: jnp.ndarray   # [E] float32


def _edge_residual(xi_i, xi_j, Si: Sim3, Sj: Sim3, Smeas: Sim3):
    """r = log( S_meas^-1 * (exp(xi_i) Si) * (exp(xi_j) Sj)^-1 )  [7]."""
    Si_new = sim3.exp(xi_i).compose(Si)
    Sj_new = sim3.exp(xi_j).compose(Sj)
    rel = Si_new.compose(Sj_new.inverse())
    return sim3.log(Smeas.inverse().compose(rel))


def optimize_pose_graph(prob: PoseGraphProblem, cfg: OptimizerConfig,
                        n_iters: int = None,
                        fix_scale: bool = False,
                        reduce_fn=None) -> PoseGraphProblem:
    """Run GN with per-iteration relinearization.  Returns updated nodes.

    ``fix_scale``: constrain every node's scale to its current value (RGB-D/
    stereo — the reference's bFixScale essential graph).
    ``reduce_fn(H, b)``: distributed-assembly hook — under shard_map with
    the EDGE axis sharded, each device scatter-adds its edge shard's 7x7
    blocks into a local [K,K,7,7] system, one psum merges them over ICI,
    and the dense solve runs replicated (SURVEY §5.8: pose-graph solves
    as collectives; node count K is small, edges scale with the map)."""
    K = prob.s.shape[0]
    iters = cfg.essential_graph_iters if n_iters is None else n_iters

    zero7 = jnp.zeros(7)
    res_fn = _edge_residual
    jac_i = jax.jacfwd(res_fn, argnums=0)
    jac_j = jax.jacfwd(res_fn, argnums=1)

    def one_iteration(carry, _):
        s, R, t = carry
        Si = Sim3(s[prob.edge_i], R[prob.edge_i], t[prob.edge_i])
        Sj = Sim3(s[prob.edge_j], R[prob.edge_j], t[prob.edge_j])
        Sm = Sim3(prob.edge_s, prob.edge_R, prob.edge_t)

        r = jax.vmap(res_fn, in_axes=(None, None, 0, 0, 0))(
            zero7, zero7, Si, Sj, Sm)                       # [E, 7]
        Ji = jax.vmap(jac_i, in_axes=(None, None, 0, 0, 0))(
            zero7, zero7, Si, Sj, Sm)                       # [E, 7, 7]
        Jj = jax.vmap(jac_j, in_axes=(None, None, 0, 0, 0))(
            zero7, zero7, Si, Sj, Sm)

        w = prob.edge_weight * prob.edge_valid
        H = jnp.zeros((K, K, 7, 7))
        b = jnp.zeros((K, 7))
        ii, jj = prob.edge_i, prob.edge_j
        H = H.at[ii, ii].add(jnp.einsum("eri,e,erj->eij", Ji, w, Ji))
        H = H.at[jj, jj].add(jnp.einsum("eri,e,erj->eij", Jj, w, Jj))
        H = H.at[ii, jj].add(jnp.einsum("eri,e,erj->eij", Ji, w, Jj))
        H = H.at[jj, ii].add(jnp.einsum("eri,e,erj->eij", Jj, w, Ji))
        b = b.at[ii].add(-jnp.einsum("eri,e,er->ei", Ji, w, r))
        b = b.at[jj].add(-jnp.einsum("eri,e,er->ei", Jj, w, r))
        if reduce_fn is not None:
            H, b = reduce_fn(H, b)

        free = (~prob.fixed) & prob.valid
        f = free.astype(H.dtype)
        H = H * f[:, None, None, None] * f[None, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.eye(7) * jnp.where(free, cfg.essential_graph_lambda_init
                                   + 1e-6, 1.0)[:, None, None])
        b = b * f[:, None]

        if fix_scale:
            H = H.at[:, :, 6, :].set(0.0).at[:, :, :, 6].set(0.0)
            H = H.at[jnp.arange(K), jnp.arange(K), 6, 6].set(1.0)
            b = b.at[:, 6].set(0.0)
        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        dxi = jnp.linalg.solve(Hd, b.reshape(K * 7)).reshape(K, 7)
        norm = jnp.linalg.norm(dxi, axis=-1, keepdims=True)
        dxi = dxi * jnp.minimum(1.0, 1.0 / jnp.maximum(norm, 1e-12))
        dxi = dxi * f[:, None]

        S_new = sim3.exp(dxi).compose(Sim3(s, R, t))
        return (S_new.s, S_new.R, S_new.t), None

    (s, R, t), _ = jax.lax.scan(one_iteration, (prob.s, prob.R, prob.t),
                                None, length=iters)
    return prob._replace(s=s, R=R, t=t)
