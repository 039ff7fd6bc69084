"""Distributed BA on the 8-device virtual CPU mesh: shard-invariance of the
Schur system (SURVEY §4: multi-chip correctness testable without a pod)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import CameraConfig, OptimizerConfig
from coebslam_tpu.optim import local_ba
from coebslam_tpu.parallel import mesh as mesh_mod
from coebslam_tpu.parallel import sharded_ba
from test_local_ba import build_problem

CAM = CameraConfig()
OPT = OptimizerConfig()


@pytest.fixture(scope="module")
def problem():
    # P=128 divides 8 devices.
    return build_problem(jax.random.PRNGKey(0), K=4, P=128, M=4)


class TestShardedBA:
    def test_matches_single_device(self, problem):
        prob, poses_gt, pts_gt = problem
        mesh = mesh_mod.make_mesh(8)
        res_single = local_ba.optimize_local_ba(prob, CAM, OPT)
        res_sharded = sharded_ba.optimize_sharded(prob, CAM, OPT, mesh)
        # Shard-invariance: identical math, summation order differs -> tight
        # but not bitwise tolerance.
        np.testing.assert_allclose(np.asarray(res_sharded.kf_t),
                                   np.asarray(res_single.kf_t), atol=2e-3)
        np.testing.assert_allclose(np.asarray(res_sharded.kf_R),
                                   np.asarray(res_single.kf_R), atol=2e-3)
        pt_diff = np.linalg.norm(
            np.asarray(res_sharded.pt_pos - res_single.pt_pos), axis=-1)
        assert np.median(pt_diff) < 5e-3

    def test_converges_to_ground_truth(self, problem):
        prob, poses_gt, pts_gt = problem
        mesh = mesh_mod.make_mesh(8)
        res = sharded_ba.optimize_sharded(prob, CAM, OPT, mesh)
        for k in range(1, 4):
            terr = np.linalg.norm(np.asarray(res.kf_t[k] - poses_gt.t[k]))
            assert terr < 0.02, (k, terr)

    def test_runs_on_smaller_mesh(self, problem):
        prob, *_ = problem
        mesh = mesh_mod.make_mesh(2)
        res = sharded_ba.optimize_sharded(prob, CAM, OPT, mesh)
        assert np.isfinite(np.asarray(res.pt_pos)).all()


class TestShardedGlobalBA:
    """Sharded GLOBAL BA: same chunked-Schur math as single-device
    optimize_global_ba, point shards over the mesh, one psum per
    iteration (Optimizer.cc:41-237 at map scale)."""

    def test_matches_single_device(self, problem):
        prob, poses_gt, pts_gt = problem
        mesh = mesh_mod.make_mesh(8)
        res_single = local_ba.optimize_global_ba(prob, CAM, OPT, n_blocks=2)
        res_sharded = sharded_ba.optimize_global_sharded(
            prob, CAM, OPT, mesh, n_blocks_per_device=2)
        np.testing.assert_allclose(np.asarray(res_sharded.kf_t),
                                   np.asarray(res_single.kf_t), atol=2e-3)
        np.testing.assert_allclose(np.asarray(res_sharded.kf_R),
                                   np.asarray(res_single.kf_R), atol=2e-3)
        pt_diff = np.linalg.norm(
            np.asarray(res_sharded.pt_pos - res_single.pt_pos), axis=-1)
        assert np.median(pt_diff) < 5e-3

    def test_converges_to_ground_truth(self, problem):
        prob, poses_gt, pts_gt = problem
        mesh = mesh_mod.make_mesh(8)
        res = sharded_ba.optimize_global_sharded(prob, CAM, OPT, mesh)
        for k in range(1, 4):
            terr = np.linalg.norm(np.asarray(res.kf_t[k] - poses_gt.t[k]))
            assert terr < 0.02, (k, terr)


class TestShardedPoseGraph:
    """Sharded essential graph: edge shards over the mesh, psum-merged
    [K,K,7,7] normal system (Optimizer.cc:781-1044)."""

    def _chain_problem(self, K=8, E_pad=16, drift=0.05):
        from coebslam_tpu.geometry import so3
        from coebslam_tpu.optim import pose_graph as pg
        rng = np.random.RandomState(0)
        # Ground-truth chain of poses along x; drifted estimates.
        R_gt = [np.eye(3, dtype=np.float32)] * K
        t_gt = [np.asarray([0.5 * k, 0, 0], np.float32) for k in range(K)]
        R0 = [R_gt[0]]
        t0 = [t_gt[0]]
        for k in range(1, K):
            w = (drift * rng.randn(3)).astype(np.float32)
            R0.append((np.asarray(so3.exp(jnp.asarray(w))) @ R_gt[k])
                      .astype(np.float32))
            t0.append((t_gt[k] + drift * rng.randn(3)).astype(np.float32))
        # Edges: chain with TRUE relatives + a loop edge 0 -> K-1.
        ei, ej, eR, et = [], [], [], []
        for k in range(1, K):
            ei.append(k); ej.append(k - 1)
            Rm = R_gt[k] @ R_gt[k - 1].T
            et.append(t_gt[k] - Rm @ t_gt[k - 1]); eR.append(Rm)
        ei.append(K - 1); ej.append(0)
        Rm = R_gt[K - 1] @ R_gt[0].T
        et.append(t_gt[K - 1] - Rm @ t_gt[0]); eR.append(Rm)
        E = len(ei)
        pad = E_pad - E
        prob = pg.PoseGraphProblem(
            s=jnp.ones(K), R=jnp.asarray(np.stack(R0)),
            t=jnp.asarray(np.stack(t0)),
            fixed=jnp.asarray(np.arange(K) == 0),
            valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.asarray(ei + [0] * pad, np.int32)),
            edge_j=jnp.asarray(np.asarray(ej + [0] * pad, np.int32)),
            edge_s=jnp.ones(E_pad),
            edge_R=jnp.asarray(np.stack(eR + [np.eye(3)] * pad)
                               .astype(np.float32)),
            edge_t=jnp.asarray(np.stack(et + [np.zeros(3)] * pad)
                               .astype(np.float32)),
            edge_valid=jnp.asarray([True] * E + [False] * pad),
            edge_weight=jnp.ones(E_pad))
        return prob, np.stack(R_gt), np.stack(t_gt)

    def test_matches_single_device(self):
        from coebslam_tpu.optim import pose_graph as pg
        prob, R_gt, t_gt = self._chain_problem()
        mesh = mesh_mod.make_mesh(8)
        res_single = pg.optimize_pose_graph(prob, OPT, fix_scale=True)
        res_sharded = sharded_ba.optimize_pose_graph_sharded(
            prob, OPT, mesh, fix_scale=True)
        np.testing.assert_allclose(np.asarray(res_sharded.t),
                                   np.asarray(res_single.t), atol=2e-3)
        np.testing.assert_allclose(np.asarray(res_sharded.R),
                                   np.asarray(res_single.R), atol=2e-3)

    def test_corrects_drift(self):
        prob, R_gt, t_gt = self._chain_problem()
        mesh = mesh_mod.make_mesh(8)
        res = sharded_ba.optimize_pose_graph_sharded(prob, OPT, mesh,
                                                     fix_scale=True)
        err = np.linalg.norm(np.asarray(res.t) - t_gt, axis=-1)
        init_err = np.linalg.norm(np.asarray(prob.t) - t_gt, axis=-1)
        assert err.mean() < 0.6 * init_err.mean(), (err.mean(),
                                                    init_err.mean())
