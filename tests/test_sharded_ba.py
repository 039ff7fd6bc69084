"""Distributed BA on the 8-device virtual CPU mesh: shard-invariance of the
Schur system (SURVEY §4: multi-chip correctness testable without a pod)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
