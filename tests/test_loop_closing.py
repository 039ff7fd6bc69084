"""Loop-closing components: Sim3 pose graph, Sim3 refinement, alignment
RANSAC, and an end-to-end smoke on a rotating-camera loop."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coebslam_tpu.config import CameraConfig, OptimizerConfig
from coebslam_tpu.geometry import se3, so3, camera as cam_ops
from coebslam_tpu.geometry.sim3 import Sim3
from coebslam_tpu.optim import pose_graph as pg
from coebslam_tpu.optim import sim3_opt
from coebslam_tpu.ops import procrustes

OPT = OptimizerConfig()
CAM = CameraConfig()


def yaw_pose(a):
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32).T
    return R


def drifted_circle(K=12, drift_deg=1.5):
    angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
    R_gt = np.stack([yaw_pose(a) for a in angles])
    pert = np.asarray(so3.exp(jnp.asarray([0, np.deg2rad(drift_deg), 0],
                                          dtype=jnp.float32)))
    R_est = [R_gt[0]]
    for i in range(1, K):
        rel = R_gt[i] @ R_gt[i - 1].T
        R_est.append(pert @ rel @ R_est[-1])
    return R_gt, np.stack(R_est)


def chain_problem(R_init, R_meas_chain, R_loop, K):
    ei, ej, eR = [], [], []
    for i in range(1, K):
        ei.append(i); ej.append(i - 1)
        eR.append(R_meas_chain[i] @ R_meas_chain[i - 1].T)
    ei.append(K - 1); ej.append(0)
    eR.append(R_loop)
    E = len(ei)
    return pg.PoseGraphProblem(
        s=jnp.ones(K), R=jnp.asarray(R_init), t=jnp.zeros((K, 3)),
        fixed=jnp.asarray(np.arange(K) == 0), valid=jnp.ones(K, bool),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_s=jnp.ones(E), edge_R=jnp.asarray(np.stack(eR), jnp.float32),
        edge_t=jnp.zeros((E, 3)), edge_valid=jnp.ones(E, bool),
        edge_weight=jnp.ones(E))


def rot_err_deg(Ra, Rb):
    return np.degrees(np.arccos(np.clip((np.trace(Ra @ Rb.T) - 1) / 2, -1, 1)))


@pytest.mark.slow
class TestPoseGraph:
    def test_distributes_loop_drift(self):
        """Chain with 1.5 deg/edge yaw drift + ground-truth loop edge: the
        16.5 deg closure error must spread to <= drift/K per node."""
        K = 12
        R_gt, R_est = drifted_circle(K)
        prob = chain_problem(R_est, R_est, R_gt[K - 1] @ R_gt[0].T, K)
        out = pg.optimize_pose_graph(prob, OPT, fix_scale=True)
        for i in range(K):
            e = rot_err_deg(np.asarray(out.R[i]), R_gt[i])
            assert e <= 1.5 * (i / K) + 0.2, (i, e)

    def test_pre_corrected_group(self):
        """The live loop-closing structure: a corrected terminal group with
        the full closure residual on the boundary edge."""
        K = 12
        R_gt, R_est = drifted_circle(K)
        R_init = R_est.copy()
        R_init[9:] = R_gt[9:]                      # corrected group
        prob = chain_problem(R_init, R_est, R_gt[K - 1] @ R_gt[0].T, K)
        out = pg.optimize_pose_graph(prob, OPT, fix_scale=True)
        for i in range(K):
            assert rot_err_deg(np.asarray(out.R[i]), R_gt[i]) < 1.6, i

    def test_fix_scale_holds(self):
        K = 12
        R_gt, R_est = drifted_circle(K)
        prob = chain_problem(R_est, R_est, R_gt[K - 1] @ R_gt[0].T, K)
        out = pg.optimize_pose_graph(prob, OPT, fix_scale=True)
        np.testing.assert_allclose(np.asarray(out.s), 1.0, atol=1e-5)


class TestProcrustes:
    def test_umeyama_exact(self):
        rng = np.random.RandomState(0)
        src = rng.randn(32, 3).astype(np.float32)
        R = np.asarray(so3.exp(jnp.asarray([0.2, -0.3, 0.1])))
        t = np.asarray([0.5, -1.0, 2.0], np.float32)
        s = 1.7
        dst = s * src @ R.T + t
        s_e, R_e, t_e = procrustes.umeyama(jnp.asarray(src), jnp.asarray(dst),
                                           with_scale=True)
        assert abs(float(s_e) - s) < 1e-3
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-3)

    def test_ransac_with_outliers(self):
        rng = np.random.RandomState(1)
        src = rng.randn(200, 3).astype(np.float32) + [0, 0, 4]
        R = np.asarray(so3.exp(jnp.asarray([0.05, 0.3, -0.1])))
        t = np.asarray([0.3, 0.1, -0.2], np.float32)
        dst = src @ R.T + t
        dst[:40] += rng.randn(40, 3) * 2.0         # 20% outliers
        res = procrustes.ransac_alignment(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(200, bool),
            jax.random.PRNGKey(0), threshold=0.05)
        assert int(res.n_inliers) > 140
        np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)


@pytest.mark.slow
class TestSim3Opt:
    def test_recovers_relative_pose(self):
        rng = np.random.RandomState(2)
        # Landmarks + two cameras with known relative.
        X_c2 = rng.uniform([-2, -1.5, 2], [2, 1.5, 6], (150, 3)).astype(np.float32)
        S12_gt = Sim3.from_se3(
            jnp.asarray(np.asarray(so3.exp(jnp.asarray([0.05, 0.2, -0.03])))),
            jnp.asarray([0.3, -0.1, 0.2]))
        X_c1 = np.asarray(S12_gt.apply(jnp.asarray(X_c2)))
        uv1 = np.asarray(cam_ops.project(CAM, jnp.asarray(X_c1)))
        uv2 = np.asarray(cam_ops.project(CAM, jnp.asarray(X_c2)))
        inb = (uv1 > 10).all(1) & (uv1 < [630, 470]).all(1) \
            & (uv2 > 10).all(1) & (uv2 < [630, 470]).all(1)

        # Perturbed init.
        from coebslam_tpu.geometry import sim3 as s3
        S0 = s3.exp(jnp.asarray([0.02, -0.03, 0.01, 0.05, 0.05, -0.05, 0.0])
                    ).compose(S12_gt)
        res = sim3_opt.optimize_sim3(
            S0, jnp.asarray(X_c1), jnp.asarray(X_c2),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(inb), CAM, OPT,
            fix_scale=True)
        assert int(res.n_inliers) > 0.9 * inb.sum()
        err = rot_err_deg(np.asarray(res.S12.R), np.asarray(S12_gt.R))
        assert err < 0.1, err
        np.testing.assert_allclose(np.asarray(res.S12.t),
                                   np.asarray(S12_gt.t), atol=5e-3)
