"""Schur-complement local BA: convergence and gauge handling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from coebslam_tpu.config import CameraConfig, OptimizerConfig
from coebslam_tpu.geometry import se3, camera
from coebslam_tpu.geometry.se3 import SE3
from coebslam_tpu.optim import local_ba

CAM = CameraConfig()
OPT = OptimizerConfig()


def build_problem(key, K=4, P=128, M=4, pose_noise=0.02, pt_noise=0.02,
                  px_noise=0.2):
    ks = jax.random.split(key, 8)
    # Ground-truth cameras looking at a point cloud around z ~ 3.
    pts_gt = jnp.stack([
        jax.random.uniform(ks[0], (P,), minval=-2.0, maxval=2.0),
        jax.random.uniform(ks[1], (P,), minval=-1.5, maxval=1.5),
        jax.random.uniform(ks[2], (P,), minval=2.0, maxval=5.0)], -1)
    xi = 0.08 * jax.random.normal(ks[3], (K, 6))
    xi = xi.at[:, 3].add(jnp.linspace(0, 0.4, K))   # baseline spread
    poses_gt = se3.exp(xi)

    obs_kf = jnp.tile(jnp.arange(M)[None, :], (P, 1)).astype(jnp.int32) % K
    pc = se3.transform_points(SE3(poses_gt.R[obs_kf], poses_gt.t[obs_kf]),
                              pts_gt[:, None, :])
    uvr = camera.project_stereo(CAM, pc)
    uvr = uvr + px_noise * jax.random.normal(ks[4], uvr.shape)
    in_img = (pc[..., 2] > 0.1) \
        & (uvr[..., 0] > 0) & (uvr[..., 0] < CAM.width) \
        & (uvr[..., 1] > 0) & (uvr[..., 1] < CAM.height)

    # Perturb initial estimates; first camera fixed (gauge).
    dxi = pose_noise * jax.random.normal(ks[5], (K, 6))
    dxi = dxi.at[0].set(0.0)
    poses0 = se3.retract(poses_gt, dxi)
    pts0 = pts_gt + pt_noise * jax.random.normal(ks[6], (P, 3))

    prob = local_ba.BAProblem(
        kf_R=poses0.R, kf_t=poses0.t,
        kf_fixed=jnp.arange(K) == 0,
        kf_valid=jnp.ones(K, bool),
        pt_pos=pts0, pt_valid=jnp.ones(P, bool),
        obs_kf=obs_kf, obs_uvr=uvr,
        obs_w=jnp.ones((P, M)), obs_valid=in_img)
    return prob, poses_gt, pts_gt


class TestLocalBA:
    @pytest.mark.slow
    def test_converges_to_ground_truth(self):
        prob, poses_gt, pts_gt = build_problem(jax.random.PRNGKey(0))
        res = local_ba.optimize_local_ba(prob, CAM, OPT)
        # Camera error after optimization (first is fixed at its GT pose).
        for k in range(1, 4):
            dR = np.asarray(res.kf_R[k]) @ np.asarray(poses_gt.R[k]).T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            terr = np.linalg.norm(np.asarray(res.kf_t[k] - poses_gt.t[k]))
            assert ang < 0.15, (k, ang)
            assert terr < 0.01, (k, terr)
        pt_err = np.linalg.norm(np.asarray(res.pt_pos - pts_gt), axis=-1)
        # Noise floor: sigma_z ~ z^2 * px_noise / bf ~ 0.045 m per obs.
        assert np.median(pt_err) < 0.03

    def test_improves_over_initialization(self):
        prob, poses_gt, pts_gt = build_problem(jax.random.PRNGKey(1),
                                               pose_noise=0.05, pt_noise=0.05)
        res = local_ba.optimize_local_ba(prob, CAM, OPT)
        init_err = np.linalg.norm(np.asarray(prob.kf_t - poses_gt.t), axis=-1)[1:]
        final_err = np.linalg.norm(np.asarray(res.kf_t - poses_gt.t), axis=-1)[1:]
        assert final_err.mean() < 0.2 * init_err.mean()

    def test_outlier_observations_gated(self):
        prob, poses_gt, pts_gt = build_problem(jax.random.PRNGKey(2))
        bad_uvr = prob.obs_uvr.at[:20, 0, 0].add(50.0)
        prob = prob._replace(obs_uvr=bad_uvr)
        res = local_ba.optimize_local_ba(prob, CAM, OPT)
        ov = np.asarray(res.obs_valid)
        was_valid = np.asarray(prob.obs_valid)
        assert ov[:20, 0].sum() < 5                          # corrupted dropped
        clean = ov[20:][was_valid[20:]]
        assert clean.mean() > 0.9                            # clean retained

    def test_jit_and_fixed_cameras_unchanged(self):
        prob, poses_gt, _ = build_problem(jax.random.PRNGKey(3))
        f = jax.jit(lambda p: local_ba.optimize_local_ba(p, CAM, OPT))
        res = f(prob)
        np.testing.assert_allclose(np.asarray(res.kf_R[0]),
                                   np.asarray(prob.kf_R[0]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.kf_t[0]),
                                   np.asarray(prob.kf_t[0]), atol=1e-7)
        assert np.isfinite(np.asarray(res.pt_pos)).all()
