"""Pose-only GN: convergence, outlier gating, stereo/mono mixing."""
import numpy as np
import jax
import jax.numpy as jnp

from coebslam_tpu.config import CameraConfig, OptimizerConfig
from coebslam_tpu.geometry import se3, camera
from coebslam_tpu.geometry.se3 import SE3
from coebslam_tpu.optim import pose_gn

CAM = CameraConfig()
OPT = OptimizerConfig()


def make_problem(key, n=200, stereo_frac=0.5, noise_px=0.3):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # Points in front of the camera.
    pts_cam = jnp.stack([
        jax.random.uniform(k1, (n,), minval=-1.5, maxval=1.5),
        jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0),
        jax.random.uniform(k3, (n,), minval=1.5, maxval=5.0)], axis=-1)
    pose_gt = se3.exp(jnp.array([0.03, -0.05, 0.02, 0.1, -0.05, 0.15]))
    pts_w = se3.transform_points(pose_gt.inverse(), pts_cam)
    obs = camera.project_stereo(CAM, pts_cam)
    noise = noise_px * jax.random.normal(k4, (n, 3))
    obs = obs + noise
    is_stereo = jnp.arange(n) < int(n * stereo_frac)
    obs = obs.at[:, 2].set(jnp.where(is_stereo, obs[:, 2], -1.0))
    inv_sigma2 = jnp.ones(n)
    return pose_gt, pts_w, obs, inv_sigma2


class TestPoseGN:
    def test_recovers_pose_from_perturbation(self):
        pose_gt, pts_w, obs, w = make_problem(jax.random.PRNGKey(0))
        pose0 = se3.retract(pose_gt, jnp.array([0.05, -0.04, 0.03, 0.2, 0.1, -0.15]))
        res = pose_gn.optimize_pose(pose0, pts_w, obs, w,
                                    jnp.ones(pts_w.shape[0], bool), CAM, OPT)
        err = se3.log(res.pose.compose(pose_gt.inverse()))
        assert float(jnp.linalg.norm(err)) < 5e-3, np.asarray(err)
        assert int(res.n_inliers) > 180

    def test_rejects_outliers(self):
        pose_gt, pts_w, obs, w = make_problem(jax.random.PRNGKey(1), noise_px=0.2)
        n = pts_w.shape[0]
        # Corrupt 25% of observations badly.
        n_bad = n // 4
        obs = obs.at[:n_bad, 0].add(40.0)
        pose0 = se3.retract(pose_gt, jnp.array([0.02, 0.02, -0.02, 0.1, -0.1, 0.05]))
        res = pose_gn.optimize_pose(pose0, pts_w, obs, w, jnp.ones(n, bool),
                                    CAM, OPT)
        err = se3.log(res.pose.compose(pose_gt.inverse()))
        assert float(jnp.linalg.norm(err)) < 1e-2, np.asarray(err)
        # The corrupted observations must be classified outliers.
        assert int(res.inliers[:n_bad].sum()) < n_bad // 4
        assert int(res.inliers[n_bad:].sum()) > (n - n_bad) * 3 // 4

    def test_respects_validity_mask(self):
        pose_gt, pts_w, obs, w = make_problem(jax.random.PRNGKey(2))
        n = pts_w.shape[0]
        valid = jnp.arange(n) < n // 2
        # Garbage in the invalid half must not affect the solve.
        obs = obs.at[n // 2:, :2].set(10000.0)
        pose0 = se3.retract(pose_gt, jnp.array([0.03, 0.0, 0.0, 0.1, 0.0, 0.0]))
        res = pose_gn.optimize_pose(pose0, pts_w, obs, w, valid, CAM, OPT)
        err = se3.log(res.pose.compose(pose_gt.inverse()))
        assert float(jnp.linalg.norm(err)) < 1e-2
        assert not bool(res.inliers[n // 2:].any())

    def test_jit_and_stability_with_zero_valid(self):
        """All-invalid input must not NaN (important for the lost state)."""
        pose_gt, pts_w, obs, w = make_problem(jax.random.PRNGKey(3))
        n = pts_w.shape[0]
        f = jax.jit(lambda p0, pts, o, ww, v:
                    pose_gn.optimize_pose(p0, pts, o, ww, v, CAM, OPT))
        res = f(pose_gt, pts_w, obs, w, jnp.zeros(n, bool))
        assert np.isfinite(np.asarray(res.pose.t)).all()
        assert int(res.n_inliers) == 0
