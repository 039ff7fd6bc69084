"""Global bundle adjustment: chunked-assembly equivalence, convergence,
and the arena-level driver (Optimizer::GlobalBundleAdjustemnt parity,
Optimizer.cc:41-237)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from coebslam_tpu.config import (CameraConfig, MapConfig, OptimizerConfig,
                                 OrbConfig, SystemConfig, TrackingConfig)
from coebslam_tpu.geometry import se3 as se3_mod
from coebslam_tpu.geometry import camera as cam_ops
from coebslam_tpu.optim import local_ba

CAM = CameraConfig(width=64, height=48, fx=50.0, fy=50.0, cx=32.0, cy=24.0,
                   bf=5.0)
OPT = OptimizerConfig()


def make_problem(K=8, P=256, M=4, noise=0.02, seed=0):
    """Synthetic multi-view problem with exact observations + perturbed
    initial state."""
    rng = np.random.RandomState(seed)
    pts = rng.randn(P, 3).astype(np.float32) * 0.8 + np.array([0, 0, 4],
                                                              np.float32)
    xi = 0.08 * rng.randn(K, 6).astype(np.float32)
    xi[0] = 0
    poses = se3_mod.exp(jnp.asarray(xi))
    obs_kf = np.stack([rng.permutation(K)[:M] for _ in range(P)]).astype(
        np.int32)
    pc = se3_mod.transform_points(
        se3_mod.SE3(poses.R[obs_kf], poses.t[obs_kf]),
        jnp.asarray(pts)[:, None, :])
    uvr = cam_ops.project_stereo(CAM, pc)
    # Perturb initial state (not the anchor).
    xi_p = xi + np.concatenate(
        [np.zeros((1, 6), np.float32),
         noise * rng.randn(K - 1, 6).astype(np.float32)])
    poses_p = se3_mod.exp(jnp.asarray(xi_p))
    return local_ba.BAProblem(
        kf_R=poses_p.R, kf_t=poses_p.t,
        kf_fixed=jnp.arange(K) == 0, kf_valid=jnp.ones(K, bool),
        pt_pos=jnp.asarray(pts + noise * rng.randn(P, 3).astype(np.float32)),
        pt_valid=jnp.ones(P, bool),
        obs_kf=jnp.asarray(obs_kf), obs_uvr=uvr,
        obs_w=jnp.ones((P, M)), obs_valid=jnp.ones((P, M), bool)), pts, poses


def mean_chi2(prob):
    e, _, _, _ = local_ba._residuals_jacobians(prob, CAM)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_w
    return float(jnp.where(prob.obs_valid, chi2, 0).sum()
                 / prob.obs_valid.sum())


@pytest.mark.slow
class TestChunkedSchur:
    def test_chunked_matches_unchunked(self):
        """Point-block streaming is algebraically exact: one chunked GN
        step equals one monolithic step."""
        prob, _, _ = make_problem()
        a = local_ba._gn_iteration(prob, CAM, jnp.bool_(True), OPT.chi2_mono,
                                   OPT.chi2_stereo, 1e-5)
        b = local_ba._gn_iteration_chunked(prob, CAM, jnp.bool_(True),
                                           OPT.chi2_mono, OPT.chi2_stereo,
                                           1e-5, n_blocks=4)
        # f32 accumulation order differs across blocks — tolerance covers
        # only rounding, not algebra.
        np.testing.assert_allclose(np.asarray(a.kf_t), np.asarray(b.kf_t),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a.pt_pos), np.asarray(b.pt_pos),
                                   rtol=0, atol=1e-4)

    def test_global_ba_converges(self):
        prob, pts_gt, poses_gt = make_problem(noise=0.03)
        before = mean_chi2(prob)
        res = local_ba.optimize_global_ba(prob, CAM, OPT, n_blocks=4)
        after_prob = prob._replace(kf_R=res.kf_R, kf_t=res.kf_t,
                                   pt_pos=res.pt_pos)
        after = mean_chi2(after_prob)
        assert after < before * 0.01, (before, after)
        # Poses recover ground truth (anchor pins the gauge).
        err_t = np.linalg.norm(np.asarray(res.kf_t) - np.asarray(poses_gt.t),
                               axis=1)
        assert err_t.max() < 2e-3, err_t


@pytest.mark.slow
class TestGlobalBADriver:
    def test_arena_gba_fixes_perturbation(self):
        """Track a short synthetic sequence, corrupt all non-anchor KF poses
        and points, run GlobalBA.run -> reprojection recovers."""
        from coebslam_tpu.slam.global_ba import GlobalBA
        from coebslam_tpu.slam.local_mapping import LocalMapper
        from coebslam_tpu.slam.tracking import Tracker
        from coebslam_tpu.utils import synthetic

        cfg = SystemConfig(
            camera=CameraConfig(),
            orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
            map=MapConfig(max_keyframes=64, max_points=16384),
            tracking=TrackingConfig(max_frames_between_kf=5))
        planes = synthetic.make_room(seed=0)
        poses = synthetic.camera_trajectory(24, radius=0.35)[:12]
        render = jax.jit(
            lambda p: synthetic.render(cfg.camera, p, planes)[:2])
        tracker = Tracker(cfg)
        mapper = LocalMapper(cfg, tracker.map)
        tracker.on_keyframe = mapper.process_keyframe
        for i, p in enumerate(poses):
            g, d = render(p)
            tracker.process_frame(np.asarray(g), np.asarray(d), stamp=i / 30.0)
        m = tracker.map
        kfs = m.valid_keyframes()
        assert len(kfs) >= 4

        saved_R = m.kf_R.copy()
        saved_t = m.kf_t.copy()
        rng = np.random.RandomState(1)
        for k in kfs[1:]:
            m.kf_t[k] += 0.02 * rng.randn(3).astype(np.float32)
        m.mark_poses_dirty()
        m.bump()

        gba = GlobalBA(cfg)
        n = gba.run(m, fixed_kf=int(kfs[0]))
        assert n == len(kfs)
        # Perturbed poses pulled back toward their tracked values.
        err = np.linalg.norm(m.kf_t[kfs] - saved_t[kfs], axis=1)
        assert err.max() < 0.01, err
