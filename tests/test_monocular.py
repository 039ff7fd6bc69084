"""Monocular pipeline: two-view initializer ops + end-to-end mono tracking
with triangulation-only map growth (restores the path the fork broke,
SURVEY §2.5)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                 SystemConfig, TrackingConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.geometry import se3, so3, camera as cam_ops
from coebslam_tpu.ops import initializer_ops
from coebslam_tpu.utils import synthetic

CAM = CameraConfig()


def two_view_scene(key, n=300, planar=False):
    ks = jax.random.split(key, 4)
    if planar:
        X = jnp.stack([
            jax.random.uniform(ks[0], (n,), minval=-2, maxval=2),
            jax.random.uniform(ks[1], (n,), minval=-1.5, maxval=1.5),
            jnp.full((n,), 4.0)], -1)
    else:
        X = jnp.stack([
            jax.random.uniform(ks[0], (n,), minval=-2, maxval=2),
            jax.random.uniform(ks[1], (n,), minval=-1.5, maxval=1.5),
            jax.random.uniform(ks[2], (n,), minval=2.5, maxval=7.0)], -1)
    T2 = se3.exp(jnp.asarray([0.02, -0.04, 0.01, 0.3, 0.05, 0.02]))
    uv1 = cam_ops.project(CAM, X)
    uv2 = cam_ops.project(CAM, se3.transform_points(T2, X))
    noise = 0.3 * jax.random.normal(ks[3], uv1.shape)
    inb = ((uv1 > 5) & (uv1 < jnp.asarray([635.0, 475.0]))).all(1) \
        & ((uv2 > 5) & (uv2 < jnp.asarray([635.0, 475.0]))).all(1)
    return uv1 + noise, uv2 + noise, inb, X, T2


class TestInitializerOps:
    def test_general_scene_uses_fundamental(self):
        uv1, uv2, inb, X, T2 = two_view_scene(jax.random.PRNGKey(0))
        res = initializer_ops.reconstruct(uv1, uv2, inb, CAM,
                                          jax.random.PRNGKey(1))
        assert bool(res.ok)
        assert not res.used_homography
        # Rotation recovered; translation up to scale.
        dR = np.asarray(res.R) @ np.asarray(se3.exp(
            jnp.asarray([0.02, -0.04, 0.01, 0.3, 0.05, 0.02])).R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5, ang
        t_gt = np.asarray(T2.t)
        t_est = np.asarray(res.t)
        cos = abs(t_est @ t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
        assert cos > 0.999

    def test_planar_scene_uses_homography(self):
        uv1, uv2, inb, X, T2 = two_view_scene(jax.random.PRNGKey(2),
                                              planar=True)
        res = initializer_ops.reconstruct(uv1, uv2, inb, CAM,
                                          jax.random.PRNGKey(3))
        assert res.used_homography
        assert bool(res.ok)
        dR = np.asarray(res.R) @ np.asarray(T2.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, ang

    def test_triangulation_accuracy(self):
        uv1, uv2, inb, X, T2 = two_view_scene(jax.random.PRNGKey(4))
        res = initializer_ops.reconstruct(uv1, uv2, inb, CAM,
                                          jax.random.PRNGKey(5))
        good = np.asarray(res.good)
        # Points are in camera-1 frame == world here.  Allow scale: estimate
        # scale from medians.
        Xe = np.asarray(res.points)[good]
        Xg = np.asarray(X)[good]
        s = np.median(Xg[:, 2]) / np.median(Xe[:, 2])
        err = np.linalg.norm(Xe * s - Xg, axis=1)
        assert np.median(err) < 0.1, np.median(err)


@pytest.mark.slow
class TestMonocularE2E:
    def test_tracks_and_maps(self):
        from coebslam_tpu.slam.system import System
        cfg = SystemConfig(
            camera=CameraConfig(),
            orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
            map=MapConfig(max_keyframes=64, max_points=16384),
            tracking=TrackingConfig(max_frames_between_kf=10),
            sensor="monocular")
        planes = synthetic.make_room(seed=0)
        n_frames = 25
        # Strong lateral translation for initialization parallax.
        poses = synthetic.camera_trajectory(60, radius=0.8)[:n_frames]
        render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[0])

        sysm = System(cfg)
        states = []
        for i, pose in enumerate(poses):
            gray = render(pose)
            state, n = sysm.track_monocular(gray, stamp=i / 30.0)
            states.append(state)
        assert "OK" in states, states
        first_ok = states.index("OK")
        assert first_ok <= 10, states
        # Once initialized, it should mostly stay OK.
        ok_after = states[first_ok:].count("OK")
        assert ok_after >= len(states[first_ok:]) - 3, states
        assert len(sysm.map.valid_points()) > 100

        # ATE with similarity alignment (mono scale is arbitrary).
        R0, t0 = np.asarray(poses[0].R), np.asarray(poses[0].t)
        gt, est, stamps = [], [], []
        for (stamp, R, t), pose in zip(sysm.tracker.trajectory[first_ok:],
                                       poses[first_ok:]):
            Rg = np.asarray(pose.R) @ R0.T
            tg = np.asarray(pose.t) - Rg @ t0
            gt.append(-Rg.T @ tg)
            est.append(-R.T @ t)
            stamps.append(stamp)
        est, gt = np.asarray(est), np.asarray(gt)
        # Similarity (scale) alignment via Umeyama on trajectories.
        from coebslam_tpu.ops import procrustes
        s, R, t = procrustes.umeyama(jnp.asarray(est), jnp.asarray(gt),
                                     with_scale=True)
        aligned = float(s) * est @ np.asarray(R).T + np.asarray(t)
        rmse = float(np.sqrt(((aligned - gt) ** 2).sum(1).mean()))
        assert rmse < 0.25, rmse


class TestMonocularRelocalization:
    def test_kidnap_and_relocalize_depth_free(self):
        """Monocular kidnap test: initialize + map, go LOST on black
        frames, return to a seen viewpoint and relocalize — must succeed
        with NO depth anywhere (exercises the EPnP path of
        slam/relocalization.py; PnPsolver.cc:67-341 parity)."""
        from coebslam_tpu.ops import extractor
        from coebslam_tpu.slam import vocabulary as voc_mod
        from coebslam_tpu.slam.system import System

        cfg = SystemConfig(
            camera=CameraConfig(),
            orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
            map=MapConfig(max_keyframes=64, max_points=16384),
            tracking=TrackingConfig(max_frames_between_kf=6,
                                    reset_if_lost_with_kfs_below=2),
            sensor="monocular")
        planes = synthetic.make_room(seed=0)
        n_frames = 22
        poses = synthetic.camera_trajectory(60, radius=0.8)[:n_frames]
        render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[0])
        frames = [render(p) for p in poses]

        # Tiny trained vocab from the scene's own descriptors.
        ex = jax.jit(lambda g: extractor.extract(g, cfg.orb))
        descs = []
        for g in frames[::4]:
            feats = ex(g)
            descs.append(np.asarray(feats.desc)[np.asarray(feats.valid)])
        vocab = voc_mod.train(np.concatenate(descs)[:4000],
                              branching=8, depth=3, seed=0)

        sysm = System(cfg, vocabulary=vocab)
        states = []
        for i, g in enumerate(frames):
            state, _ = sysm.track_monocular(g, stamp=i / 30.0)
            states.append(state)
        assert states[-1] == "OK", states
        assert len(sysm.map.valid_keyframes()) >= 2

        # Kidnap: featureless frames until LOST.
        black = jnp.zeros_like(frames[0])
        for j in range(3):
            state, _ = sysm.track_monocular(black,
                                            stamp=(n_frames + j) / 30.0)
        assert sysm.get_tracking_state() == "LOST"

        # Return to a previously-seen viewpoint.
        back = 12
        state, n = sysm.track_monocular(frames[back],
                                        stamp=(n_frames + 4) / 30.0)
        assert state == "OK", (state, n)
        # Pose must be near where the system originally was at that frame
        # (same map => same frame of reference, mono scale included).
        _, R_orig, t_orig = sysm.tracker.trajectory[back]
        c_orig = -np.asarray(R_orig).T @ np.asarray(t_orig)
        R_now = sysm.tracker.state.pose_R
        c_now = -R_now.T @ sysm.tracker.state.pose_t
        assert np.linalg.norm(c_now - c_orig) < 0.15, (c_now, c_orig)
