"""End-to-end loop closing: a camera circuit with injected odometry drift
must fire the full loop pipeline — BoW detection, Sim3, correction,
SearchAndFuse, essential graph, global BA — and measurably reduce ATE
(the reference's whole LoopClosing thread, LoopClosing.cc:58-777)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import (CameraConfig, LoopConfig, MapConfig,
                                 OrbConfig, SystemConfig, TrackingConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.geometry.se3 import SE3
from coebslam_tpu.slam import vocabulary as voc_mod
from coebslam_tpu.slam.system import System
from coebslam_tpu.utils import synthetic

N_CIRCUIT = 96       # frames for the full circuit
N_OVERLAP = 14       # frames past closure (re-visiting the start)
DEPTH_BIAS = 1.06    # systematic depth scale error -> translation drift


def loop_config():
    return SystemConfig(
        camera=CameraConfig(),
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        map=MapConfig(max_keyframes=128, max_points=32768),
        tracking=TrackingConfig(max_frames_between_kf=4,
                                # drifted odometry is still smooth
                                max_translation_per_frame=0.5),
        loop=LoopConfig(min_score_factor=0.7, min_total_matches=30),
        use_dynamic_filtering=False,
    )


def six_wall_room(seed=0, size=6.0, height=2.5):
    """make_room plus a front wall so a full yaw circuit always sees
    texture (the default room is open at z=-s)."""
    planes = list(synthetic.make_room(seed=seed, size=size, height=height))
    rng = np.random.RandomState(seed + 7)
    s, h = size / 2.0, height / 2.0
    front = synthetic.Plane(
        jnp.asarray([-s, -h, -s], jnp.float32),
        jnp.asarray([size, 0, 0], jnp.float32),
        jnp.asarray([0, height, 0], jnp.float32),
        jnp.asarray(synthetic._smooth_noise(rng)))
    return tuple(planes + [front])


def circuit_poses(n):
    """Camera centres on a circle r=1.0, facing tangentially (heading):
    views diverge over the circuit and re-align at closure."""
    poses = []
    for i in range(n):
        a = 2.0 * np.pi * (i % N_CIRCUIT) / N_CIRCUIT
        c = np.array([np.sin(a), 0.0, -np.cos(a)], np.float32)
        yaw = a            # face along the direction of travel
        Rwc = synthetic._rot_y(yaw).astype(np.float32)
        Rcw = Rwc.T
        poses.append(SE3(jnp.asarray(Rcw), jnp.asarray(-Rcw @ c)))
    return poses


@pytest.fixture(scope="module")
def loop_run():
    cfg = loop_config()
    planes = six_wall_room()
    n = N_CIRCUIT + N_OVERLAP
    poses = circuit_poses(n)
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[:2])

    # Scene vocabulary from a handful of views around the circuit.
    from coebslam_tpu.ops import extractor
    descs = []
    ex = jax.jit(lambda g: extractor.extract(g, cfg.orb))
    for i in range(0, N_CIRCUIT, 12):
        g, _ = render(poses[i])
        f = ex(g)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = voc_mod.train(np.concatenate(descs)[:6000], branching=8, depth=3,
                        seed=0)

    sysm = System(cfg, vocabulary=voc)
    pre_closure_traj = None
    closed_at = None
    for i, pose in enumerate(poses):
        gray, depth = render(pose)
        sysm.track_rgbd(gray, np.asarray(depth) * DEPTH_BIAS, stamp=i / 30.0)
        if sysm.loop_closer.n_loops_closed > 0 and closed_at is None:
            closed_at = i
        if closed_at is None:
            # Keep a snapshot of the drifted estimate right up to closure.
            pre_closure_traj = [(s, R.copy(), t.copy())
                                for s, R, t in sysm.tracker.trajectory]
    sysm.shutdown()
    return cfg, sysm, poses, pre_closure_traj, closed_at


def _ate_of(traj, poses):
    est = np.asarray([-R.T @ t for _, R, t in traj])
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    m = min(len(est), len(gt))
    stamps = np.arange(m) / 30.0
    return ate.ate_rmse(stamps, est[:m], stamps[:m], gt[:m])["rmse"]


class TestLoopE2E:
    def test_loop_fires(self, loop_run):
        _, sysm, _, _, closed_at = loop_run
        assert sysm.loop_closer.n_loops_closed >= 1, \
            getattr(sysm.loop_closer, "last_debug", None)
        assert closed_at is not None and closed_at >= N_CIRCUIT - 20

    def test_drift_reduced(self, loop_run):
        """Post-closure exported trajectory must beat the drifted
        pre-closure estimate."""
        _, sysm, poses, pre, _ = loop_run
        assert pre is not None
        ate_pre = _ate_of(pre, poses)
        exported = sysm.tracker.export_trajectory()
        ate_post = _ate_of(exported, poses)
        # Drift must be real (the bias worked) and the closure must help.
        assert ate_pre > 0.02, ate_pre
        assert ate_post < ate_pre * 0.8, (ate_pre, ate_post)

    def test_fused_connections_exist(self, loop_run):
        """SearchAndFuse must create cross-loop covisibility links."""
        _, sysm, _, _, _ = loop_run
        assert len(getattr(sysm.loop_closer, "_fused_edges", [])) >= 1
