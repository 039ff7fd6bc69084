"""Realtime -> host-arena handoff (slam/handoff.py): a finished zero-sync
session must reconstruct into a MapArena that the host toolchain can
refine (global BA), checkpoint, and export."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import SystemConfig
from coebslam_tpu.eval import ate
from coebslam_tpu.slam import handoff
from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits
from coebslam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def session():
    cfg = SystemConfig()
    planes = synthetic.make_room(seed=0)
    poses = synthetic.camera_trajectory(36, radius=0.35)
    rt = RealtimeSlam(cfg, RTLimits(max_kf=16, local_window=6,
                                    ba_window=6, max_frames=64))
    for i, p in enumerate(poses):
        out = synthetic.render(cfg.camera, p, planes, None, i)
        rt.track(np.asarray(out[0]), np.asarray(out[1]), stamp=i / 30.0)
    rt.block()
    res = rt.finish()
    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    return cfg, res, gt


class TestHandoff:
    def test_arena_reconstruction(self, session):
        cfg, res, _ = session
        m, kf_ids = handoff.to_arena(res, cfg)
        assert len(kf_ids) == res["n_kf_live"]
        assert len(m.valid_points()) > 300
        # Observations wired: most keyframes see >100 landmarks.
        obs_counts = [(m.kf_obs_pt[k] >= 0).sum() for k in kf_ids]
        assert np.median(obs_counts) > 100, obs_counts
        # Covisibility graph connects the temporal chain.
        nbrs = m.best_covisible(kf_ids[-1], 5)
        assert len(nbrs) >= 1

    def test_depth_and_level_recovery(self, session):
        """ur -> depth and inv_sigma2 -> level inversions must round-trip
        to plausible values."""
        cfg, res, _ = session
        m, kf_ids = handoff.to_arena(res, cfg)
        k = kf_ids[0]
        d = m.kf_depth[k][m.kf_kp_valid[k]]
        assert (d[d > 0] > 0.3).all() and (d[d > 0] < 20.0).all()
        lv = m.kf_level[k][m.kf_kp_valid[k]]
        assert lv.min() >= 0 and lv.max() < cfg.orb.n_levels
        assert (lv > 0).any()                 # multi-scale survived

    def test_global_ba_refines(self, session):
        """The host global BA must run on the reconstructed arena and
        keep (or improve) keyframe accuracy."""
        cfg, res, gt = session
        m, kf_ids, n_opt = handoff.refine(res, cfg)
        assert n_opt == len(kf_ids)
        centers = -np.einsum("kji,kj->ki", m.kf_R[kf_ids], m.kf_t[kf_ids])
        frames = res["kf_frame"]
        # Horn-align first: the realtime session anchors its world at the
        # first camera, which sits ~1.1 m from the renderer's origin.
        stamps = frames / 30.0
        r = ate.ate_rmse(stamps, centers, stamps, gt[frames])
        assert np.isfinite(r["rmse"])
        assert r["rmse"] < 0.02, r["rmse"]

    def test_checkpoint_roundtrip(self, session):
        """The reconstructed arena must survive the standard checkpoint
        path (io/checkpoint), closing realtime -> persist -> resume."""
        import tempfile, os
        from coebslam_tpu.io import checkpoint
        cfg, res, _ = session
        m, kf_ids = handoff.to_arena(res, cfg)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "map.npz")
            checkpoint.save_map(path, m)
            m2 = checkpoint.load_map(path, cfg)
            assert len(m2.valid_keyframes()) == len(kf_ids)
            np.testing.assert_allclose(m2.kf_R[kf_ids], m.kf_R[kf_ids])
