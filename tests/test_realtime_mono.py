"""Zero-sync MONOCULAR realtime mode: in-graph two-view initialization
(`realtime._mono_init` + `initializer_ops.reconstruct_graph`) and
triangulation-based point spawning, with no host readback until
finish() — the reference's monocular pipeline (Tracking.cc:631-821,
Initializer.cc:44, LocalMapping::CreateNewMapPoints) in the realtime
regime.  Scale is free (normalized to median scene depth 1), so ATE is
scored with similarity (Sim3) Horn alignment."""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from coebslam_tpu.config import (CameraConfig, OrbConfig, SystemConfig,
                                 TrackingConfig)
from coebslam_tpu.eval import ate
from coebslam_tpu.slam.realtime import RealtimeSlam, RTLimits
from coebslam_tpu.utils import synthetic


def test_zero_sync_monocular_tracks_and_maps():
    cfg = SystemConfig(
        camera=CameraConfig(),
        orb=OrbConfig(max_keypoints=1024, n_levels=4, n_features=1000),
        tracking=TrackingConfig(max_frames_between_kf=10),
        sensor="monocular",
        use_dynamic_filtering=False)
    planes = synthetic.make_room(seed=0)
    n = 60
    # Strong lateral translation for initialization parallax.
    poses = synthetic.camera_trajectory(n, radius=0.8)
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[0])

    lim = RTLimits(max_kf=16, spawn_per_kf=256, ba_window=6,
                   local_window=6, max_frames=128)
    rt = RealtimeSlam(cfg, lim)
    for i, p in enumerate(poses):
        rt.track_mono(np.asarray(render(p)), stamp=i / 30.0)
    rt.block()
    res = rt.finish()

    ok = res["ok"]
    assert res["n_kf"] >= 3, f"only {res['n_kf']} keyframes"
    # Initialization may take a few frames; after that tracking holds.
    first_ok = int(np.argmax(ok)) if ok.any() else n
    assert first_ok <= 10, f"never initialized (first ok {first_ok})"
    assert ok[first_ok:].sum() >= (n - first_ok) - 3, \
        f"{int(ok.sum())}/{n} ok"

    gt = np.asarray([-np.asarray(p.R).T @ np.asarray(p.t) for p in poses])
    est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
    sel = np.nonzero(ok)[0]
    r = ate.ate_rmse(res["stamps"][sel], est[sel],
                     np.arange(n) / 30.0, gt, with_scale=True)
    assert r["rmse"] < 0.05, f"mono realtime ATE {r['rmse']*100:.2f} cm"
