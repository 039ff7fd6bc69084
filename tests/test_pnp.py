"""Depth-free EPnP solver tests (ops/pnp.py vs PnPsolver.cc:67-341)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coebslam_tpu.config import CameraConfig
from coebslam_tpu.geometry import camera as cam_ops
from coebslam_tpu.ops import pnp


CAM = CameraConfig()


def _scene(seed, n=120, noise_px=0.0, outlier_frac=0.0):
    rng = np.random.RandomState(seed)
    # World points in front of a known camera pose.
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    ang = 0.4 * rng.rand()
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
    t = 0.3 * rng.randn(3)
    # Sample camera-frame points inside the frustum, map back to world.
    z = 1.0 + 3.0 * rng.rand(n)
    u = rng.uniform(40, CAM.width - 40, n)
    v = rng.uniform(40, CAM.height - 40, n)
    pc = np.stack([(u - CAM.cx) * z / CAM.fx,
                   (v - CAM.cy) * z / CAM.fy, z], -1)
    X = (pc - t) @ R            # R^T (pc - t)
    uv = np.stack([u, v], -1)
    uv += noise_px * rng.randn(n, 2)
    n_out = int(outlier_frac * n)
    if n_out:
        uv[:n_out] = rng.uniform(0, CAM.width, (n_out, 2))
    return X.astype(np.float32), uv.astype(np.float32), R, t


def _pose_err(R_est, t_est, R, t):
    dR = np.asarray(R_est) @ R.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return ang, np.linalg.norm(np.asarray(t_est) - t)


class TestEPnP:
    def test_exact_recovery(self):
        X, uv, R, t = _scene(0)
        res = jax.jit(lambda a, b, w: pnp.epnp(a, b, w, CAM))(
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X)))
        ang, dt = _pose_err(res.R, res.t, R, t)
        assert ang < 1e-3 and dt < 1e-3, (ang, dt, float(res.err2))

    def test_noisy_recovery(self):
        X, uv, R, t = _scene(1, noise_px=0.5)
        res = pnp.epnp(jnp.asarray(X), jnp.asarray(uv),
                       jnp.ones(len(X)), CAM)
        ang, dt = _pose_err(res.R, res.t, R, t)
        assert ang < 0.01 and dt < 0.02, (ang, dt)

    def test_weighted_ignores_zero_rows(self):
        X, uv, R, t = _scene(2)
        # Corrupt half the rows but zero their weights.
        uv2 = uv.copy()
        uv2[60:] = 0.0
        w = np.ones(len(X), np.float32)
        w[60:] = 0.0
        res = pnp.epnp(jnp.asarray(X), jnp.asarray(uv2), jnp.asarray(w), CAM)
        ang, dt = _pose_err(res.R, res.t, R, t)
        assert ang < 1e-3 and dt < 1e-2, (ang, dt)


@pytest.mark.slow
class TestRansacEPnP:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_outlier_rejection(self, seed):
        X, uv, R, t = _scene(10 + seed, noise_px=0.3, outlier_frac=0.3)
        res = jax.jit(lambda a, b, v, k: pnp.ransac_epnp(a, b, v, k, CAM))(
            jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X), bool), jax.random.PRNGKey(seed))
        ang, dt = _pose_err(res.R, res.t, R, t)
        assert int(res.n_inliers) > 60, int(res.n_inliers)
        assert ang < 0.02 and dt < 0.05, (ang, dt)
        # Inlier mask must reject the corrupted rows.
        inl = np.asarray(res.inliers)
        assert inl[: int(0.3 * len(X))].mean() < 0.2

    def test_respects_valid_mask(self):
        X, uv, R, t = _scene(20)
        valid = np.ones(len(X), bool)
        valid[::2] = False
        uv2 = uv.copy()
        uv2[::2] = -1000.0      # garbage in invalid rows must not matter
        res = pnp.ransac_epnp(jnp.asarray(X), jnp.asarray(uv2),
                              jnp.asarray(valid), jax.random.PRNGKey(0), CAM)
        ang, dt = _pose_err(res.R, res.t, R, t)
        assert ang < 0.01 and dt < 0.02, (ang, dt)
        assert not np.asarray(res.inliers)[::2].any()
