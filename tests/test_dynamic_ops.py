"""Dynamic front-end kernels vs OpenCV oracles + synthetic geometry."""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from coebslam_tpu.config import SystemConfig, DynamicConfig
from coebslam_tpu.ops import blur as blur_ops
from coebslam_tpu.ops import fundamental, lk_flow
from coebslam_tpu.slam import dynamic as dyn_mod
from coebslam_tpu.utils import synthetic


def texture(h=240, w=320, seed=0):
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    img = sum(gaussian_filter(rng.randn(h, w), s) * a
              for s, a in [(1.5, 1.0), (4, 1.5), (8, 2.0)])
    img -= img.min()
    return (img / img.max() * 255).astype(np.float32)


class TestGoodFeatures:
    def test_finds_corners_and_respects_spacing(self):
        img = texture(seed=1)
        uv, valid = lk_flow.good_features(jnp.asarray(img), 300)
        n = int(valid.sum())
        assert n > 100
        pts = np.asarray(uv)[np.asarray(valid)]
        assert (pts[:, 0] >= 0).all() and (pts[:, 0] < 320).all()


class TestLKFlow:
    def test_recovers_known_shift(self):
        img = texture(seed=2)
        shift = (7.3, -4.6)
        M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        img2 = cv2.warpAffine(img, M, (320, 240))
        uv, valid = lk_flow.good_features(jnp.asarray(img), 200)
        pyr1 = lk_flow.build_flow_pyramid(jnp.asarray(img))
        pyr2 = lk_flow.build_flow_pyramid(jnp.asarray(img2))
        res = lk_flow.lk_flow(pyr1, pyr2, uv)
        sel = np.asarray(valid & res.valid)
        # keep points far from border (warp leaves an empty band)
        pts = np.asarray(uv)
        inner = sel & (pts[:, 0] > 30) & (pts[:, 0] < 280) \
            & (pts[:, 1] > 30) & (pts[:, 1] < 200)
        flow_vec = np.asarray(res.points)[inner] - pts[inner]
        med = np.median(flow_vec, axis=0)
        np.testing.assert_allclose(med, shift, atol=0.25)

    def test_matches_cv2(self):
        img = texture(seed=3)
        M = cv2.getRotationMatrix2D((160, 120), 2.0, 1.0)
        img2 = cv2.warpAffine(img, M, (320, 240))
        uv, valid = lk_flow.good_features(jnp.asarray(img), 150)
        pts = np.asarray(uv)[np.asarray(valid)].astype(np.float32)

        pyr1 = lk_flow.build_flow_pyramid(jnp.asarray(img))
        pyr2 = lk_flow.build_flow_pyramid(jnp.asarray(img2))
        ours = lk_flow.lk_flow(pyr1, pyr2, jnp.asarray(pts))

        cv_next, cv_status, _ = cv2.calcOpticalFlowPyrLK(
            img.astype(np.uint8), img2.astype(np.uint8),
            pts.reshape(-1, 1, 2), None, winSize=(21, 21), maxLevel=3)
        cv_next = cv_next.reshape(-1, 2)
        ok = (cv_status.ravel() == 1) & np.asarray(ours.valid)
        err = np.linalg.norm(np.asarray(ours.points)[ok] - cv_next[ok], axis=1)
        assert np.median(err) < 0.5, np.median(err)


class TestFundamental:
    def make_two_view(self, key, n=300, outlier_frac=0.2):
        from coebslam_tpu.config import CameraConfig
        from coebslam_tpu.geometry import se3, camera
        cam = CameraConfig()
        ks = jax.random.split(key, 4)
        pts = jnp.stack([
            jax.random.uniform(ks[0], (n,), minval=-2, maxval=2),
            jax.random.uniform(ks[1], (n,), minval=-1.5, maxval=1.5),
            jax.random.uniform(ks[2], (n,), minval=2, maxval=6)], -1)
        pose = se3.exp(jnp.array([0.02, -0.03, 0.01, 0.2, 0.1, 0.05]))
        uv1 = camera.project(cam, pts)
        uv2 = camera.project(cam, se3.transform_points(pose, pts))
        n_out = int(n * outlier_frac)
        noise = jax.random.uniform(ks[3], (n_out, 2), minval=-60, maxval=60)
        uv2 = uv2.at[:n_out].add(noise)
        return uv1, uv2, n_out

    def test_ransac_rejects_outliers(self):
        uv1, uv2, n_out = self.make_two_view(jax.random.PRNGKey(0))
        res = fundamental.find_fundamental_ransac(
            uv1, uv2, jnp.ones(uv1.shape[0], bool), jax.random.PRNGKey(1),
            threshold=1.0)
        inl = np.asarray(res.inliers)
        assert inl[n_out:].mean() > 0.9          # true matches kept
        assert inl[:n_out].mean() < 0.15         # corrupted rejected

    def test_epipolar_constraint_satisfied(self):
        uv1, uv2, n_out = self.make_two_view(jax.random.PRNGKey(2))
        res = fundamental.find_fundamental_ransac(
            uv1, uv2, jnp.ones(uv1.shape[0], bool), jax.random.PRNGKey(3))
        d = np.asarray(fundamental.epipolar_distance(res.F, uv1, uv2))
        assert np.median(d[n_out:]) < 0.5


class TestBlur:
    def test_blurred_box_scores_lower(self):
        img = texture(seed=4)
        blurred = cv2.GaussianBlur(img, (21, 21), 6.0)
        comp = img.copy()
        comp[60:180, 40:150] = blurred[60:180, 40:150]
        boxes = jnp.asarray([[40.0, 60.0, 150.0, 180.0],     # blurred region
                             [180.0, 60.0, 300.0, 180.0],    # sharp region
                             [-1.0, -1.0, -1.0, -1.0]])      # absent
        scores = np.asarray(blur_ops.box_blur_scores(jnp.asarray(comp), boxes))
        assert scores[0] < 0.5 * scores[1]
        assert np.isinf(scores[2])

    def test_alternate_metrics_run(self):
        img = jnp.asarray(texture(seed=5))
        boxes = jnp.asarray([[10.0, 10.0, 100.0, 100.0]])
        for m in ("brenner", "tenengrad", "energy"):
            s = np.asarray(blur_ops.box_blur_scores(img, boxes, metric=m))
            assert np.isfinite(s).all() and (s > 0).all()


@pytest.mark.slow
class TestDynamicFrontend:
    def test_walker_box_flagged_dynamic(self):
        """Moving quad in a static room: its box must be classified dynamic,
        a static decoy box must not."""
        from coebslam_tpu.config import CameraConfig, OrbConfig
        cfg = SystemConfig(
            camera=CameraConfig(width=320, height=240, fx=267.7, fy=269.6,
                                cx=160.0, cy=120.0),
            dynamic=DynamicConfig(n_flow_points=512))
        planes = synthetic.make_room(seed=0)
        # NOTE: the walker needs a motion component NOT parallel to the
        # camera translation — object motion along the epipolar plane is
        # fundamentally invisible to an epipolar-consistency check (the
        # reference inherits the same blind spot).
        quad = synthetic.make_walker(start=(0.3, 0.0, 1.4),
                                     velocity=(0.03, 0.03, 0.0))
        poses = synthetic.camera_trajectory(60, radius=0.2)
        g0, _, b0, _ = synthetic.render(cfg.camera, poses[0], planes, quad, 0)
        g1, _, b1, _ = synthetic.render(cfg.camera, poses[1], planes, quad, 1)

        boxes = jnp.stack([
            b1,
            jnp.asarray([20.0, 20.0, 90.0, 100.0]),        # static decoy
            jnp.full((4,), -1.0),
        ])
        res = dyn_mod.dynamic_frontend(g0, g1, boxes, jax.random.PRNGKey(0),
                                       cfg)
        assert int(res.n_outliers) > 5
        flags = np.asarray(res.box_dynamic)
        assert flags[0], (np.asarray(res.n_outliers), np.asarray(b1))
        assert not flags[1]
        assert not flags[2]
        # Mask covers the dynamic box area only.
        m = np.asarray(res.mask)
        bb = np.asarray(b1).astype(int)
        assert m[(bb[1] + bb[3]) // 2, (bb[0] + bb[2]) // 2]
        assert not m[30, 30]
