"""Round-trip and analytic-Jacobian checks for the Lie-group / camera core
(SURVEY §7.2 step 1 test requirement)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coebslam_tpu.geometry import so3, se3, sim3, camera
from coebslam_tpu.config import CameraConfig


def rand_w(key, n, scale=1.0):
    """Random rotation vectors with |w| < min(scale, 2.8) so exp/log
    round-trips are well-defined (log returns the wrapped branch past pi)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (n, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    theta = jax.random.uniform(k2, (n, 1)) * min(scale, 2.8)
    return axis * theta


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w = rand_w(key, 64, scale=1.0)
        R = so3.exp(w)
        w2 = so3.log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)

    def test_exp_is_rotation(self):
        w = rand_w(jax.random.PRNGKey(1), 32, scale=2.0)
        R = so3.exp(w)
        eye = jnp.eye(3)[None].repeat(32, 0)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)),
                                   np.asarray(eye), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_exp_zero(self):
        R = so3.exp(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)

    def test_small_angle(self):
        w = jnp.array([1e-9, -1e-9, 1e-9])
        R = so3.exp(w)
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(so3.log(R)), np.asarray(w),
                                   atol=1e-7)

    def test_quat_matrix_roundtrip(self):
        w = rand_w(jax.random.PRNGKey(2), 64, scale=2.0)
        R = so3.exp(w)
        q = so3.matrix_to_quat(R)
        R2 = so3.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_left_jacobian_inverse(self):
        w = rand_w(jax.random.PRNGKey(3), 16, scale=1.5)
        J = so3.left_jacobian(w)
        Jinv = so3.left_jacobian_inv(w)
        eye = jnp.eye(3)[None].repeat(16, 0)
        np.testing.assert_allclose(np.asarray(J @ Jinv), np.asarray(eye),
                                   atol=1e-4)

    def test_log_near_pi(self):
        axis = jnp.array([1.0, 0.0, 0.0])
        w = axis * 3.1
        R = so3.exp(w)
        w2 = so3.log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(4)
        w = rand_w(key, 32, scale=2.5)
        v = jax.random.normal(jax.random.PRNGKey(40), (32, 3))
        xi = jnp.concatenate([w, v], axis=-1)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (8, 6))
        T = se3.exp(xi)
        I = T.compose(T.inverse())
        np.testing.assert_allclose(np.asarray(I.R),
                                   np.asarray(jnp.eye(3)[None].repeat(8, 0)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)

    def test_matrix_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(6), (4, 6))
        T = se3.exp(xi)
        T2 = se3.SE3.from_matrix(T.as_matrix())
        np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R), atol=1e-6)
        np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-6)

    def test_transform_points(self):
        T = se3.exp(jnp.array([0.0, 0.0, jnp.pi / 2, 1.0, 0.0, 0.0]))
        p = jnp.array([1.0, 0.0, 0.0])
        p2 = se3.transform_points(T, p)
        # 90 deg about z maps x->y; then translation (computed via V matrix).
        assert np.isfinite(np.asarray(p2)).all()
        # Compose consistency: T.apply == R@p + t
        expected = T.R @ p + T.t
        np.testing.assert_allclose(np.asarray(p2), np.asarray(expected), atol=1e-6)

    def test_retract_identity(self):
        T = se3.SE3.identity()
        xi = jnp.array([0.1, -0.2, 0.05, 0.3, 0.1, -0.4])
        T2 = se3.retract(T, xi)
        T3 = se3.exp(xi)
        np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T3.R), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(7)
        xi = jax.random.normal(key, (32, 7)) * 0.5
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_identity(self):
        S = sim3.exp(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.t), 0.0, atol=1e-6)

    def test_compose_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(8), (8, 7)) * 0.5
        S = sim3.exp(xi)
        I = S.compose(S.inverse())
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-4)

    def test_apply_scale(self):
        S = sim3.Sim3(jnp.array(2.0), jnp.eye(3), jnp.zeros(3))
        p = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(S.apply(p)), [2.0, 4.0, 6.0],
                                   atol=1e-6)

    def test_se3_consistency(self):
        """Sim3 with s=1 must match SE3."""
        xi6 = jax.random.normal(jax.random.PRNGKey(9), (4, 6)) * 0.5
        xi7 = jnp.concatenate([xi6, jnp.zeros((4, 1))], axis=-1)
        S = sim3.exp(xi7)
        T = se3.exp(xi6)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(T.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(T.t), atol=1e-4)


class TestCamera:
    cam = CameraConfig()

    def test_project_unproject(self):
        key = jax.random.PRNGKey(10)
        uv = jax.random.uniform(key, (128, 2)) * jnp.array([640.0, 480.0])
        depth = jax.random.uniform(jax.random.PRNGKey(11), (128,)) * 5.0 + 0.5
        pts = camera.unproject(self.cam, uv, depth)
        uv2 = camera.project(self.cam, pts)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_stereo_projection(self):
        pts = jnp.array([[0.5, 0.2, 2.0]])
        uvr = camera.project_stereo(self.cam, pts)
        assert uvr.shape == (1, 3)
        np.testing.assert_allclose(
            np.asarray(uvr[0, 2]), np.asarray(uvr[0, 0]) - self.cam.bf / 2.0,
            atol=1e-4)

    def test_in_frustum(self):
        pts = jnp.array([[0.0, 0.0, 2.0],     # center, in
                         [0.0, 0.0, -1.0],    # behind
                         [100.0, 0.0, 1.0]])  # way off-image
        mask = camera.in_frustum(self.cam, pts)
        assert mask.tolist() == [True, False, False]

    def test_undistort_identity_when_no_distortion(self):
        uv = jnp.array([[100.0, 200.0]])
        np.testing.assert_allclose(np.asarray(camera.undistort_points(self.cam, uv)),
                                   np.asarray(uv))

    def test_undistort_inverts_distortion(self):
        import dataclasses
        cam = dataclasses.replace(self.cam, k1=-0.2, k2=0.05, p1=0.001, p2=-0.001)
        uv_true = jnp.array([[320.0, 240.0], [100.0, 80.0], [600.0, 400.0]])
        x = (uv_true[..., 0] - cam.cx) / cam.fx
        y = (uv_true[..., 1] - cam.cy) / cam.fy
        xy_d = camera.distort_normalized(cam, jnp.stack([x, y], -1))
        uv_dist = jnp.stack([xy_d[..., 0] * cam.fx + cam.cx,
                             xy_d[..., 1] * cam.fy + cam.cy], axis=-1)
        uv_rec = camera.undistort_points(cam, uv_dist, iterations=10)
        np.testing.assert_allclose(np.asarray(uv_rec), np.asarray(uv_true),
                                   atol=0.1)
