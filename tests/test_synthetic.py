"""Synthetic world renderer: geometric consistency checks that anchor every
downstream integration test."""
import numpy as np
import jax.numpy as jnp

from coebslam_tpu.config import CameraConfig
from coebslam_tpu.geometry import se3, camera
from coebslam_tpu.utils import synthetic

CAM = CameraConfig(width=320, height=240, fx=267.7, fy=269.6, cx=160.0, cy=120.0)


class TestSyntheticWorld:
    def test_render_shapes_and_texture(self):
        planes = synthetic.make_room(seed=0)
        pose = synthetic.camera_trajectory(10)[0]
        gray, depth, box, mask = synthetic.render(CAM, pose, planes)
        assert gray.shape == (240, 320) and depth.shape == (240, 320)
        g = np.asarray(gray)
        assert g.std() > 10.0               # textured, not flat
        d = np.asarray(depth)
        assert (d > 0).mean() > 0.99        # closed room: depth everywhere
        assert d[d > 0].max() < 20.0

    def test_depth_backprojection_consistency(self):
        """Unprojecting pixel depths through the GT pose and reprojecting in
        a second view must land on pixels with matching depth."""
        planes = synthetic.make_room(seed=0)
        traj = synthetic.camera_trajectory(30)
        p1, p2 = traj[0], traj[3]
        gray1, depth1, *_ = synthetic.render(CAM, p1, planes)
        gray2, depth2, *_ = synthetic.render(CAM, p2, planes)

        ys, xs = np.mgrid[40:200:20, 40:280:20]
        uv = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
        d = jnp.asarray(np.asarray(depth1)[ys.ravel(), xs.ravel()])
        pts_c1 = camera.unproject(CAM, uv, d)
        pts_w = se3.transform_points(p1.inverse(), pts_c1)
        pts_c2 = se3.transform_points(p2, pts_w)
        uv2 = camera.project(CAM, pts_c2)

        inb = (np.asarray(uv2)[:, 0] > 5) & (np.asarray(uv2)[:, 0] < 315) \
            & (np.asarray(uv2)[:, 1] > 5) & (np.asarray(uv2)[:, 1] < 235)
        u2 = np.asarray(uv2)[inb]
        z2_pred = np.asarray(pts_c2)[inb, 2]
        z2_map = np.asarray(depth2)[np.clip(u2[:, 1].round().astype(int), 0, 239),
                                    np.clip(u2[:, 0].round().astype(int), 0, 319)]
        # Most points should agree (occlusion boundaries excepted).
        rel = np.abs(z2_pred - z2_map) / z2_map
        assert np.median(rel) < 0.02, np.median(rel)

    def test_moving_quad_box_and_mask(self):
        planes = synthetic.make_room(seed=0)
        quad = synthetic.make_walker(start=(0.0, 0.2, 1.5))
        pose = synthetic.camera_trajectory(10)[0]
        gray, depth, box, mask = synthetic.render(CAM, pose, planes, quad,
                                                  frame_idx=0)
        b = np.asarray(box)
        assert (b >= 0).all(), b
        m = np.asarray(mask)
        assert m.any()
        ys, xs = np.nonzero(m)
        assert xs.min() >= b[0] - 1 and xs.max() <= b[2] + 1
        assert ys.min() >= b[1] - 1 and ys.max() <= b[3] + 1

    def test_quad_moves_between_frames(self):
        planes = synthetic.make_room(seed=0)
        quad = synthetic.make_walker(start=(0.0, 0.2, 1.5), velocity=(0.05, 0, 0))
        pose = synthetic.camera_trajectory(10)[0]
        _, _, b0, _ = synthetic.render(CAM, pose, planes, quad, frame_idx=0)
        _, _, b5, _ = synthetic.render(CAM, pose, planes, quad, frame_idx=5)
        assert float(b5[0]) > float(b0[0])   # moved right in image
