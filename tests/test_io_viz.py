"""Dataset loaders (KITTI/EuRoC), visualization artifacts, vocabulary
persistence, and the blur-gate frame filter."""
import os

import numpy as np
import pytest

from coebslam_tpu.io import euroc, kitti
from coebslam_tpu.slam import vocabulary as voc_mod
from coebslam_tpu.utils import viz


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint8)).save(path)


class TestKitti:
    def test_load_sequence(self, tmp_path):
        root = tmp_path / "00"
        (root / "image_0").mkdir(parents=True)
        (root / "image_1").mkdir()
        rng = np.random.RandomState(0)
        for i in range(3):
            img = rng.randint(0, 255, (40, 60), np.uint8)
            _write_png(root / "image_0" / f"{i:06d}.png", img)
            _write_png(root / "image_1" / f"{i:06d}.png", img)
        (root / "times.txt").write_text("0.0\n0.1\n0.2\n")
        poses = np.tile(np.eye(3, 4).ravel(), (3, 1))
        pf = tmp_path / "00.txt"
        np.savetxt(pf, poses)

        seq = kitti.load_kitti_sequence(str(root), str(pf))
        assert len(seq) == 3
        stamp, gray = seq.load_frame(1)
        assert stamp == pytest.approx(0.1)
        assert gray.shape == (40, 60) and gray.dtype == np.float32
        _, gl, gr = seq.load_stereo(2)
        assert gl.shape == gr.shape
        assert seq.gt_poses.shape == (3, 3, 4)


class TestEuroc:
    def test_load_sequence(self, tmp_path):
        data = tmp_path / "mav0" / "cam0" / "data"
        data.mkdir(parents=True)
        stamps_ns = [1403636579763555584, 1403636579813555456]
        rng = np.random.RandomState(0)
        lines = ["#timestamp [ns],filename"]
        for s in stamps_ns:
            _write_png(data / f"{s}.png",
                       rng.randint(0, 255, (30, 40), np.uint8))
            lines.append(f"{s},{s}.png")
        (tmp_path / "mav0" / "cam0" / "data.csv").write_text(
            "\n".join(lines) + "\n")
        gt_dir = tmp_path / "mav0" / "state_groundtruth_estimate0"
        gt_dir.mkdir(parents=True)
        (gt_dir / "data.csv").write_text(
            "#ts,px,py,pz,qw,qx,qy,qz\n"
            f"{stamps_ns[0]},1,2,3,1,0,0,0\n")

        seq = euroc.load_euroc_sequence(str(tmp_path))
        assert len(seq) == 2
        stamp, gray = seq.load_frame(0)
        assert stamp == pytest.approx(stamps_ns[0] * 1e-9)
        assert gray.shape == (30, 40)
        assert seq.gt_poses.shape == (1, 7)


class TestViz:
    def test_save_ply(self, tmp_path):
        p = tmp_path / "map.ply"
        pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
        viz.save_ply(str(p), pts, keyframe_positions=np.zeros((2, 3)))
        text = p.read_text()
        assert "element vertex 12" in text
        assert text.count("\n") >= 12 + 10

    def test_draw_frame(self):
        gray = np.full((48, 64), 100.0, np.float32)
        uv = np.asarray([[10.0, 10.0], [30.0, 20.0], [50.0, 40.0]])
        valid = np.asarray([True, True, False])
        pids = np.asarray([5, -1, -1])
        mask = np.zeros((48, 64), bool)
        img = viz.draw_frame(gray, uv, valid, point_ids=pids,
                             dynamic_mask=mask, boxes=[[2, 2, 20, 30]],
                             state="OK")
        assert img.shape == (48, 64, 3) and img.dtype == np.uint8
        assert tuple(img[10, 10]) == viz.COLOR_TRACKED
        assert tuple(img[20, 30]) == viz.COLOR_UNTRACKED
        assert tuple(img[40, 50]) != viz.COLOR_TRACKED    # invalid not drawn
        assert (img[0, :] == (0, 160, 0)).all()           # OK banner

    def test_draw_frame_dynamic(self):
        gray = np.zeros((20, 20), np.float32)
        mask = np.zeros((20, 20), bool)
        mask[5, 5] = True
        img = viz.draw_frame(gray, np.asarray([[5.0, 5.0]]),
                             np.asarray([True]), dynamic_mask=mask)
        assert tuple(img[5, 5]) == viz.COLOR_DYNAMIC

    def test_topdown(self, tmp_path):
        rng = np.random.RandomState(0)
        pts = rng.randn(200, 3).astype(np.float32)
        valid = np.ones(200, bool)
        traj = np.cumsum(0.1 * rng.randn(20, 3), axis=0)
        img = viz.render_map_topdown(pts, valid, kf_t=traj[:5],
                                     trajectory=traj, size=120)
        assert img.shape == (120, 120, 3)
        assert (img == (255, 0, 0)).all(-1).any()         # KF markers
        assert (img == (200, 200, 200)).all(-1).any()     # points
        viz.save_png(str(tmp_path / "m.png"), img)
        assert (tmp_path / "m.png").exists()

    def test_topdown_empty(self):
        img = viz.render_map_topdown(np.zeros((4, 3)), np.zeros(4, bool))
        assert img.shape == (800, 800, 3)


class TestVocabularyIO:
    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        desc = rng.randint(0, 256, (300, 32), np.uint8)
        voc = voc_mod.train(desc, branching=3, depth=3, seed=0)
        p = str(tmp_path / "voc.npz")
        voc_mod.save(p, voc)
        voc2 = voc_mod.load(p)
        assert voc2.depth == voc.depth and voc2.branching == voc.branching
        np.testing.assert_array_equal(voc2.node_desc, voc.node_desc)
        np.testing.assert_array_equal(voc2.children, voc.children)
        # Transforms agree.
        q = rng.randint(0, 256, (8, 32), np.uint8)
        w1, _ = voc_mod.transform_host(voc, q)
        w2, _ = voc_mod.transform_host(voc2, q)
        np.testing.assert_array_equal(w1, w2)


class TestBlurGate:
    def test_static_frames_pass(self):
        from coebslam_tpu.models.detector import BlurGate
        rng = np.random.RandomState(0)
        img = rng.rand(48, 64).astype(np.float32) * 255
        gate = BlurGate(flow_threshold=500.0, n_track_points=32)
        for i in range(4):
            emit, out = gate.push(img, stamp=float(i))
            assert emit and out is not None

    def test_fast_motion_buffers_and_emits_sharpest(self):
        from coebslam_tpu.models.detector import BlurGate
        rng = np.random.RandomState(0)
        base = rng.rand(48, 64).astype(np.float32) * 255
        gate = BlurGate(flow_threshold=0.5, buffer_size=3,
                        n_track_points=32)
        gate.push(base, stamp=0.0)
        # Shifted frames => nonzero flow; middle one sharpest (base), others
        # blurred by box filtering.
        blur = 0.25 * (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                       + np.roll(np.roll(base, 1, 0), 1, 1))
        frames = [np.roll(blur, 3, 1), np.roll(base, 6, 1),
                  np.roll(blur, 9, 1)]
        emitted = []
        for i, f in enumerate(frames):
            emit, out = gate.push(f.astype(np.float32), stamp=1.0 + i)
            if emit:
                emitted.append(out)
        assert len(emitted) == 1
        assert emitted[0][0] == 2.0     # the sharp middle frame's stamp


@pytest.mark.slow
class TestLiveViewer:
    def test_writes_and_replaces_atomically(self, tmp_path):
        """LiveViewer must produce a readable PNG at a stable path and
        update it in place (Viewer thread equivalent, SURVEY §2.1 #19)."""
        import jax
        import numpy as np
        from coebslam_tpu.config import SystemConfig
        from coebslam_tpu.slam.system import System
        from coebslam_tpu.utils import synthetic
        from coebslam_tpu.utils.viz import LiveViewer

        cfg = SystemConfig()
        planes = synthetic.make_room(seed=0)
        poses = synthetic.camera_trajectory(6, radius=0.3)
        sysm = System(cfg)
        viewer = LiveViewer(str(tmp_path), every=2)
        sysm.tracker.on_frame = viewer.hook(sysm)
        for i, p in enumerate(poses):
            out = synthetic.render(cfg.camera, p, planes, None, i)
            sysm.track_rgbd(np.asarray(out[0]), np.asarray(out[1]),
                            stamp=i / 30.0)
        png = tmp_path / "map_topdown.png"
        assert png.exists()
        from PIL import Image
        img = np.asarray(Image.open(png))
        assert img.ndim == 3 and img.shape[2] == 3
        assert (img != img[0, 0]).any()       # not a constant canvas
